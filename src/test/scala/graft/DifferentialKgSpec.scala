package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.chunk.Chunker
import graft.core.FileRecord
import graft.graph.Kg

/** Differential (incremental) KG rebuild — mirrors the reference's
  * `tests/unit/core/test_differential_kg.py` (issue #108): hash-based
  * change detection (`_get_changed_files`), entity deletion by file set
  * (`delete_entities_for_files`), and the end-to-end add/modify/delete
  * update, including the streaming `applyBatch` wiring.
  */
class DifferentialKgSpec extends SparkSpec {
  import spark.implicits._

  private def rec(path: String, content: String) =
    FileRecord(path, "python", Chunker.sha256Hex(content),
      new Timestamp(0L), content.length.toLong, content)

  private def chunksOf(files: (String, String)*) =
    files.flatMap { case (p, c) => Chunker.chunkFile(rec(p, c)) }.toDF()

  private val srcA =
    """def func_a():
      |    return helper()
      |
      |def helper():
      |    return 1
      |""".stripMargin
  private val srcB =
    """def func_b():
      |    return func_a()
      |""".stripMargin

  private def hashesDf(rows: (String, String)*) =
    rows.toDF("file_path", "content_hash")

  // ---- _get_changed_files semantics --------------------------------------

  test("changedFileSets: no prior metadata → every current file is new") {
    val out = Kg.changedFileSets(
      hashesDf("src/a.py" -> "aaaa", "src/b.py" -> "bbbb"),
      hashesDf().limit(0))
      .as[(String, String)].collect().toSet
    assert(out == Set("src/a.py" -> "new", "src/b.py" -> "new"))
  }

  test("changedFileSets: identical hashes → empty") {
    val h = hashesDf("src/a.py" -> "aaaa", "src/b.py" -> "bbbb")
    assert(Kg.changedFileSets(h, h).count() == 0)
  }

  test("changedFileSets: changed / new / deleted classified per file") {
    val stored = hashesDf(
      "src/a.py" -> "aaaa", "src/b.py" -> "bbbb", "src/c.py" -> "cccc")
    val current = hashesDf(
      "src/a.py" -> "aaaa", "src/b.py" -> "xxxx", "src/d.py" -> "dddd")
    val out = Kg.changedFileSets(current, stored)
      .as[(String, String)].collect().toSet
    assert(out == Set(
      "src/b.py" -> "changed", "src/c.py" -> "deleted", "src/d.py" -> "new"))
  }

  // ---- delete_entities_for_files -----------------------------------------

  test("deleteEntitiesForFiles removes the file's nodes and touching edges") {
    val kg = Kg.fromChunks(chunksOf("src/a.py" -> srcA, "src/b.py" -> srcB))
    assert(kg.edges.filter(col("rel_type") === "CALLS" &&
      col("src") === "src/b.py::func_b").count() == 1)

    val after = Kg.deleteEntitiesForFiles(kg, Seq("src/a.py").toDF("file_path"))
    assert(after.vertices.filter(col("file_path") === "src/a.py").count() == 0)
    // the CALLS edge from surviving func_b pointed at a removed entity → gone
    assert(after.edges.filter(col("rel_type") === "CALLS").count() == 0)
    assert(after.vertices.filter(col("id") === "src/b.py::func_b").count() == 1)
  }

  test("deleteEntitiesForFiles: empty and non-matching file sets are no-ops") {
    val kg = Kg.fromChunks(chunksOf("src/a.py" -> srcA, "src/b.py" -> srcB))
    val (v0, e0) = (kg.vertices.count(), kg.edges.count())
    val afterEmpty = Kg.deleteEntitiesForFiles(kg, Seq.empty[String].toDF("file_path"))
    assert(afterEmpty.vertices.count() == v0 && afterEmpty.edges.count() == e0)
    val afterMiss = Kg.deleteEntitiesForFiles(kg,
      Seq("nonexistent/file.py").toDF("file_path"))
    assert(afterMiss.vertices.count() == v0 && afterMiss.edges.count() == e0)
  }

  // ---- differentialUpdate -------------------------------------------------

  test("modify: changed file re-chunks and its calls resolve to survivors") {
    val kg = Kg.fromChunks(chunksOf("src/a.py" -> srcA, "src/b.py" -> srcB))
    val srcA2 =
      """def func_a():
        |    return func_b()
        |""".stripMargin
    val updated = Kg.differentialUpdate(kg,
      chunksOf("src/a.py" -> srcA2), Seq.empty[String].toDF("file_path"))

    // helper disappeared with the old version of a.py
    assert(updated.vertices.filter(col("id") === "src/a.py::helper").count() == 0)
    assert(updated.vertices.filter(col("id") === "src/a.py::func_a").count() == 1)
    // the re-chunked file's call resolves against the SURVIVING entity set
    assert(updated.edges.filter(col("rel_type") === "CALLS" &&
      col("src") === "src/a.py::func_a" &&
      col("dst") === "src/b.py::func_b").count() == 1)
    // reference-faithful drift: the unchanged file's edge into the changed
    // file was detach-deleted and is NOT re-created (only changed files
    // are re-processed); a periodic full rebuild reconciles
    assert(updated.edges.filter(col("src") === "src/b.py::func_b" &&
      col("rel_type") === "CALLS").count() == 0)
  }

  test("add + delete: new file's edges appear, deleted file's subgraph goes") {
    val kg = Kg.fromChunks(chunksOf("src/a.py" -> srcA, "src/b.py" -> srcB))
    val srcC =
      """def func_c():
        |    return func_a()
        |""".stripMargin
    val updated = Kg.differentialUpdate(kg,
      chunksOf("src/c.py" -> srcC), Seq("src/b.py").toDF("file_path"))

    assert(updated.vertices.filter(col("file_path") === "src/b.py").count() == 0)
    assert(updated.edges.filter(col("src").startsWith("src/b.py")).count() == 0)
    assert(updated.edges.filter(col("rel_type") === "CALLS" &&
      col("src") === "src/c.py::func_c" &&
      col("dst") === "src/a.py::func_a").count() == 1)
  }

  test("drift-free delta matches a full rebuild") {
    val kg = Kg.fromChunks(chunksOf("src/a.py" -> srcA, "src/b.py" -> srcB))
    // c.py only calls into the surviving corpus; nothing calls into c.py
    val srcC =
      """import os
        |
        |def func_c():
        |    return helper()
        |""".stripMargin
    val diff = Kg.differentialUpdate(kg,
      chunksOf("src/c.py" -> srcC), Seq.empty[String].toDF("file_path"))
    val full = Kg.fromChunks(
      chunksOf("src/a.py" -> srcA, "src/b.py" -> srcB, "src/c.py" -> srcC))
    assert(diff.vertices.select("id").as[String].collect().toSet ==
      full.vertices.select("id").as[String].collect().toSet)
    assert(diff.edges.select("src", "dst", "rel_type").as[(String, String, String)]
      .collect().toSet ==
      full.edges.select("src", "dst", "rel_type").as[(String, String, String)]
        .collect().toSet)
  }

  // ---- streaming wiring ---------------------------------------------------

  test("applyBatch refreshes the KG tables differentially") {
    val dir = java.nio.file.Files.createTempDirectory("diffkg").toFile
    val root = new java.io.File(dir, "src"); root.mkdirs()
    def write(name: String, content: String): String = {
      val f = new java.io.File(root, name)
      java.nio.file.Files.writeString(f.toPath, content)
      f.getAbsolutePath
    }
    val pathA = write("a.py", srcA)
    val pathB = write("b.py", srcB)

    val chunksPath = new java.io.File(dir, "chunks").getAbsolutePath
    val vectorsPath = new java.io.File(dir, "vectors").getAbsolutePath
    val kgPath = new java.io.File(dir, "kg").getAbsolutePath

    // seed the stores with an initial full build
    val seed = chunksOf(pathA -> srcA, pathB -> srcB)
    seed.write.mode("overwrite").parquet(chunksPath)
    graft.embed.HashEmbedder.embed(
      seed.withColumn("ctx", col("content")), "chunk_id", "ctx")
      .withColumnRenamed("id", "chunk_id")
      .join(seed.select("chunk_id", "file_path", "content", "language",
        "start_line", "end_line", "chunk_type", "name", "hierarchy_path"),
        Seq("chunk_id"))
      .write.mode("overwrite").parquet(vectorsPath)
    val kg0 = Kg.fromChunks(seed)
    kg0.vertices.write.mode("overwrite").parquet(s"$kgPath/vertices")
    kg0.edges.write.mode("overwrite").parquet(s"$kgPath/edges")

    // modify a.py on disk, delete b.py, then apply the two events
    val srcA2 =
      """def func_a():
        |    return 42
        |""".stripMargin
    java.nio.file.Files.writeString(new java.io.File(root, "a.py").toPath, srcA2)
    new java.io.File(root, "b.py").delete()
    val now = new Timestamp(System.currentTimeMillis())
    val batch = Seq(
      graft.streaming.WatchStream.FileEvent(pathA, "modified", now),
      graft.streaming.WatchStream.FileEvent(pathB, "deleted", now)).toDF()
    graft.streaming.WatchStream.applyBatch(
      spark, batch, chunksPath, vectorsPath, Some(kgPath))

    val v = spark.read.parquet(s"$kgPath/vertices")
    val e = spark.read.parquet(s"$kgPath/edges")
    assert(v.filter(col("file_path") === pathB).count() == 0)
    assert(v.filter(col("id") === s"$pathA::helper").count() == 0)
    assert(v.filter(col("id") === s"$pathA::func_a").count() == 1)
    assert(e.filter(col("rel_type") === "CALLS").count() == 0)
  }
}
