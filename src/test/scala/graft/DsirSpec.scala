package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.text.Dsir

/** Dsir: exact agreement with an independent driver-side mirror of the
  * hashed-feature log-ratio computation, plus the directional sanity a
  * pipeline relies on (target-exclusive text scores above
  * source-exclusive text).
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  private def toksOf(text: String): Seq[String] =
    text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim.split(" ").toSeq

  private def featsOf(text: String): Seq[Long] = {
    val t = toksOf(text)
    val bi = if (t.size >= 2) t.sliding(2).map(_.mkString(" ")).toSeq
      else Seq.empty
    (t ++ bi).map(f => PortableHash.hash60Local("dsir", f) % B)
  }

  private val docs = Seq(
    (1L, "alpha beta alpha", true),
    (2L, "alpha gamma delta beta", true),
    (3L, "omega sigma omega sigma tau", false),
    (4L, "sigma tau omega", false),
    (5L, "alpha omega", false))

  test("per-doc sums match the driver-side mirror exactly") {
    val feats = docs.map { case (id, text, tgt) => (id, featsOf(text), tgt) }
    val cs = feats.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = feats.filter(_._3).flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ts = cs.values.sum; val tt = ct.values.sum
    def qlr(b: Long): Long =
      math.floor((math.log((ct.getOrElse(b, 0L) + 1).toDouble / (tt + B)) -
        math.log((cs(b) + 1).toDouble / (ts + B))) * 1e6).toLong
    val expected = feats.map { case (id, fs, tgt) =>
      (id, if (tgt) 1 else 0, fs.size, fs.map(qlr).sum)
    }.sortBy(_._1)

    val out = Dsir.importanceWeights(
        docs.toDF("doc_id", "text", "tgt"), "doc_id", "text", col("tgt"), B)
      .withColumn("is_target", col("is_target").cast("int"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(out.toSeq === expected)
  }

  test("target-exclusive text outranks source-exclusive text") {
    val out = Dsir.importanceWeights(
        docs.toDF("doc_id", "text", "tgt"), "doc_id", "text", col("tgt"), B)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    // doc 1 is pure target vocabulary, doc 3 pure source-side
    assert(out(1L) > out(3L))
    // the mixed doc sits between the extremes
    assert(out(5L) > out(3L) && out(5L) < out(1L))
  }
}
