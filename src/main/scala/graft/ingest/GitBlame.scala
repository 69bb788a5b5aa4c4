package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Git-blame source + chunk authorship enrichment (SURVEY §2.1 S11;
  * reference `core/git_blame.py:21-260`).
  *
  * The reference shells `git blame --porcelain` once per file, maps
  * line → (author, time, commit), and each chunk takes the MOST RECENT
  * blame in its line range. Here: the porcelain parse produces a
  * distributed Dataset[BlameLine]; enrichment is an equi-join on
  * file_path (blame lines for a file co-locate with its chunks) with the
  * line-range predicate applied post-join, then a partial-aggregable
  * max-of-struct per chunk — no per-file driver loop, no range cartesian.
  */
object GitBlame {

  final case class BlameLine(
      file_path: String,
      line: Int,
      commit_hash: String,
      author: String,
      author_time: Long) // epoch seconds

  private val HeaderRe = """^([0-9a-f]{40}) (\d+) (\d+)(?: (\d+))?$""".r

  /** Parse `git blame --porcelain` output for one file. Porcelain emits
    * author metadata only at a commit's first occurrence, so commit
    * metadata is memoized and every content line resolves (the reference
    * parser drops repeat-commit lines — a documented parsing bug we do
    * not reproduce; its downstream max-recency semantics are unchanged).
    */
  def parsePorcelain(filePath: String, output: String): Seq[BlameLine] = {
    val meta = scala.collection.mutable.Map[String, (String, Long)]()
    val acc = Seq.newBuilder[BlameLine]
    var commit: String = null
    var lineNum: Int = 0
    var author: String = null
    var time: Long = -1L
    output.split("\n", -1).foreach {
      case HeaderRe(hash, _, finalLine, _) =>
        commit = hash
        lineNum = finalLine.toInt
        author = null
        time = -1L
      case l if l.startsWith("author ") =>
        author = l.substring(7).trim
      case l if l.startsWith("author-time ") =>
        time = try l.substring(12).trim.toLong catch { case _: NumberFormatException => -1L }
      case l if l.startsWith("\t") && commit != null =>
        if (author != null && time >= 0) meta(commit) = (author, time)
        meta.get(commit).foreach { case (a, t) =>
          acc += BlameLine(filePath, lineNum, commit, a, t)
        }
      case _ => ()
    }
    acc.result()
  }

  /** Shell `git blame --porcelain` for each file (driver-side, one call
    * per file like the reference's per-file cache) and parallelize the
    * parsed lines. Files that fail (untracked, binary) contribute no rows.
    */
  def blameFiles(spark: SparkSession, repoRoot: String,
      files: Seq[String]): Dataset[BlameLine] = {
    import spark.implicits._
    import scala.sys.process._
    val lines = files.flatMap { f =>
      try {
        val out = Process(Seq("git", "blame", "--porcelain", "--", f),
          new java.io.File(repoRoot)).!!
        parsePorcelain(f, out)
      } catch { case _: Exception => Seq.empty }
    }
    lines.toDS()
  }

  /** Attach last_author / last_modified / commit_hash to chunks: the most
    * recent blame line inside [start_line, end_line], ties broken by
    * (commit_hash, author) so the result is deterministic. Chunks with no
    * blame keep null columns (reference: fields stay None).
    */
  def enrichChunks(chunks: DataFrame, blame: DataFrame): DataFrame = {
    val b = blame.select(col("file_path"), col("line"),
      col("commit_hash"), col("author"), col("author_time"))
    val best = chunks
      .select(col("chunk_id"), col("file_path"),
        col("start_line"), col("end_line"))
      .join(b, Seq("file_path"))
      .filter(col("line").between(col("start_line"), col("end_line")))
      .groupBy(col("chunk_id"))
      .agg(max(struct(col("author_time"), col("commit_hash"),
        col("author"))).as("m"))
      .select(col("chunk_id"),
        col("m.author").as("last_author"),
        timestamp_seconds(col("m.author_time")).as("last_modified"),
        col("m.commit_hash").as("last_commit"))
    chunks.join(best, Seq("chunk_id"), "left")
  }
}
