package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Git-history source (SURVEY §2.1 S10): the driver shells out to
  * `git log --numstat` once (like the reference's `story/extractor.py:
  * 107-261`), parses to a Dataset[Commit], and every downstream analytic
  * (story phases, contributor stats, commit-ancestry temporal filters) is
  * a distributed aggregation or DAG traversal.
  */
object GitLog {

  final case class Commit(
      commit_hash: String,
      author: String,
      ts: Timestamp,
      files_changed: Int,
      insertions: Long,
      deletions: Long,
      parents: Seq[String] = Nil)

  def commits(spark: SparkSession, repoRoot: String): Dataset[Commit] = {
    import spark.implicits._
    import scala.sys.process._
    val out = Process(
      Seq("git", "log", "--pretty=format:@%H|%P|%an|%at", "--numstat"),
      new java.io.File(repoRoot)).!!
    parse(out).toDS()
  }

  /** Parse `git log --pretty=format:@%H|%P|%an|%at --numstat` output.
    * `%P` is the space-separated parent list (empty for root commits,
    * 2+ hashes for merges) — the edge set `ancestorClosure` traverses.
    */
  def parse(raw: String): Seq[Commit] = {
    val blocks = raw.split("(?m)^@").filter(_.trim.nonEmpty)
    blocks.toSeq.flatMap { block =>
      val lines = block.split("\n")
      lines.head.split("\\|", 4) match {
        case Array(hash, parents, author, epoch) =>
          val stats = lines.tail.filter(_.matches("""^\d+\t\d+\t.*"""))
            .map { l => val p = l.split("\t"); (p(0).toLong, p(1).toLong) }
          Some(Commit(hash, author,
            new Timestamp(epoch.trim.toLong * 1000L),
            stats.length, stats.map(_._1).sum, stats.map(_._2).sum,
            parents.trim.split("\\s+").toSeq.filter(_.nonEmpty)))
        case _ => None
      }
    }
  }

  /** Parent-edge relation (commit_hash, parent_hash) for ancestry
    * traversals — one row per (commit, parent) pair, merges included.
    */
  def parentEdges(commits: DataFrame): DataFrame =
    commits
      .select(col("commit_hash"), explode(col("parents")).as("parent_hash"))
}
