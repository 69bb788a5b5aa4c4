package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** Git-history source (SURVEY §2.1 S10): the driver shells out to
  * `git log --numstat` once (like the reference's `story/extractor.py:
  * 107-261`), parses to a Dataset[Commit], and every downstream analytic
  * (story phases, contributor stats) is a distributed aggregation.
  */
object GitLog {

  final case class Commit(
      commit_hash: String,
      author: String,
      ts: Timestamp,
      files_changed: Int,
      insertions: Long,
      deletions: Long)

  def commits(spark: SparkSession, repoRoot: String): Dataset[Commit] = {
    import spark.implicits._
    import scala.sys.process._
    val out = Process(
      Seq("git", "log", "--pretty=format:@%H|%an|%at", "--numstat"),
      new java.io.File(repoRoot)).!!
    parse(out).toDS()
  }

  /** Parse `git log --pretty=format:@%H|%an|%at --numstat` output. */
  def parse(raw: String): Seq[Commit] = {
    val blocks = raw.split("(?m)^@").filter(_.trim.nonEmpty)
    blocks.toSeq.flatMap { block =>
      val lines = block.split("\n")
      lines.head.split("\\|", 3) match {
        case Array(hash, author, epoch) =>
          val stats = lines.tail.filter(_.matches("""^\d+\t\d+\t.*"""))
            .map { l => val p = l.split("\t"); (p(0).toLong, p(1).toLong) }
          Some(Commit(hash, author,
            new Timestamp(epoch.trim.toLong * 1000L),
            stats.length, stats.map(_._1).sum, stats.map(_._2).sum))
        case _ => None
      }
    }
  }
}
