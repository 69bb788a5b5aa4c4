package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ingest.GhStory

/** gh-CLI story source fidelity (`story/extractor.py:452-610`,
  * `story/__init__.py:120-204`): JSON parsing with missing/null fields,
  * label flattening, ISO-Z timestamps, and the merged timeline's
  * per-source ordering + importance formulas.
  */
class GhStorySpec extends SparkSpec {
  import spark.implicits._

  private val issuesJson =
    """[
      |  {"number": 7, "title": "Crash on empty index", "state": "closed",
      |   "labels": [{"name": "bug"}, {"name": "p0"}],
      |   "createdAt": "2024-03-01T10:00:00Z",
      |   "closedAt": "2024-03-11T10:00:00Z", "body": "stack trace"},
      |  {"number": 9, "title": "Add dark mode", "state": "open",
      |   "labels": [], "createdAt": "2024-03-05T09:00:00Z",
      |   "closedAt": null, "body": ""},
      |  {"number": 12, "title": "Flaky watcher test"}
      |]""".stripMargin

  private val prsJson =
    """[
      |  {"number": 20, "title": "Fix crash", "state": "merged",
      |   "mergedAt": "2024-03-10T12:00:00Z", "additions": 120,
      |   "deletions": 30, "labels": [{"name": "bug"}]},
      |  {"number": 21, "title": "WIP refactor", "state": "open",
      |   "mergedAt": null, "additions": 5, "deletions": 1, "labels": []}
      |]""".stripMargin

  test("parseIssues: fields, labels, ISO-Z timestamps, and defaults") {
    val out = GhStory.parseIssues(Seq(issuesJson).toDF("payload"), "payload")
      .orderBy("number")
    val rows = out.collect()
    assert(rows.length == 3)
    assert(out.filter(col("number") === 7 &&
      array_contains(col("labels"), "p0")).count() == 1)
    // ten days open
    assert(out.filter(col("number") === 7)
      .select(datediff(col("closed_at"), col("created_at")))
      .as[Int].head() == 10)
    // missing fields take the model defaults: open, no labels, empty body
    val bare = out.filter(col("number") === 12)
      .select("state", "body").as[(String, String)].head()
    assert(bare == ("open", ""))
    assert(out.filter(col("number") === 12)
      .select(size(col("labels"))).as[Int].head() == 0)
  }

  test("parsePullRequests: merged_at null-safety and counts") {
    val out = GhStory.parsePullRequests(Seq(prsJson).toDF("payload"), "payload")
    assert(out.count() == 2)
    assert(out.filter(col("merged_at").isNotNull).count() == 1)
    assert(out.filter(col("number") === 20)
      .select("additions", "deletions").as[(Long, Long)].head() == ((120L, 30L)))
  }

  test("issueStats rolls per-state counts and close latency") {
    val stats = GhStory.issueStats(
      GhStory.parseIssues(Seq(issuesJson).toDF("payload"), "payload"))
      .orderBy("state")
      .as[(String, Long, Long, Option[Double], Int, Int)].collect()
    assert(stats.toSeq == Seq(
      ("closed", 1L, 1L, Some(10.0), 7, 7),
      ("open", 2L, 0L, None, 9, 12)))
  }

  test("timeline merges sources with the reference importance formulas") {
    val commits = Seq(
      ("c1", "alice", Timestamp.valueOf("2024-03-02 00:00:00"), 30, 10L, 2L),
      ("c2", "bob", Timestamp.valueOf("2024-03-03 00:00:00"), 6, 1L, 1L))
      .toDF("commit_hash", "author", "ts", "files_changed",
        "insertions", "deletions")
    val issues = GhStory.parseIssues(Seq(issuesJson).toDF("payload"), "payload")
    val prs = GhStory.parsePullRequests(Seq(prsJson).toDF("payload"), "payload")
    val tl = GhStory.timeline(commits, issues, prs).collect()

    // dates ascend
    val dates = tl.map(_.getTimestamp(0).getTime)
    assert(dates.sameElements(dates.sorted))
    // commit importance capped at 1.0 (30 files / 20 > 1), small one 0.3
    val imps = GhStory.timeline(commits, issues, prs)
      .filter(col("event_type") === "commit")
      .select("importance").as[Double].collect().toSet
    assert(imps == Set(1.0, 0.3))
    // issue 7 contributes both an opened (0.6) and a closed (0.5) event
    assert(tl.count(r => r.getString(2).startsWith("Issue #7")) == 2)
    // unmerged PR absent; merged PR present with the +/- description
    assert(tl.count(r => r.getString(1) == "pr") == 1)
    assert(tl.exists(r => r.getString(3) == "0 files, +120/-30"))
  }
}
