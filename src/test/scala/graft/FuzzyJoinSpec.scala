package graft

import graft.dedup.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def matchUp(left: Seq[(Long, String)], right: Seq[(Long, String)],
      maxDist: Int = 2, maxBlock: Int = 100000) =
    FuzzyJoin.blockedBestMatch(
        left.toDF("lid", "name"), right.toDF("rid", "name"),
        blockLen = 2, maxDist = maxDist, maxBlock = maxBlock)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getLong(3))))
      .toMap

  test("typo matches its source; distance and candidate count are exact") {
    val clean = Seq(1L -> "blue bolt", 2L -> "blue belt", 3L -> "red gear")
    val out = matchUp(clean, Seq(10L -> "blue bol"))
    // dist 1 to "blue bolt", dist 2 to "blue belt", "red gear" out of block
    assert(out(10L) == ((1L, 1, 2L)))
  }

  test("ties break on the smaller lid") {
    val clean = Seq(5L -> "abcd", 3L -> "abce")
    val out = matchUp(clean, Seq(10L -> "abcf"))
    assert(out(10L)._1 == 3L && out(10L)._2 == 1)
  }

  test("no match outside the distance threshold or the block") {
    val clean = Seq(1L -> "alpha item")
    val out = matchUp(clean, Seq(
      10L -> "alpha xxxx yyyy",  // same block, dist > 2
      11L -> "zz completely off")) // different block
    assert(out.isEmpty)
  }

  test("two-sided blocking: interior edits match, suffix mismatches don't") {
    val clean = Seq(1L -> "abcdef", 2L -> "abcdxx")
    val out = FuzzyJoin.blockedBestMatch(
        clean.toDF("lid", "name"), Seq(10L -> "abdef").toDF("rid", "name"),
        blockLen = 2, maxDist = 2, suffixLen = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2))))
      .toMap
    // "abdef" shares prefix "ab" + suffix "ef" with "abcdef" only;
    // "abcdxx" is blocked away despite the shared prefix
    assert(out(10L) == ((1L, 1)))
  }

  test("oversized blocks are skipped (skew guard)") {
    val clean = (1L to 5L).map(i => i -> s"aa item $i")
    val out = matchUp(clean, Seq(10L -> "aa item 1"), maxBlock = 3)
    assert(out.isEmpty)
    val kept = matchUp(clean, Seq(10L -> "aa item 1"), maxBlock = 10)
    assert(kept(10L)._1 == 1L && kept(10L)._2 == 0)
  }

  test("flagged variant separates dropped-block rows from genuine no-matches") {
    // block "aa" has 5 members (> maxBlock=3) → dropped; block "zz" has
    // 1 member but the dirty row is 4 edits away → genuine no-match;
    // block "bb" matches normally
    val clean = (1L to 5L).map(i => i -> s"aa item $i") ++
      Seq(20L -> "zz gadget", 30L -> "bb widget")
    val dirty = Seq(
      10L -> "aa item 1",   // in the dropped block
      11L -> "zz aaaaaa",   // block survives, no candidate within dist 2
      12L -> "bb widgex")   // matches 30 at dist 1
    val out = FuzzyJoin.blockedBestMatchFlagged(
        clean.toDF("lid", "name"), dirty.toDF("rid", "name"),
        blockLen = 2, maxDist = 2, maxBlock = 3)
      .collect()
      .map(r => r.getLong(0) ->
        ((Option(r.get(1)), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out.size == 3)
    assert(out(10L) == ((None, 0L, true)))   // blocked, visibly
    assert(out(11L) == ((None, 0L, false)))  // real no-match
    assert(out(12L) == ((Some(30L), 1L, false)))
  }
}
