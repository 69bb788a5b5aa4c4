package graft

import graft.text.Mixing

class InterleaveSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"), (6L, "c"))
    .toDF("doc_id", "source")

  test("order cycles the domains: every cycle block is domain-diverse") {
    val rows = Mixing.interleaveRoundRobin(docs, "source", "doc_id")
      .orderBy("pos")
      .select("pos", "source", "cycle")
      .as[(Long, String, Int)].collect().toSeq
    assert(rows.map(_._1) === (1L to 6L))
    // cycle 1 first (all three domains, name order), then cycle 2 (a,b),
    // then cycle 3 (a)
    assert(rows.map(r => (r._3, r._2)) === Seq(
      (1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "a")))
  }

  test("within a domain the order is the deterministic id-hash shuffle") {
    val byPos = Mixing.interleaveRoundRobin(docs, "source", "doc_id")
      .orderBy("pos").select("doc_id", "source")
      .as[(Long, String)].collect().toSeq
    val aOrder = byPos.filter(_._2 == "a").map(_._1)
    val expected = Seq(1L, 2L, 3L)
      .sortBy(id => ((id * Mixing.Mult + Mixing.Add) % Mixing.Modulus, id))
    assert(aOrder === expected)
  }

  test("positions are a contiguous permutation under any partitioning") {
    val big = (1 to 200).map(i => (i.toLong, s"d${i % 7}"))
      .toDF("doc_id", "source").repartition(13)
    val pos = Mixing.interleaveRoundRobin(big, "source", "doc_id")
      .select("pos").as[Long].collect().sorted
    assert(pos.toSeq === (1L to 200L))
  }
}
