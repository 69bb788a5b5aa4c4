package graft

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("integer pagerank matches a driver-side exact computation") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val got = graft.graph.PageRank
      .integerPageRank(es.toDF("src", "dst").repartition(7), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val outdeg = es.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    var pr = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val s = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      es.foreach { case (u, v) => s(v) += pr(u) / outdeg(u) }
      pr = nodes.map(n => n -> (150000L + 85L * s(n) / 100L)).toMap
    }
    assert(got == pr)
    // the node every path funnels into outranks the source-only node
    assert(got(1L) > got(4L))
  }

  test("duplicate edges collapse before the walk") {
    val dup = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val uniq = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val a = graft.graph.PageRank.integerPageRank(dup, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = graft.graph.PageRank.integerPageRank(uniq, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("personalized: teleport lands only on seeds, ranks mean proximity") {
    // two disjoint chains; seeding chain A leaves chain B at rank 0
    val es = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L))
    val got = graft.graph.PageRank
      .personalizedPageRank(es.toDF("src", "dst"), Seq(1L), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 150000L)          // seed: teleport only (no in-edges)
    assert(got(2L) > 0L && got(3L) > 0L) // downstream of the seed
    assert(Seq(10L, 11L, 12L).forall(got(_) == 0L)) // unreachable chain
  }

  test("personalized matches a driver-side exact computation") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val seeds = Set(1L, 4L)
    val got = graft.graph.PageRank
      .personalizedPageRank(es.toDF("src", "dst").repartition(5),
        seeds.toSeq.sorted, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val outdeg = es.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    var pr = nodes.map(n => n -> (if (seeds(n)) 1000000L else 0L)).toMap
    for (_ <- 1 to 3) {
      val s = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      es.foreach { case (u, v) => s(v) += pr(u) / outdeg(u) }
      pr = nodes.map(n =>
        n -> ((if (seeds(n)) 150000L else 0L) + 85L * s(n) / 100L)).toMap
    }
    assert(got == pr)
  }
}
