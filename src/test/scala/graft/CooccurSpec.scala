package graft

class CooccurSpec extends SparkSpec {
  import spark.implicits._

  test("pmi pairs match a driver-side exact computation") {
    val fixture = Seq(
      (1L, "new york city has new york style pizza"),
      (2L, "new york is a city"),
      (3L, "pizza in new york"))
    val got = graft.text.Cooccur.pmiPairs(
        fixture.toDF("doc_id", "text"), "doc_id", "text",
        window = 2, minCount = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("pmi_micro")))).toMap
    // driver mirror
    def toks(s: String) = s.split(" ").toSeq
    val pairs = fixture.flatMap { case (_, t) =>
      val ts = toks(t)
      (1 to 2).flatMap(k => ts.dropRight(k).zip(ts.drop(k)))
    }
    val cab = pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val u = fixture.flatMap(f => toks(f._2)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val ttok = u.values.sum
    val tpair = pairs.size.toLong
    val exp = cab.filter(_._2 >= 2).map { case ((a, b), c) =>
      (a, b) -> ((c, math.floor(math.log(
        (c.toDouble * ttok * ttok) / (tpair.toDouble * u(a) * u(b)))
        * 1e6).toLong))
    }
    assert(got == exp)
    // 'new york' is the collocation: present and high-support
    assert(got.contains(("new", "york")) && got(("new", "york"))._1 == 4L)
  }

  test("ppmi neighbors: words sharing contexts are each other's top match") {
    // cat/dog live in identical contexts; car in a disjoint one
    val docs = (1 to 6).flatMap(i => Seq(
      (i * 10L, "cat pet vet"), (i * 10L + 1, "dog pet vet"),
      (i * 10L + 2, "car road fuel"))).toDF("doc_id", "text")
    val got = graft.text.Cooccur.ppmiNeighbors(docs, "doc_id", "text",
        window = 2, minCount = 1, probes = Seq("cat"), k = 3)
      .select("neighbor", "cos", "rank")
      .as[(String, Double, Int)].collect().sortBy(_._3)
    assert(got.head._1 === "dog")
    assert(got.head._2 === 1.0) // identical context rows
    // the disjoint-context cluster never appears as a neighbor
    assert(!got.map(_._1).exists(Set("car", "road", "fuel")))
  }
}
