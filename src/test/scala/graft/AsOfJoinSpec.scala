package graft

import org.apache.spark.sql.functions._

import graft.util.AsOfJoin

/** As-of join semantics, checked against an algorithmically independent
  * range-join + argmax reference on a tie-heavy fixture.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join matches the naive range-join reference, incl. ties") {
    val purchases = Seq(
      (100L, 1L, 50L), // after two clicks
      (101L, 1L, 20L), // ties a click's exact ts -> <= includes it
      (102L, 2L, 10L), // user's click comes later -> unmatched
      (103L, 3L, 30L), // user has no clicks at all -> unmatched
      (104L, 1L, 20L)  // duplicate (user, ts) purchase, distinct id
    ).toDF("event_id", "user_id", "ts")
    val clicks = Seq(
      (200L, 1L, 5L),
      (201L, 1L, 20L),
      (202L, 1L, 20L), // same-ts click pair: larger id must win
      (203L, 2L, 40L)
    ).toDF("event_id", "user_id", "ts")

    val got = AsOfJoin.asOf(purchases, "event_id", clicks, "event_id",
        "user_id", "ts", Seq("event_id", "ts"))
      .select($"event_id", $"asof_event_id", $"asof_ts")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).sortBy(_._1)

    // independent reference: explode all qualifying pairs, take the
    // lexicographic argmax of (click ts, click id) per purchase
    val c = clicks.select($"event_id".as("c_id"), $"user_id", $"ts".as("c_ts"))
    val naive = purchases.join(c,
        Seq("user_id"), "left")
      .withColumn("c_id", when($"c_ts" <= $"ts", $"c_id"))
      .withColumn("c_ts", when($"c_ts" <= $"ts", $"c_ts"))
      .groupBy($"event_id")
      .agg(max(struct($"c_ts", $"c_id")).as("m"))
      .select($"event_id", $"m.c_id", $"m.c_ts")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).sortBy(_._1)

    assert(got.toSeq == naive.toSeq)
    // spot assertions: tie inclusion and same-ts tiebreak by larger id
    val byId = got.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byId(101L) == ((Some(202L), Some(20L))))
    assert(byId(100L) == ((Some(202L), Some(20L))))
    assert(byId(102L) == ((None, None)))
    assert(byId(103L) == ((None, None)))
  }
}
