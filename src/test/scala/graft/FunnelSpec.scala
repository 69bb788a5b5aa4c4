package graft

import graft.analyze.Funnel

/** Ordered-funnel semantics: strict ordering between stages, chain
  * breaks propagate, users without the first stage are absent.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("funnel stages require strictly increasing times") {
    val events = Seq(
      // user 1: full ordered chain
      (1L, 10L, "signup"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: click BEFORE signup, none after -> stage 1
      (2L, 10L, "click"), (2L, 20L, "signup"), (2L, 5L, "purchase"),
      // user 3: click ties signup exactly -> strict > excludes it
      (3L, 10L, "signup"), (3L, 10L, "click"),
      // user 4: purchase before the first valid click -> stage 2
      (4L, 10L, "signup"), (4L, 30L, "click"), (4L, 20L, "purchase"),
      // user 5: never signed up -> absent
      (5L, 10L, "click"), (5L, 20L, "purchase"),
      // user 1 noise: earlier click than the kept one, pre-signup
      (1L, 5L, "click")
    ).toDF("user_id", "tus", "event_type")
    val got = Funnel.ordered(events, "user_id", "tus", "event_type",
        Seq("signup", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("user_id") ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
          r.getAs[Int]("stage")))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) == ((Some(10L), Some(20L), Some(30L), 3)))
    assert(got(2L) == ((Some(20L), None, None, 1)))
    assert(got(3L) == ((Some(10L), None, None, 1)))
    assert(got(4L) == ((Some(10L), Some(30L), None, 2)))
  }

  test("weekly cohorts count distinct retained users per offset") {
    import graft.analyze.Retention
    val W = Retention.WeekUs
    val events = Seq(
      // cohort week 0: users 1, 2 sign up; 1 active weeks 0+1, 2 week 0
      (1L, 0L * W + 5, "signup"), (1L, 1L * W + 9, "click"),
      (2L, 0L * W + 7, "signup"),
      // cohort week 1: user 3; active weeks 1 and 3; plus a pre-signup
      // event in week 0 that must NOT count (negative offset)
      (3L, 0L * W + 1, "click"),
      (3L, 1L * W + 2, "signup"), (3L, 3L * W + 4, "purchase"),
      // user 4 never signs up -> no cohort
      (4L, 2L * W + 3, "view")
    ).toDF("user_id", "tus", "event_type")
    val got = Retention.weeklyCohorts(events, "user_id", "tus",
        "event_type", "signup")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      (0L, 0L) -> 2L, // users 1, 2 active in their signup week
      (0L, 1L) -> 1L, // only user 1 returns
      (1L, 0L) -> 1L, // user 3
      (1L, 2L) -> 1L  // user 3 again two weeks later
    ))
  }
}
