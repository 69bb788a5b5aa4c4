package graft.analyze

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: how far each user progresses through a
  * strictly-ordered stage chain (stage k counts only STRICTLY after
  * the user's stage-(k-1) time). The per-stage step is one conditional
  * min over a user-keyed equi-join — stage events stream through a
  * hash-partitioned join against the (one row per user) accumulator,
  * never a window over all events and never a per-user collect.
  */
object Funnel {

  /** One row per user who reached stage 1: `ts_1..ts_N` (null once the
    * chain breaks — a null stage forces every later stage null) and
    * `stage` = number of stages reached.
    *
    * @param tsCol numeric event time (e.g. epoch micros) — comparisons
    *              and the output stay in the caller's integer domain
    */
  def ordered(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var acc = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("ts_1"))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      val k = i + 1
      val evs = events.filter(col(typeCol) === st)
        .select(col(userCol), col(tsCol).as("_evt"))
      acc = acc.join(evs, Seq(userCol), "left")
        .groupBy(col(userCol) +: (1 to i).map(j => col(s"ts_$j")): _*)
        .agg(min(when(col("_evt") > col(s"ts_$i"), col("_evt")))
          .as(s"ts_$k"))
    }
    acc.withColumn("stage",
      stages.indices.map(j => when(col(s"ts_${j + 1}").isNotNull, 1)
        .otherwise(0)).reduce(_ + _))
  }
}
