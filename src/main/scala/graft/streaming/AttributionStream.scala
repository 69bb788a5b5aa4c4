package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — click→purchase attribution
  * as a continuous query (the streaming flavor of the af1 batch as-of
  * operator): each purchase pairs with the same user's clicks inside
  * the lookback window ending at the purchase.
  *
  * The join carries both watermarks plus the event-time range
  * constraint, which is exactly what lets Spark BOUND the join state:
  * click state older than (watermark - lookback) and purchase state
  * older than the watermark are evicted, so state is proportional to
  * the in-window traffic, never the stream history. Without the range
  * condition this join would be unrunnable at scale — state would grow
  * without bound.
  *
  * The batch af1 keeps only the LATEST qualifying click via one
  * partitioned window; in pure append-mode streaming that argmax would
  * need a second stateful stage, so the streaming operator emits all
  * in-window pairs (standard multi-touch attribution) and a downstream
  * batch distills last-touch when needed.
  */
object AttributionStream {

  final case class Click(user_id: Long, click_id: Long, click_ts: Timestamp)

  final case class Purchase(user_id: Long, purchase_id: Long,
      purchase_ts: Timestamp, amount: Double)

  /** One row per (purchase, in-window click) pair. `lookbackSec` is the
    * attribution window; `delay` is the out-of-orderness both streams
    * tolerate before late rows are dropped.
    */
  def attribute(clicks: Dataset[Click], purchases: Dataset[Purchase],
      lookbackSec: Long, delay: String = "0 seconds"): DataFrame = {
    val c = clicks.toDF().withWatermark("click_ts", delay)
    val p = purchases.toDF().withWatermark("purchase_ts", delay)
    c.join(p,
      c("user_id") === p("user_id") &&
        c("click_ts") >= p("purchase_ts") - expr(s"INTERVAL $lookbackSec SECONDS") &&
        c("click_ts") <= p("purchase_ts"))
      .select(p("purchase_id"), c("click_id"), p("user_id"),
        c("click_ts"), p("purchase_ts"), p("amount"))
  }
}
