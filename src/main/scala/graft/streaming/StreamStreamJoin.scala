package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream interval join — the remaining Structured Streaming join
  * shape next to [[WeatherStream]]'s dedup and [[EventSessionizer]]'s
  * custom state: purchases attributed to the signup that preceded them
  * within an attribution horizon.
  *
  * Scale shape: both sides carry a watermark and the join condition bounds
  * event time in BOTH directions (s_ts ≤ p_ts ≤ s_ts + horizon), which is
  * exactly what lets Spark expire buffered state on both sides — an
  * unbounded-horizon stream-stream join would buffer one side forever.
  * State is hash-partitioned by the equi-key (user), so the join scales out
  * like any keyed shuffle.
  */
object StreamStreamJoin {

  /** Inner interval join of `purchases(p_user, p_event, p_ts)` against
    * `signups(s_user, s_event, s_ts)`: each purchase matches every signup
    * of the same user in [p_ts - horizon, p_ts]. Works on both streaming
    * (append mode; late rows beyond `lateness` dropped) and batch frames
    * (watermarks are a no-op in batch — the SAME function is its own batch
    * twin, which the spec exploits). */
  def attribute(purchases: DataFrame, signups: DataFrame,
                horizon: String = "30 days",
                lateness: String = "1 hour"): DataFrame = {
    val p = if (purchases.isStreaming) purchases.withWatermark("p_ts", lateness)
            else purchases
    val s = if (signups.isStreaming) signups.withWatermark("s_ts", lateness)
            else signups
    p.join(s, expr(
      s"p_user = s_user AND p_ts >= s_ts AND p_ts <= s_ts + INTERVAL $horizon"))
  }
}
