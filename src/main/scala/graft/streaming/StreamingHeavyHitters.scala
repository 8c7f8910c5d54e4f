package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.concurrent.duration.Duration

/** Streaming heavy hitters — per tumbling window, the values whose
  * exact count reaches a threshold: trending tokens, hot keys, abusive
  * senders. The live counterpart of the batch hot-key report (q112) and
  * the exact side of the CMS frequency family (q127): counts here are
  * EXACT (one stateful windowed aggregation), so emitted rows carry no
  * approximation caveat and a window's output equals the batch
  * groupBy-count-filter of the same rows bit-for-bit.
  */
object StreamingHeavyHitters {

  /** Exact per-window value counts ≥ `minCount`, append mode — rows
    * emit when the watermark closes a window. Output:
    * `(window_start_ms, window_end_ms, value, cnt)`.
    *
    * The threshold is ABSOLUTE by design: a share-of-window threshold
    * would need the window total — a second stateful aggregation whose
    * only effect is delaying emission; compute shares downstream from
    * the closed windows if needed.
    *
    * 100 TB shape: one shuffle on (window, value) with map-side
    * combine; state is one long per DISTINCT value per open window —
    * bounded for key-like columns (users, tokens, IPs). For unbounded-
    * cardinality values at extreme scale, pre-filter with the batch CMS
    * sketch's candidates or bucket the value; exactness is this
    * operator's contract, so it does not silently approximate.
    */
  def perWindow(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      window: Duration,
      lateness: Duration,
      minCount: Long): DataFrame = {
    require(df.isStreaming,
      "batch inputs: groupBy(window, value).count.filter directly")
    require(minCount >= 1L, s"minCount $minCount must be >= 1")
    df.filter(col(valueCol).isNotNull)
      .withWatermark(tsCol, s"${lateness.toMillis} milliseconds")
      .groupBy(
        org.apache.spark.sql.functions.window(col(tsCol),
          s"${window.toMillis} milliseconds"),
        col(valueCol).as("value"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        unix_millis(col("window.end")).as("window_end_ms"),
        col("value"), col("cnt"))
  }
}
