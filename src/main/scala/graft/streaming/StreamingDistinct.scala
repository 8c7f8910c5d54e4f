package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.concurrent.duration.Duration

/** Streaming distinct-count per window via the KMV bottom-k sketch —
  * "how many unique users/tokens/IPs this hour" with BOUNDED state:
  * exact windowed distinct keeps every value in state (unbounded for
  * high-cardinality streams); the KMV sketch keeps the k smallest md5
  * hashes, a commutative-monoid merge, so state is k hashes per open
  * window and the result is identical under ANY microbatch split or
  * arrival order — the same determinism contract (and the same
  * [[graft.functions.KmvAgg]] aggregator) as the batch q124 sketch, so
  * a window's sketch equals the batch aggregation of the same rows
  * bit-for-bit.
  */
object StreamingDistinct {

  /** Per tumbling window: row count, kept-hash count, the kth hash, and
    * the KMV distinct estimate (exact below k — `n_kept` < k means
    * `est_distinct` IS the exact distinct count). Append mode, emits on
    * watermark close. Output: `(window_start_ms, window_end_ms, n_rows,
    * n_kept, kth_hash, est_distinct)`.
    *
    * 100 TB shape: one stateful windowed aggregation with map-side
    * partial sketches; state per open window is ≤ k 128-bit hashes
    * regardless of stream cardinality.
    */
  def perWindow(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      window: Duration,
      lateness: Duration,
      k: Int = 64): DataFrame = {
    require(df.isStreaming,
      "batch inputs: groupBy(window).agg(KmvAgg.kmv(k)(value)) directly")
    require(k >= 8 && k <= 4096, s"k $k out of [8, 4096]")
    df.filter(col(valueCol).isNotNull)
      .withWatermark(tsCol, s"${lateness.toMillis} milliseconds")
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol),
        s"${window.toMillis} milliseconds"))
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.KmvAgg.kmv(k)(col(valueCol)).as("s"))
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        unix_millis(col("window.end")).as("window_end_ms"),
        col("n_rows"), col("s.n_kept").as("n_kept"),
        col("s.kth_hash").as("kth_hash"),
        col("s.est_distinct").as("est_distinct"))
  }
}
