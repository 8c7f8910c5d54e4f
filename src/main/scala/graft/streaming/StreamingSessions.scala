package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.concurrent.duration.Duration

/** Streaming gap-based sessionization on an unbounded source — the
  * streaming counterpart of [[graft.ops.Sessions.sessionize]], built on
  * Spark's native `session_window` (dynamic-gap merging session state,
  * AQE-mergeable, watermark-evicted) rather than hand-rolled
  * flatMapGroupsWithState: the built-in is codegen-planned, merges
  * partial sessions across micro-batches, and drops state as the
  * watermark passes, which is exactly the semantics wanted here.
  *
  * A session closes — and its one row emits (append mode) — once the
  * watermark passes the session's window end (`last event + gap`).
  * Output matches the batch operator row-for-row on (key, start_ms,
  * end_ms, n_events, duration_ms): `session_window` merges sessions
  * whose padded windows touch, so events exactly `gap` apart share a
  * session (DifferentialSpec asserts the parity), and start/end report
  * the first/last EVENT times (not the padded window end). `session_idx` is
  * deliberately absent: numbering a key's sessions requires total order
  * over its whole history, which an incremental computation cannot know.
  *
  * 100 TB shape: one shuffle on the key; per-key state is the set of
  * OPEN sessions only (closed ones evict with the watermark), so state
  * is bounded by key activity within the gap horizon, independent of
  * stream length.
  */
object StreamingSessions {

  def sessionize(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      gap: Duration,
      lateness: Duration): DataFrame = {
    require(df.isStreaming, "use ops.Sessions.sessionize for batch inputs")
    df.withWatermark(tsCol, s"${lateness.toMillis} milliseconds")
      .groupBy(
        col(keyCol),
        session_window(col(tsCol), s"${gap.toMillis} milliseconds"))
      .agg(
        count(lit(1)).as("n_events"),
        unix_millis(min(col(tsCol))).as("start_ms"),
        unix_millis(max(col(tsCol))).as("end_ms"))
      .select(
        col(keyCol),
        col("start_ms"),
        col("end_ms"),
        col("n_events"),
        (col("end_ms") - col("start_ms")).as("duration_ms"))
  }
}
