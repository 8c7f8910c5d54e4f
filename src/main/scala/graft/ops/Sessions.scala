package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream (batch form): events of one
  * key belong to the same session while consecutive gaps stay within `gapMs`
  * (inclusive); a strictly larger gap opens a new session — the same
  * boundary rule as Spark's `session_window`, which merges sessions whose
  * padded windows touch (events at exactly `gap` apart share a session),
  * so [[graft.streaming.StreamingSessions]] produces identical sessions
  * on the same data (asserted by DifferentialSpec). The classic
  * behavioral-feature primitive (session length / depth / recency feed
  * downstream feature views).
  */
object Sessions {

  /** Per-session aggregate: (key, session_idx, n_events, start/end/duration
    * in ms). `session_idx` numbers a key's sessions from 1 in time order.
    * Ordering ties on the timestamp break by `tieCol` (a unique event id),
    * so the assignment is deterministic for equal-timestamp events.
    *
    * 100 TB shape: ONE shuffle on the key — the lag, the running
    * session-index sum, and the final per-session aggregation all share
    * the same (key, time) sort order, so Catalyst plans a single Exchange
    * + Sort reused by both Window operators and a partial-free final agg.
    * Skew equals per-key event skew (a bot key with millions of events
    * sorts in one partition — pre-split such keys by day first).
    */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      tsMsCol: String,
      tieCol: String,
      gapMs: Long): DataFrame = {
    require(gapMs > 0, s"gapMs $gapMs must be positive")
    val byTime = Window.partitionBy(col(keyCol))
      .orderBy(col(tsMsCol), col(tieCol))
    val newSession = when(
      col(tsMsCol) - lag(col(tsMsCol), 1).over(byTime) > gapMs, 1L)
      .otherwise(when(lag(col(tsMsCol), 1).over(byTime).isNull, 1L).otherwise(0L))
    df.select(col(keyCol), col(tsMsCol), col(tieCol))
      .withColumn("session_idx",
        sum(newSession).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsMsCol)).as("start_ms"),
        max(col(tsMsCol)).as("end_ms"))
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))
  }
}
