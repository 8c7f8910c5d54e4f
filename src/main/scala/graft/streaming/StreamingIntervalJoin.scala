package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.concurrent.duration.Duration

/** Streaming interval (range) join — the unbounded counterpart of
  * [[graft.engine.TemporalJoin.intervalJoin]]: every (left, right) pair
  * sharing `keys` with `right.ts - left.ts` in `[lowerMs, upperMs]`,
  * on two unbounded streams.
  *
  * This is deliberately a THIN wrapper over Spark's native stream-stream
  * inner join: with watermarks on both sides and a time-range join
  * condition, Structured Streaming already maintains exactly the bounded
  * per-key state this join needs and evicts rows the condition can no
  * longer match (left rows age out `upperMs` past the right watermark and
  * vice versa) — re-implementing that state machine in
  * `flatMapGroupsWithState` would be strictly worse. Custom state code is
  * for semantics Spark lacks (as-of ordering, LSH buckets, sliding
  * merges); a conjunction of equi-keys and a time range is the case it
  * covers natively.
  *
  * Right-side columns (except keys) come back suffixed `rightSuffix`,
  * matching the batch operator's contract, so a backfill can swap between
  * the two without renaming (StreamingSpec asserts stream = batch on the
  * same data).
  *
  * `tsCol` must be a TIMESTAMP column on both sides (the event-time
  * watermark column). State per key is bounded by rows inside
  * `lateness + (upperMs - lowerMs)` of the watermark.
  */
object StreamingIntervalJoin {

  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      lowerMs: Long,
      upperMs: Long,
      lateness: Duration,
      rightSuffix: String = "_r"): DataFrame = {
    require(left.isStreaming && right.isStreaming,
      "use TemporalJoin.intervalJoin for batch inputs")
    require(upperMs >= lowerMs, s"upperMs $upperMs < lowerMs $lowerMs")
    require(keys.nonEmpty, "interval join needs at least one key")
    val rRenamed = right.columns.foldLeft(right) { (d, c) =>
      if (keys.contains(c)) d else d.withColumnRenamed(c, c + rightSuffix)
    }
    val rT = s"$tsCol$rightSuffix"
    val lw = left.withWatermark(tsCol, s"${lateness.toMillis} milliseconds")
    val rw = rRenamed.withWatermark(rT, s"${lateness.toMillis} milliseconds")
    val keyCond = keys.map(k => lw(k) <=> rw(k)).reduce(_ && _)
    // NULL keys must never match (batch equi-join parity): <=> would let
    // them, so add explicit not-null guards.
    val notNull = keys.map(k => lw(k).isNotNull).reduce(_ && _)
    val range =
      col(rT) >= col(tsCol) + expr(s"INTERVAL $lowerMs MILLISECONDS") &&
        col(rT) <= col(tsCol) + expr(s"INTERVAL $upperMs MILLISECONDS")
    val joined = lw.join(rw, keyCond && notNull && range, "inner")
    // drop the duplicated key columns from the right side
    keys.foldLeft(joined)((d, k) => d.drop(rw(k)))
  }
}
