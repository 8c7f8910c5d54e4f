package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-interval time-series shaping for feature pipelines: event
  * streams rarely arrive on the grid a model trains on — resampling
  * turns (key, ts, value) rows into a DENSE per-key bucket series with
  * explicit empty buckets and a deterministic forward fill, the input
  * shape for lag features, decay windows, and gap-sensitive models.
  */
object TimeSeries {

  /** Resample to `everyMs` buckets per key, densely from each key's
    * first to last observed bucket: `(keys..., bucket_ms, n_events,
    * sum_micro, ffill_micro)`. Gap buckets appear with `n_events = 0`
    * and NULL `sum_micro`; `ffill_micro` carries the last OBSERVED
    * bucket sum forward (never NULL — the first bucket of every key is
    * observed by construction). Values are per-row micro-floored before
    * summing (`floor(v·1e6)` — exact integers after that, so the result
    * is partitioning- and engine-independent; no float sum order
    * dependence, no integer division anywhere).
    *
    * Timestamps must be non-negative epoch millis (the truncating
    * bucket division needs non-negative operands to equal floor).
    *
    * 100 TB shape: ONE map-side-combined aggregation keyed by
    * (keys, bucket); the dense spine explodes at most
    * `span / everyMs` rows per key — the caller's interval choice
    * bounds it — and the forward fill is a per-key window over the
    * BUCKET series (span-sized), never over raw events.
    */
  def resample(
      df: DataFrame,
      keys: Seq[String],
      tsMsCol: String,
      valueCol: String,
      everyMs: Long): DataFrame = {
    require(keys.nonEmpty, "resample needs at least one key")
    require(everyMs >= 1, s"everyMs $everyMs must be >= 1")
    val agg = df
      .filter(col(tsMsCol).isNotNull && col(valueCol).isNotNull &&
        keys.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("bucket_ms", expr(s"(`$tsMsCol` div ${everyMs}L) * ${everyMs}L"))
      .withColumn("__vm", floor(col(valueCol) * 1e6).cast("long"))
      .groupBy(keys.map(col) :+ col("bucket_ms"): _*)
      .agg(count(lit(1)).as("n_events"), sum("__vm").as("sum_micro"))
    val spine = agg
      .groupBy(keys.map(col): _*)
      .agg(min("bucket_ms").as("__lo"), max("bucket_ms").as("__hi"))
      .select(keys.map(col) :+
        explode(sequence(col("__lo"), col("__hi"), lit(everyMs))).as("bucket_ms"): _*)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("bucket_ms"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(agg, keys :+ "bucket_ms", "left")
      .select(keys.map(col) ++ Seq(
        col("bucket_ms"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("sum_micro"),
        last(col("sum_micro"), ignoreNulls = true).over(w).as("ffill_micro")): _*)
  }

  /** Trailing-window features over a [[resample]]d series: per key and
    * bucket, the rolling event count / sum / min / max of the last
    * `nBuckets` buckets (current included) plus the 1-bucket lag —
    * the standard lag-feature block a model trains on. Operates on the
    * DENSE bucket series, so "last n rows" IS "last n intervals" — gap
    * buckets participate (count 0, NULL sum skipped by min/max/sum),
    * which is what makes row frames time-correct here.
    *
    * All outputs are exact longs on the resample's micro units — no
    * float accumulation, engine- and partitioning-independent.
    *
    * 100 TB shape: one window pass partitioned by key over the
    * bucket series (span-sized per key, not event-sized); reuses the
    * resample's (keys) clustering when pipelined — Spark plans a single
    * sort covering resample's ffill window and this one.
    */
  def rolling(
      resampled: DataFrame,
      keys: Seq[String],
      nBuckets: Int): DataFrame = {
    require(keys.nonEmpty, "rolling needs at least one key")
    require(nBuckets >= 1, s"nBuckets $nBuckets must be >= 1")
    val trail = Window.partitionBy(keys.map(col): _*).orderBy(col("bucket_ms"))
      .rowsBetween(-(nBuckets - 1).toLong, Window.currentRow)
    val byBucket = Window.partitionBy(keys.map(col): _*).orderBy(col("bucket_ms"))
    resampled
      .withColumn("roll_n_events", sum(col("n_events")).over(trail))
      .withColumn("roll_sum_micro", sum(col("sum_micro")).over(trail))
      .withColumn("roll_min_micro", min(col("sum_micro")).over(trail))
      .withColumn("roll_max_micro", max(col("sum_micro")).over(trail))
      .withColumn("lag1_sum_micro", lag(col("sum_micro"), 1).over(byBucket))
  }

  /** Retention cohorts: users grouped by their FIRST active bucket
    * (cohort), then counted at each later bucket offset —
    * `(cohort_ms, day_offset, n_active, n_cohort, retention_micro)`,
    * the curve behind "day-N retention". `bucketMs` defaults to days;
    * any activity in a bucket counts once (presence, not volume).
    *
    * retention_micro is the integer-micro share of the cohort active at
    * the offset; offset 0 is the cohort itself (retention 1.0 by
    * construction — kept as the sanity row).
    *
    * 100 TB shape: one distinct on (user, bucket) — THE shuffle — then
    * the first-bucket agg reuses that clustering (map-side combine on
    * the same key prefix), a user-keyed join, and a cohort-keyed count
    * whose output is calendar-sized, not user-sized. No count-distinct
    * at the end: the (user, bucket) grain is already distinct, so the
    * final count is a plain sum.
    */
  def retention(
      df: DataFrame,
      userCol: String,
      tsMsCol: String,
      bucketMs: Long = 86400000L): DataFrame = {
    require(bucketMs >= 1, s"bucketMs $bucketMs must be >= 1")
    val days = df
      .filter(col(userCol).isNotNull && col(tsMsCol).isNotNull)
      .select(col(userCol).as("__u"),
        expr(s"(`$tsMsCol` div ${bucketMs}L) * ${bucketMs}L").as("__day"))
      .distinct()
    val first = days.groupBy("__u").agg(min(col("__day")).as("cohort_ms"))
    val sizes = first.groupBy("cohort_ms").agg(count(lit(1)).as("n_cohort"))
    days.join(first, "__u")
      .withColumn("day_offset", expr(s"(__day - cohort_ms) div ${bucketMs}L"))
      .groupBy("cohort_ms", "day_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_ms")
      .withColumn("retention_micro", expr("n_active * 1000000L div n_cohort"))
  }
}
