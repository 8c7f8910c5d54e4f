package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable sketches for corpus profiling.
  *
  * The distinct-count sketch is KMV (k minimum values, Bar-Yossef et al.
  * 2002): keep the k smallest md5 hashes of the distinct values; with
  * `U_k` the k-th smallest hash mapped into (0,1], the estimator
  * `(k-1)/U_k` is unbiased with relative error ~1/sqrt(k-2). Unlike
  * HyperLogLog (`approx_count_distinct`), a KMV over md5 is EXACTLY
  * reproducible in any engine with md5 — the sketch itself, not just the
  * estimate, hash-matches cross-engine, which is what a lineage-audited
  * pipeline wants from a profiling pass.
  */
object Sketch {

  /** Per-group approximate distinct count of `value`. Returns one row per
    * group: `n_kept` (= min(k, true distinct)), the k-th hash, and
    * `est_distinct` — exact when the group has fewer than k distinct
    * values (the sketch degenerates to the exact set), the KMV estimate
    * otherwise.
    *
    * Determinism: the estimate is one divide of exact integers
    * (`(k-1) * 2^32 / (u32_k + 1)`, hash prefix parsed as a 32-bit int)
    * rounded once — bit-identical across engines.
    *
    * 100 TB shape: one distinct-aggregation shuffle on (group, hash) with
    * map-side combine, then a per-group bottom-k. md5 distributes
    * uniformly, so a pre-filter `h < prefix_threshold` can thin the
    * window input when groups are known-large; the sort cost is bounded
    * by the surviving distinct count, never the row count.
    */
  def distinctSketch(
      df: DataFrame,
      groupCol: String,
      value: Column,
      k: Int): DataFrame = {
    require(k >= 2, s"k $k must be >= 2")
    // NULLs are ignored (count-distinct semantics): md5(NULL) = NULL would
    // otherwise claim a k-slot under Spark's NULLS FIRST ordering while
    // DuckDB sorts it last — corrupting the k-th hash on both counts
    val d = df.select(col(groupCol).as("grp"), md5(value).as("h"))
      .filter(col("h").isNotNull).distinct()
    d.withColumn("rn", row_number().over(Window.partitionBy("grp").orderBy("h")))
      .filter(col("rn") <= k)
      .groupBy("grp")
      .agg(
        count(lit(1)).as("n_kept"),
        max(when(col("rn") === k, col("h"))).as("kth_hash"))
      .select(
        col("grp"),
        lit(k).as("k"),
        col("n_kept"),
        col("kth_hash"),
        when(col("kth_hash").isNull, col("n_kept"))
          .otherwise(round(
            lit((k - 1).toDouble * 4294967296.0) /
              (conv(substring(col("kth_hash"), 1, 8), 16, 10).cast("double") + 1.0)))
          .cast("long").as("est_distinct"))
  }
}
