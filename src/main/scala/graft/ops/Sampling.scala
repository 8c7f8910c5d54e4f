package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * All selection decides on md5 of a stable key — never `rand()` — so a
  * sample is reproducible across engines, partitionings, and reruns, and
  * any row's membership can be audited after the fact. Selection is a pure
  * column predicate: map-only, no shuffle, fully pushdown-friendly.
  */
object Sampling {

  /** Uniform bucket in [0, 256) from the first two hex digits of
    * md5(salt|key). Two lowercase hex digits compare lexicographically in
    * numeric order, so thresholding works on the raw string in any engine
    * with md5 — no hex-to-int conversion needed.
    */
  private def bucketHex(key: Column, salt: String): Column =
    substring(md5(concat_ws("|", lit(salt), key)), 1, 2)

  private def thresholdHex(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction not in [0,1]")
    f"${math.round(fraction * 256).toInt.min(256)}%02x"
  }

  /** Keep ~`fraction` of rows, decided by md5(salt|key) — deterministic
    * and stratification-free. Granularity is 1/256.
    */
  def sample(df: DataFrame, keyCol: String, fraction: Double, salt: String = ""): DataFrame =
    df.filter(bucketHex(col(keyCol), salt) < lit(thresholdHex(fraction)))

  /** Stratified deterministic sample: each stratum keeps ~its configured
    * fraction of rows (`default` for unlisted strata). One codegen'd
    * predicate over the scan — at 100 TB this is a filter pushed to the
    * reader, not a job.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      fractions: Map[String, Double],
      default: Double,
      salt: String = ""): DataFrame = {
    val threshold = fractions.foldLeft(lit(thresholdHex(default))) {
      case (acc, (stratum, frac)) =>
        when(col(strataCol) === stratum, lit(thresholdHex(frac))).otherwise(acc)
    }
    df.filter(bucketHex(concat_ws("#", col(strataCol), col(keyCol)), salt) < threshold)
  }

  /** Balanced sample: keep at most `quota` rows PER GROUP (language/source
    * balancing for a training mix), chosen deterministically — rows rank by
    * md5(salt|group#key) with the key as tiebreak, and ranks above the
    * quota drop. Unlike a fraction-based sample this gives exact per-group
    * counts (min(n_g, quota)).
    *
    * 100 TB shape: one shuffle keyed by the group for the rank window; skew
    * equals group skew, and a group's rows sort by a 32-char hash — if one
    * group dominates the corpus, pre-filter with [[stratifiedSample]] to
    * cut its bulk map-side first, then apply the exact quota here.
    */
  def groupQuotaSample(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      quota: Int,
      salt: String = ""): DataFrame = {
    require(quota > 0, s"quota $quota must be positive")
    import org.apache.spark.sql.expressions.Window
    val r = md5(concat_ws("|", lit(salt), concat_ws("#", col(groupCol), col(keyCol))))
    df.withColumn("__rk",
        row_number().over(Window.partitionBy(col(groupCol)).orderBy(r, col(keyCol))))
      .filter(col("__rk") <= quota)
      .drop("__rk")
  }

  /** Training-mix manifest (Pile/DoReMi-style static mixing): per source,
    * the corpus inventory (docs, units, corpus share), the target unit
    * allotment `round(budget * weight)`, and the `epochs` factor
    * (target / available) a sampler must apply — >1 means the source
    * repeats across the mix, <1 means it downsamples. `unitCol` is any
    * per-row size measure (token count, chars, bytes).
    *
    * Determinism: every ratio is a single divide of exact integers, and
    * `target_units` a single multiply+round — bit-identical across
    * engines, so ROUND(..,4) cannot straddle a boundary.
    *
    * 100 TB shape: one partial-aggregated groupBy on the source column
    * (cardinality = #sources, tiny); the global-total window runs over the
    * aggregated frame only, so its single-partition exchange moves
    * #sources rows regardless of corpus size.
    */
  def mixingManifest(
      df: DataFrame,
      sourceCol: String,
      unitCol: String,
      weights: Map[String, Double],
      defaultWeight: Double,
      unitBudget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.groupBy(col(sourceCol).as("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(unitCol)).cast("long").as("n_units"))
      .withColumn("corpus_share",
        round(col("n_units").cast("double") /
          sum("n_units").over(Window.partitionBy()), 4))
      .withColumn("weight", weights.foldLeft(lit(defaultWeight)) {
        case (acc, (s, w)) => when(col("source") === s, lit(w)).otherwise(acc)
      })
      .withColumn("target_units",
        round(lit(unitBudget.toDouble) * col("weight")).cast("long"))
      .withColumn("epochs",
        round(col("target_units").cast("double") / col("n_units"), 4))
      .withColumn("mode",
        when(col("epochs") > 1.0, lit("upsample")).otherwise(lit("downsample")))
  }
}
