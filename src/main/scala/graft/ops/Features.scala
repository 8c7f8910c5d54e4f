package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Encodings that turn raw columns into model features — the last mile
  * between a curated table and a training matrix.
  */
object Features {

  /** Smoothed target (mean) encoding of a categorical column: per
    * category, `enc = (Σ target + m · prior) / (n + m)` with the global
    * mean as prior — the m-estimate that shrinks rare categories toward
    * the prior instead of memorizing them (m ≈ "pseudo-observations of
    * the prior"). Returns the ENCODING TABLE `(category, n, sum_micro,
    * prior_micro, enc_micro)` for the caller to join/broadcast back —
    * materializing the table (not a row-wise column) is what lets
    * serving reuse it without the corpus.
    *
    * Exact integers throughout: targets are per-row micro-floored before
    * summing, the prior is one integer divide of global sums, and the
    * encoding is one integer divide per category — engine- and
    * partition-independent. NULL categories form their own encoding row
    * (labelled `__NULL__`) since an unseen-at-serving NULL still needs a
    * value; NULL targets are excluded.
    *
    * For leakage-sensitive training use the k-fold variant of the same
    * table (build per fold on the complement); this function is the
    * serving/full-fit table.
    *
    * 100 TB shape: ONE map-side-combined groupBy(category) plus a
    * one-row global aggregate broadcast in — output is
    * cardinality-sized, the corpus is read once.
    */
  def targetEncode(
      df: DataFrame,
      catCol: String,
      targetCol: String,
      m: Long): DataFrame = {
    require(m >= 0, s"smoothing m $m must be >= 0")
    val base = df.filter(col(targetCol).isNotNull)
      .select(coalesce(col(catCol).cast("string"), lit("__NULL__")).as("category"),
        floor(col(targetCol) * 1e6).cast("long").as("tm"))
    val perCat = base.groupBy("category")
      .agg(count(lit(1)).as("n"), sum("tm").as("sum_micro"))
    val prior = perCat.agg(
        expr("sum(sum_micro) div sum(n)").as("prior_micro"))
    perCat.crossJoin(broadcast(prior))
      .withColumn("enc_micro",
        expr(s"(sum_micro + ${m}L * prior_micro) div (n + ${m}L)"))
  }
}
