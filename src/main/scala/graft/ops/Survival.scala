package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Survival analysis over right-censored durations — churn/retention
  * with the censoring done honestly: a user still active at the end of
  * the observation window is *unknown*, not retained, and dropping or
  * mis-counting those rows biases every naive retention curve (q148)
  * toward whichever cohort is newest. The Kaplan–Meier estimator is the
  * standard nonparametric fix, and its life-table form is a pure
  * aggregation — it distributes.
  */
object Survival {

  /** Sentinel cumulative ln-micro meaning "survival reached exactly 0"
    * (some time had n_risk == n_event). Genuine per-step terms are
    * bounded by |ln(int64 max)|·1e6 < 4.4e7, so with ≤ 1e6 distinct
    * times a real cumulative sum cannot cross half the sentinel.
    */
  private val LnZeroSentinel = -1000000000000000L // -1e15

  /** Kaplan–Meier life table from per-subject `(duration, event)` rows:
    * `eventCol` true = the terminal event was OBSERVED at `durationCol`
    * (churned, failed), false = right-censored there (still alive when
    * observation stopped). One output row per distinct duration `t`:
    *
    *   - `n_risk`    — subjects with duration ≥ t (at risk just before t)
    *   - `n_event`   — events at exactly t
    *   - `n_censored`— censorings at exactly t
    *   - `hazard_micro` — n_event·1e6 div n_risk (discrete hazard)
    *   - `ln_surv_micro` — Σ_{t'≤t} ⌊ln(n_risk−n_event)·1e6⌋ −
    *     ⌊ln(n_risk)·1e6⌋ over event times: the log of the KM product
    *     Π(1 − dᵢ/nᵢ) with each factor's logs floored separately —
    *     engine-replayable bit-for-bit (same IEEE `ln` + floor contract
    *     as the PSI/MI family). NULL once survival is exactly 0 (a time
    *     where every remaining subject had the event).
    *
    * Survival itself is `exp(ln_surv_micro/1e6)` — left to the consumer
    * because cross-engine `exp` rounding is not part of the hash
    * contract; the ln curve carries the same information monotonically.
    *
    * 100 TB shape: one map-side-combined groupBy(duration) collapses the
    * corpus to ≤ |distinct durations| rows, then two [[Ranks.prefixSum]]
    * range exchanges over that collapsed table (n_risk needs the
    * before-t mass, the ln curve needs the up-to-t sum) — no single-task
    * window, no join back to the corpus. Counts ride decimal(38,0)
    * through the hazard product, so a 100 TB cohort cannot wrap int64.
    * Requires ≤ 1e6 distinct durations (bucket to days/weeks first —
    * a KM table IS a plotted curve) so the S=0 sentinel stays
    * unreachable by genuine sums; loudly enforced.
    */
  def kaplanMeier(
      df: DataFrame,
      durationCol: String,
      eventCol: String): DataFrame = {
    val g = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull)
      .groupBy(col(durationCol).cast("long").as("t"))
      .agg(
        count(when(col(eventCol).cast("boolean"), 1)).as("n_event"),
        count(when(!col(eventCol).cast("boolean"), 1)).as("n_censored"))
      .withColumn("n_at_t", col("n_event") + col("n_censored"))
      // corpus collapses to ≤ |distinct t| rows here; checkpoint so the
      // bound check, total, and both prefix sums share ONE corpus scan
      .localCheckpoint()
    // distinct-duration bound: the sentinel's safety margin (and the
    // point of a life TABLE) — bucket durations upstream if this trips
    val nTimes = g.limit(1000001).count()
    require(nTimes <= 1000000L,
      s"kaplanMeier: > 1e6 distinct durations — bucket $durationCol " +
        "(days/weeks) before the life table")
    val tot = g.agg(sum("n_at_t").as("n_total")).collect()(0).getLong(0)
    val cum = Ranks.prefixSum(g, Seq(col("t")), Seq("n_at_t"))
      .withColumn("n_risk", lit(tot) - col("n_at_t_cum") + col("n_at_t"))
      .withColumn("hazard_micro",
        expr("cast(n_event as decimal(38,0)) * 1000000 div n_risk"))
      .withColumn("__ln_term",
        when(col("n_event") === 0, lit(0L))
          .when(col("n_risk") > col("n_event"),
            floor(log(col("n_risk").cast("double") -
              col("n_event").cast("double")) * 1e6).cast("long") -
              floor(log(col("n_risk").cast("double")) * 1e6).cast("long"))
          .otherwise(lit(LnZeroSentinel)))
    Ranks.prefixSum(cum, Seq(col("t")), Seq("__ln_term"))
      .withColumn("ln_surv_micro",
        when(col("__ln_term_cum") <= LnZeroSentinel / 2, lit(null))
          .otherwise(col("__ln_term_cum")))
      .select("t", "n_risk", "n_event", "n_censored", "hazard_micro",
        "ln_surv_micro")
  }
}
