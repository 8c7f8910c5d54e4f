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

  /** Nelson–Aalen cumulative hazard — the additive companion to
    * [[kaplanMeier]]'s product-limit survival: `H(t) = Σ_{s≤t} d_s/n_s`,
    * the estimator whose INCREMENTS are directly comparable across
    * cohorts and whose slope IS the hazard rate (flat = stable churn,
    * steepening = accelerating). Same life table, same censoring
    * handling, one more prefix sum.
    *
    * Exactness: cum_hazard is the prefix sum of the life table's
    * per-time `⌊10⁶·d/n⌋` terms — per-term floors (the mutualInfo
    * precedent), pure integer arithmetic, so the curve replays
    * bit-for-bit; underestimates true H by < |distinct t| micro.
    *
    * Output per distinct duration: `(t, n_risk, n_event, n_censored,
    * hazard_micro, cum_hazard_micro)`.
    *
    * 100 TB shape: [[kaplanMeier]]'s collapse + one more
    * [[Ranks.prefixSum]] range exchange over the ≤ 10⁶-row life table.
    */
  def nelsonAalen(
      df: DataFrame,
      durationCol: String,
      eventCol: String): DataFrame =
    Ranks.prefixSum(kaplanMeier(df, durationCol, eventCol),
        Seq(col("t")), Seq("hazard_micro"))
      .withColumnRenamed("hazard_micro_cum", "cum_hazard_micro")
      .select("t", "n_risk", "n_event", "n_censored", "hazard_micro",
        "cum_hazard_micro")

  /** Two-sample log-rank test — "did cohort A churn differently from
    * cohort B?", the survival-curve A/B test that respects censoring
    * (comparing raw churn rates between arms with different observation
    * windows is exactly the bias KM exists to remove). Per group:
    *
    *   - `n_subjects`, `n_events` — cohort size and observed events O_g
    *   - `expected_micro` — Σ_t d(t)·n_risk_g(t)·1e6 div N(t), the
    *     events the group would have seen under H₀ (shared hazard)
    *   - `var_micro` — Σ_t of the hypergeometric variance
    *     d(N−d)/(N−1) · (N_A/N) · (N_B/N), staged-floored in micro
    *   - `chi2_milli` — (O_A − E_A)² / V in milli, computed from the
    *     lexicographically-first group and repeated on both rows
    *     (χ² with 1 df; ≥ 3841 rejects H₀ at 5%)
    *
    * Exactness: every per-time factor is a decimal(38,0) product with
    * ONE floor division, summed exactly; the final χ² squares the EXACT
    * (O_A·1e6 − E_A_micro) — arbitrary-precision on the driver, HUGEINT
    * in a SQL replay (fits to ~10¹³-subject cohorts) — so only positive
    * quantities are ever floor-divided and every engine agrees
    * bit-for-bit, the same staged-floor contract as the KS/PSI family.
    *
    * 100 TB shape: one map-side-combined groupBy(duration) collapses
    * both cohorts in a single pass, one [[Ranks.prefixSum]] range
    * exchange over the collapsed life table, one scalar aggregate —
    * driver traffic is the two group labels plus P partials.
    */
  def logRank(
      df: DataFrame,
      durationCol: String,
      eventCol: String,
      groupCol: String): DataFrame = {
    val base = df
      .filter(col(durationCol).isNotNull && col(eventCol).isNotNull &&
        col(groupCol).isNotNull)
      .select(col(durationCol).cast("long").as("t"),
        col(eventCol).cast("boolean").as("ev"),
        col(groupCol).cast("string").as("g"))
    // ONE corpus scan: collapse to (t, g) cells first; group discovery
    // and the two-arm pivot both ride the collapsed table
    val cellsByG = base
      .groupBy("t", "g")
      .agg(count(when(col("ev"), 1)).as("d"), count(lit(1)).as("at"))
      .localCheckpoint()
    val groups = cellsByG.select("g").distinct().limit(3)
      .collect().map(_.getString(0)).sorted
    require(groups.length == 2,
      s"logRank: exactly 2 groups required, got ${groups.mkString(", ")}")
    val (ga, gb) = (groups(0), groups(1))
    val cells = cellsByG
      .groupBy("t")
      .agg(
        sum(when(col("g") === ga, col("d")).otherwise(0L)).as("d_a"),
        sum(when(col("g") === gb, col("d")).otherwise(0L)).as("d_b"),
        sum(when(col("g") === ga, col("at")).otherwise(0L)).as("at_a"),
        sum(when(col("g") === gb, col("at")).otherwise(0L)).as("at_b"))
      .localCheckpoint()
    val nTimes = cells.limit(1000001).count()
    require(nTimes <= 1000000L,
      s"logRank: > 1e6 distinct durations — bucket $durationCol first")
    val tot = cells.agg(sum("at_a").as("ta"), sum("at_b").as("tb"))
      .collect()(0)
    val (totA, totB) = (tot.getLong(0), tot.getLong(1))
    val perT = Ranks.prefixSum(cells, Seq(col("t")), Seq("at_a", "at_b"))
      .withColumn("na", lit(totA) - col("at_a_cum") + col("at_a"))
      .withColumn("nb", lit(totB) - col("at_b_cum") + col("at_b"))
      .withColumn("nn", col("na") + col("nb"))
      .withColumn("d", col("d_a") + col("d_b"))
      .withColumn("e_a_micro",
        expr("cast(d as decimal(38,0)) * na * 1000000 div nn"))
      .withColumn("e_b_micro",
        expr("cast(d as decimal(38,0)) * nb * 1000000 div nn"))
      .withColumn("v_micro", expr(
        """case when nn > 1 then
             ((cast(d as decimal(38,0)) * (nn - d) * 1000000 div (nn - 1))
               * (cast(na as decimal(38,0)) * 1000000 div nn) div 1000000)
               * (cast(nb as decimal(38,0)) * 1000000 div nn) div 1000000
           else 0 end"""))
    // micro totals reported in bigint — the house-wide *_micro ceiling
    // (~9.2e12 whole units); the per-time products already rode decimal
    val s = perT.agg(
      sum("d_a").as("o_a"), sum("d_b").as("o_b"),
      sum("e_a_micro").cast("long").as("ea"),
      sum("e_b_micro").cast("long").as("eb"),
      sum("v_micro").cast("long").as("v")).collect()(0)
    val (oa, ob) = (s.getLong(0), s.getLong(1))
    val (ea, eb, v) = (s.getLong(2), s.getLong(3), s.getLong(4))
    // χ²_milli = (O_A·1e6 − E_A_micro)² div (1000·V_micro): the square
    // is exact (A² only — never a floored negative, so engine BigInt and
    // SQL HUGEINT floor-division agree), then ONE positive division
    val chi2Milli: Option[Long] =
      if (v <= 0L) None
      else {
        val a = BigInt(oa) * 1000000 - BigInt(ea)
        Some(((a * a) / (BigInt(1000) * BigInt(v))).toLong)
      }
    val spark = df.sparkSession
    import spark.implicits._
    Seq((ga, totA, oa, ea, v, chi2Milli),
        (gb, totB, ob, eb, v, chi2Milli))
      .toDF("grp", "n_subjects", "n_events", "expected_micro",
        "var_micro", "chi2_milli")
  }
}
