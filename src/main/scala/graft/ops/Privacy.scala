package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy QA for tables that leave the pipeline — re-identification
  * risk is a release gate, not an afterthought, and the checks are plain
  * aggregations a 100 TB table can afford.
  */
object Privacy {

  /** k-anonymity / l-diversity report per quasi-identifier equivalence
    * class: `(quasiCols..., n, n_distinct_sensitive, k_violation,
    * l_violation)` — a class violates k-anonymity when fewer than `k`
    * rows share its quasi-identifier combination (those rows are
    * re-identifiable by joining any external dataset carrying the same
    * attributes), and violates l-diversity when its sensitive values
    * collapse below `l` distinct (everyone in the class shares the
    * secret even if the class is large). NULL quasi values form their
    * own class (NULL is still an identifying signature).
    *
    * Publish-gate usage: require the violating-class row count to be 0
    * (or suppress/generalize those classes) before export.
    *
    * 100 TB shape: one groupBy on the quasi columns with an exact
    * count-distinct of the sensitive column (one expand shuffle) —
    * output is equivalence-class-sized. For a quick k-only scan pass
    * `sensitiveCol = None` and skip the distinct entirely.
    */
  def kAnonymity(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Long,
      sensitiveCol: Option[String] = None,
      l: Long = 1L): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 2, s"k $k must be >= 2")
    require(l >= 1, s"l $l must be >= 1")
    val base = df.groupBy(quasiCols.map(col): _*)
    val agged = sensitiveCol match {
      case Some(s) => base.agg(count(lit(1)).as("n"),
        countDistinct(col(s)).as("n_distinct_sensitive"))
      case None => base.agg(count(lit(1)).as("n"))
        .withColumn("n_distinct_sensitive", lit(null).cast("long"))
    }
    agged
      .withColumn("k_violation", col("n") < k)
      .withColumn("l_violation",
        sensitiveCol.map(_ => col("n_distinct_sensitive") < l)
          .getOrElse(lit(null).cast("boolean")))
  }

  /** Entropy and recursive (c,l)-diversity per quasi-identifier class —
    * the two STRONG forms of l-diversity (Machanavajjhala et al. 2007)
    * that distinct-count l-diversity ([[kAnonymity]]'s `l_violation`)
    * cannot express: a class can hold l distinct sensitive values yet
    * be 99% one value (probabilistic disclosure). With per-class
    * sensitive counts r₁ ≥ r₂ ≥ … ≥ r_m over n rows:
    *
    *  - '''entropy''': `H = ln n − (Σ rᵢ·ln rᵢ)/n ≥ ln l`. Exact
    *    contract: each `⌊10⁶·ln rᵢ⌋` floors once per count (runtime-ln,
    *    q220), the weighted sum is exact integer, and the comparison is
    *    cross-multiplied — `n·⌊10⁶·ln n⌋ − Σ rᵢ·⌊10⁶·ln rᵢ⌋ ≥
    *    n·⌊10⁶·ln l⌋` — so no division ever happens.
    *  - '''recursive (c,l)''': `r₁ < c·(r_l + … + r_m)` — the most
    *    common value must not dominate what's left after discarding the
    *    l−1 most common. Pure integer counting.
    *
    * Output per class: `(quasiCols…, n, n_distinct_sensitive,
    * entropy_micro = (n·⌊10⁶·ln n⌋ − Σrᵢ⌊10⁶·ln rᵢ⌋) div n,
    * entropy_l_ok, r1, tail_from_l, recursive_cl_ok)`. NULL sensitive
    * values count as a value of their own (they are still a secret
    * shared by the class).
    *
    * 100 TB shape: one map-side-combined groupBy(quasi, sensitive),
    * then a per-class window rank + rollup on the SAME class key (the
    * value table per class is sensitive-domain-sized); output is
    * class-sized. Overflow: Σ rᵢ·⌊10⁶·ln rᵢ⌋ ≤ n·10⁶·ln n — int64-safe
    * to ~2·10¹¹ rows per class, decimal(38,0) far beyond.
    */
  def lDiversity(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      l: Int,
      c: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(l >= 2, s"l $l must be >= 2")
    require(c >= 1, s"c $c must be >= 1")
    val dec = "decimal(38,0)"
    val cells = df
      .groupBy(quasiCols.map(col) :+
        col(sensitiveCol).cast("string").as("__s"): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(quasiCols.map(col): _*)
      .orderBy(col("__c").desc, col("__s").asc)
    val lnL6 = math.floor(1e6 * math.log(l.toDouble)).toLong
    cells
      .withColumn("__rk", row_number().over(w))
      .groupBy(quasiCols.map(col): _*)
      .agg(sum("__c").as("n"),
        count(lit(1)).as("n_distinct_sensitive"),
        max(when(col("__rk") === 1, col("__c"))).as("r1"),
        sum(when(col("__rk") < l, col("__c")).otherwise(0L)).as("__topl"),
        sum((col("__c").cast(dec) *
          floor(lit(1e6) * log(col("__c").cast("double"))).cast(dec)))
          .as("__ent"))
      .withColumn("tail_from_l", col("n") - col("__topl"))
      .withColumn("entropy_micro", expr(
        s"CAST((CAST(n AS $dec) * CAST(FLOOR(1e6 * ln(CAST(n AS DOUBLE))) AS $dec)" +
          s" - __ent) div n AS BIGINT)"))
      .withColumn("entropy_l_ok", expr(
        s"CAST(n AS $dec) * CAST(FLOOR(1e6 * ln(CAST(n AS DOUBLE))) AS $dec)" +
          s" - __ent >= CAST(n AS $dec) * $lnL6"))
      .withColumn("recursive_cl_ok",
        col("r1").cast(dec) < lit(c).cast(dec) * col("tail_from_l").cast(dec))
      .drop("__topl", "__ent")
  }

  /** t-closeness per quasi-identifier class — the distributional member
    * of the k/l/t release-gate triple: a class can be large (k-anon) and
    * diverse (l-div) yet still leak if its sensitive-value DISTRIBUTION
    * differs sharply from the table's (99% of one diagnosis in a class
    * whose base rate is 1% identifies by membership alone). For a
    * categorical sensitive column the distance is total variation:
    * tvd = ½·Σ_s |p_class(s) − p_global(s)|, in floored micro.
    *
    * Zero cells cost nothing: values ABSENT from a class contribute
    * exactly their global share, so Σ_s |p−q| = Σ_{s∈class}(|p−q| − q)
    * + Σ_all q — the second term is one broadcast scalar, and the plan
    * never materializes class × value pairs.
    *
    * Output per class: `(quasiCols..., n, tvd_micro, t_violation)` with
    * `t_violation = tvd_micro > tMicro`.
    *
    * 100 TB shape: one map-side-combined groupBy(quasi, s), a broadcast
    * join against the |S|-row global distribution, one rollup on the
    * SAME quasi key (no second wide shuffle); shares ride decimal(38,0).
    */
  def tCloseness(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitiveCol: String,
      tMicro: Long): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(tMicro >= 0 && tMicro <= 1000000L,
      s"tMicro $tMicro out of [0, 1e6]")
    val base = df.filter(col(sensitiveCol).isNotNull)
    val cell = base.groupBy(quasiCols.map(col) :+ col(sensitiveCol): _*)
      .agg(count(lit(1)).as("n_cs"))
    val glob = base.groupBy(col(sensitiveCol))
      .agg(count(lit(1)).as("n_s"))
      .crossJoin(broadcast(base.agg(count(lit(1)).as("n_tot"))))
      .withColumn("q_micro",
        expr("cast(n_s as decimal(38,0)) * 1000000 div n_tot"))
      .select(col(sensitiveCol), col("q_micro"))
    val qTot = glob.agg(sum("q_micro").cast("long")).collect()(0).getLong(0)
    // class totals via a partition window over the COLLAPSED cells (each
    // class holds ≤ |S| cell rows), so the quasi-key shuffle happens once
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(quasiCols.map(col): _*)
    cell
      .join(broadcast(glob), Seq(sensitiveCol))
      .withColumn("__n", sum(col("n_cs")).over(w))
      .withColumn("__term",
        abs(expr("cast(cast(n_cs as decimal(38,0)) * 1000000 div __n as long)")
          - col("q_micro")) - col("q_micro"))
      .groupBy(quasiCols.map(col): _*)
      .agg(max("__n").as("n"), sum("__term").as("__sum_terms"))
      .withColumn("tvd_micro", expr(s"(__sum_terms + ${qTot}L) div 2"))
      .withColumn("t_violation", col("tvd_micro") > tMicro)
      .drop("__sum_terms")
  }

  /** Re-identification risk profile — the class-SIZE histogram of the
    * quasi-identifier partition ([[kAnonymity]] lists the violating
    * classes; this is the one-screen summary a release review reads):
    * how many equivalence classes have exactly 1, 2, 3… members, what
    * fraction of ROWS sit in each, and the cumulative share of rows at
    * or below each size — `cum_rows` at size 1 is the uniqueness rate
    * (rows re-identifiable by exact quasi match), at k−1 the mass a
    * k-anonymity gate would have to suppress or generalize.
    *
    * Exactness: pure counting; shares are exact integer floor divisions
    * to micro; the cumulative column is an exact prefix sum over the
    * ≤ |sizes| histogram rows.
    *
    * Output per class size: `(class_size, n_classes, n_rows,
    * row_share_micro, cum_rows, cum_row_share_micro)`.
    *
    * 100 TB shape: one groupBy(quasi) collapse, one groupBy(size)
    * of the class table, a [[Ranks.prefixSum]] range exchange over the
    * ≤ |distinct sizes| histogram.
    */
  def uniquenessRisk(df: DataFrame, quasiCols: Seq[String]): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    val hist = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .groupBy("class_size")
      .agg(count(lit(1)).as("n_classes"))
      .withColumn("n_rows", col("class_size") * col("n_classes"))
      .localCheckpoint()
    val tot = hist.agg(sum("n_rows").as("__n"))
    Ranks.prefixSum(hist, Seq(col("class_size")), Seq("n_rows"))
      .crossJoin(broadcast(tot))
      .select(col("class_size"), col("n_classes"), col("n_rows"),
        expr("cast(cast(n_rows as decimal(38,0)) * 1000000 div __n as long)")
          .as("row_share_micro"),
        col("n_rows_cum").as("cum_rows"),
        expr("""cast(cast(n_rows_cum as decimal(38,0)) * 1000000 div __n
             as long)""").as("cum_row_share_micro"))
  }
}
