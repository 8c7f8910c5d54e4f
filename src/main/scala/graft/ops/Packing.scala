package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window audits for LLM pre-training corpora: before a corpus is
  * tokenized into fixed-length training sequences, two questions decide
  * the data recipe — how much is LOST if documents are truncated at the
  * context length, and how documents land in chunks if the corpus is
  * concatenated and split GPT-style. Both answered exactly from a token
  * (or char) count column, corpus-scale, no tokenizer in the loop.
  * (No reference analogue — the reference stops at feature transforms;
  * these follow the repetition-signal/mixing-manifest pattern of the
  * training-data operator family. [[Corpus.packingEfficiency]] is the
  * per-group SUMMARY forecast — sequence counts and utilization under
  * pad-vs-concat; the operators here answer the per-limit LOSS sweep and
  * the per-document WHERE-does-it-land audit.)
  */
object Packing {

  /** Truncation loss per candidate context length: for each `limit`, how
    * many documents exceed it and how many cost units (tokens/chars)
    * survive `least(n, limit)` truncation. Returns one row per limit:
    * `(context_len, n_docs, n_truncated, trunc_frac_micro, tokens_total,
    * tokens_kept, tokens_lost, kept_frac_micro)` — fractions are
    * integer-micro-floored; the `·10⁶` products route through
    * decimal(38,0) (a 10¹³-token corpus × 10⁶ is past 2⁶³).
    *
    * 100 TB shape: ONE map-side-combined aggregation over the corpus with
    * `2·|limits|` conditional aggregates — no explode, no per-limit
    * rescan; the limits unpivot afterwards from a single row.
    */
  def truncationStats(
      df: DataFrame,
      costCol: String,
      limits: Seq[Long]): DataFrame = {
    require(limits.nonEmpty, "at least one context length")
    require(limits.forall(_ >= 1), s"context lengths must be >= 1: $limits")
    require(limits.distinct.size == limits.size, s"duplicate limits: $limits")
    val base = df
      .filter(col(costCol).isNotNull)
      .select(nonNegative(col(costCol), costCol).as("__n"))
    val aggs =
      Seq(count(lit(1)).as("n_docs"), sum(col("__n")).as("tokens_total")) ++
        limits.zipWithIndex.flatMap { case (l, i) =>
          Seq(
            sum(when(col("__n") > l, 1L).otherwise(0L)).as(s"__tr_$i"),
            sum(least(col("__n"), lit(l))).as(s"__kept_$i"))
        }
    val one = base.agg(aggs.head, aggs.tail: _*)
    val stackExpr = limits.zipWithIndex
      .map { case (l, i) => s"${l}L, __tr_$i, __kept_$i" }
      .mkString(", ")
    one
      .selectExpr("n_docs", "tokens_total",
        s"stack(${limits.size}, $stackExpr) " +
          "as (context_len, n_truncated, tokens_kept)")
      .withColumn("trunc_frac_micro", expr(
        "cast(n_truncated as decimal(38,0)) * 1000000 div greatest(n_docs, 1)"))
      .withColumn("tokens_lost", col("tokens_total") - col("tokens_kept"))
      .withColumn("kept_frac_micro", expr(
        """cast(tokens_kept as decimal(38,0)) * 1000000
           div greatest(tokens_total, 1)"""))
      .select("context_len", "n_docs", "n_truncated", "trunc_frac_micro",
        "tokens_total", "tokens_kept", "tokens_lost", "kept_frac_micro")
  }

  /** Concat-and-chunk packing audit: documents are concatenated in a
    * DETERMINISTIC md5-salted order (the q190 shuffle recipe — a
    * different salt is a different epoch shuffle) and split into
    * `contextLen`-sized chunks; per document, its exact span —
    * `(id, n_cost, start_offset, chunk_first, chunk_last, n_splits)` —
    * where `n_splits` counts chunk boundaries falling INSIDE the
    * document (0 = served whole). Rolling up `n_splits > 0` gives the
    * fraction of documents a packed loader cuts mid-text, the number
    * behind "use document-aware packing" decisions; zero-cost documents
    * occupy no span and never split.
    *
    * 100 TB shape: one range exchange for the global order and two
    * narrow passes ([[Ranks.prefixSum]] — no single-task window even at
    * 10¹¹ documents); offsets are exact int64 (a 100 TB corpus is
    * ~2.5·10¹³ tokens, 5 orders inside 2⁶³).
    */
  def packingAudit(
      df: DataFrame,
      idCol: String,
      costCol: String,
      contextLen: Long,
      salt: String = ""): DataFrame = {
    require(contextLen >= 1, s"contextLen $contextLen must be >= 1")
    val base = df
      .filter(col(idCol).isNotNull && col(costCol).isNotNull)
      .select(
        col(idCol).as("id"),
        nonNegative(col(costCol), costCol).as("n_cost"),
        md5(concat_ws("|", lit(salt), col(idCol).cast("string"))).as("__ord"))
    Ranks.prefixSum(base, Seq(col("__ord"), col("id")), Seq("n_cost"))
      .withColumn("start_offset", col("n_cost_cum") - col("n_cost"))
      .withColumn("chunk_first", expr(s"start_offset div ${contextLen}L"))
      .withColumn("chunk_last",
        expr(s"greatest(n_cost_cum - 1, start_offset) div ${contextLen}L"))
      .withColumn("n_splits", col("chunk_last") - col("chunk_first"))
      .select("id", "n_cost", "start_offset", "chunk_first", "chunk_last",
        "n_splits")
  }

  /** Long cast that REJECTS negative costs at execution time (a negative
    * token count is always an upstream bug; truncation/packing math would
    * silently produce nonsense offsets from it).
    */
  private def nonNegative(c: Column, name: String): Column =
    when(c < 0, raise_error(format_string(
      s"negative $name in packing audit: %s", c.cast("string"))).cast("long"))
      .otherwise(c.cast("long"))

  /** Dataset-mixture plan: given per-source target WEIGHTS and a total
    * token budget, how much of each source the sampler should take —
    * the arithmetic behind every "X% web, Y% code, Z% books" training
    * mix, made exact and auditable instead of a notebook one-off. Per
    * source: available token mass, its budget allocation
    * `⌊budget·w/Σw⌋`, the sampling rate against what exists
    * (`> 10⁶` ⇒ the source must REPEAT — `epochs_milli` says how many
    * passes), and the short-fall-aware effective take
    * `min(allocated, available)` a no-repeat policy would get.
    *
    * Exact integers throughout: token counts sum in int64, every rate
    * is one integer division (all operands non-negative). Unlisted
    * sources get NO row (they are not part of the mix — emitting
    * zeros would hide a typo'd source name; join your inventory against
    * this table to audit). Weights must be positive.
    *
    * Output per listed source: `(source, n_docs, tokens_available,
    * weight_micro, tokens_target, sample_rate_micro, epochs_milli,
    * tokens_taken_norepeat)`.
    *
    * 100 TB shape: ONE map-side-combined groupBy(source) over the
    * corpus; the weight table is a literal handful of rows, broadcast;
    * everything after is per-source scalar arithmetic.
    */
  def mixturePlan(
      df: DataFrame,
      sourceCol: String,
      tokensCol: String,
      weights: Seq[(String, Long)],
      tokenBudget: Long): DataFrame = {
    require(weights.nonEmpty, "at least one (source, weight)")
    require(weights.forall(_._2 > 0), s"weights must be positive: $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate sources in $weights")
    require(tokenBudget > 0, s"tokenBudget $tokenBudget must be > 0")
    val wSum = weights.map(_._2).sum
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toDF("source", "w")
    val avail = df
      .filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(nonNegative(col(tokensCol), "token count")).as("tokens_available"))
    avail.join(broadcast(wdf), "source")
      // budget·w and target·10⁶ overflow int64 at 10¹³-token budgets —
      // both products route through decimal(38,0) (div returns long,
      // and each QUOTIENT is bounded: target ≤ budget, rate/epochs by
      // the mix's own sanity — a source repeated 10¹⁶ times is a typo)
      .withColumn("weight_micro", expr(s"w * 1000000 div ${wSum}L"))
      .withColumn("tokens_target",
        expr(s"cast(${tokenBudget}L as decimal(38,0)) * w div ${wSum}L"))
      .withColumn("sample_rate_micro", expr(
        """cast(tokens_target as decimal(38,0)) * 1000000
           div greatest(tokens_available, 1)"""))
      .withColumn("epochs_milli", expr(
        """cast(tokens_target as decimal(38,0)) * 1000
           div greatest(tokens_available, 1)"""))
      .withColumn("tokens_taken_norepeat",
        least(col("tokens_target"), col("tokens_available")))
      .select("source", "n_docs", "tokens_available", "weight_micro",
        "tokens_target", "sample_rate_micro", "epochs_milli",
        "tokens_taken_norepeat")
  }
}
