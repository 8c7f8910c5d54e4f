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
}
