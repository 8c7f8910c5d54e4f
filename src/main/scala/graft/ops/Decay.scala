package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-decay weighted aggregation at a snapshot instant — the
  * recency-weighted engagement/quality score every feature pipeline
  * eventually wants (a click last hour counts more than one last month),
  * computed with half-life semantics: an event `age` ms old weighs
  * 2^(−age/halfLife).
  *
  * The reference's sliding windows give hard cutoffs (in/out of the
  * window); exponential decay is the soft-cutoff complement, and at a
  * FIXED reference time it stays a plain one-shuffle aggregation — no
  * per-row window, no state.
  *
  * Determinism contract: the only transcendental, w = 2^(−age/halfLife),
  * is floored to integer MICROS per row; the value is micro-rounded per
  * row; each contribution is the all-integer `v_micro · w_micro div 1e6`;
  * the per-key sums are exact integer arithmetic. Any engine with
  * floor/pow replays the result bit-for-bit (same accepted last-ulp-of-
  * libm caveat as every ln/exp-based op here — hash-green in practice).
  *
  * 100 TB shape: map-only weight computation (age from a LITERAL
  * reference instant — pass the snapshot time in, never compute max(ts)
  * inline, so the job stays one pass and the result is a pure function
  * of its arguments), then ONE map-side-combined groupBy on the keys.
  * Events older than `maxAgeMs` are filtered before the shuffle (their
  * weight underflows to 0 micros anyway at ~20 half-lives).
  */
object Decay {

  def snapshotDecay(
      df: DataFrame,
      keyCols: Seq[String],
      tsMsCol: String,
      valueCol: String,
      halfLifeMs: Long,
      refTimeMs: Long,
      maxAgeMs: Long = Long.MaxValue): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    require(halfLifeMs > 0, s"halfLifeMs=$halfLifeMs must be > 0")
    val M = 1000000L
    val age = lit(refTimeMs) - col(tsMsCol).cast("long")
    // w = 2^(-age/halfLife) in [0,1]; floored to micros once per row
    val w6 = floor(
      pow(lit(2.0), (age.cast("double") / lit(halfLifeMs.toDouble)) * -1.0) * M)
      .cast("long")
    val v6 = round(col(valueCol).cast("double") * M).cast("long")
    // sign-split contribution (the q70 recipe): magnitude floors, the sign
    // re-applies — Spark's truncating div and a flooring SQL replay agree
    // on magnitudes, so negative values stay engine-exact too
    df.filter(age >= 0L && age <= maxAgeMs)
      .withColumn("__w6", w6)
      .withColumn("__v6", v6)
      .withColumn("__c6",
        when(col("__v6") < 0L, expr(s"0L - ((0L - __v6) * __w6 div ${M}L)"))
          .otherwise(expr(s"__v6 * __w6 div ${M}L")))
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("__w6")).as("decayed_count_micro"),
        sum(col("__c6")).as("decayed_sum_micro"))
  }
}
