package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.concurrent.duration.Duration

/** Streaming PSI drift monitor — the production counterpart of
  * [[graft.ops.Corpus.psi]]: each tumbling window's value distribution
  * is scored against a STATIC reference histogram (yesterday's snapshot,
  * the training distribution), emitting one row per closed window. The
  * batch PSI says "these two snapshots differ"; this says "the live
  * stream started differing forty minutes ago".
  */
object StreamingDrift {

  /** Per-window PSI of `valueCol` against a reference described by
    * `refLo`/`refHi` (the reference snapshot's observed range) and
    * `refCounts` (bucket → count), cut by the SAME equi-width rule as
    * the batch operator: `bins` buckets over [lo, hi], out-of-range
    * clamps to edge buckets, `lo == hi` degenerates to bucket 0. Same
    * exact-integer discipline too — +1 Laplace per bucket, micro-floored
    * integer proportions, separately-floored ln decomposition,
    * `psi_pico > 0.2e12 ⇒ drifted` — so a window's score equals the
    * batch [[graft.ops.Corpus.psi]] of (reference, window rows)
    * bit-for-bit (StreamingSpec asserts the parity).
    *
    * The whole score is ONE stateful windowed aggregation: each bucket
    * is a plan-time conditional counter (hence `bins ≤ 200` — a
    * monitoring histogram, not a density estimate), and the PSI is an
    * unrolled exact-integer projection over those counters — unseen
    * buckets participate through their Laplace +1 like the batch
    * operator, the reference rides the plan as literals, and there is
    * no join and no second stateful operator (append-mode-safe by
    * construction).
    *
    * Output (append mode, watermark-closed windows):
    * `(window_start_ms, window_end_ms, n, psi_pico, drifted)`; empty
    * windows emit nothing.
    *
    * 100 TB shape: one shuffle on the window key; state per open window
    * is `bins` longs.
    */
  def psiVsReference(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      refLo: Double,
      refHi: Double,
      refCounts: Map[Int, Long],
      bins: Int,
      window: Duration,
      lateness: Duration): DataFrame = {
    require(df.isStreaming, "use ops.Corpus.psi for batch inputs")
    require(bins >= 2 && bins <= 200,
      s"bins $bins out of [2,200] (one counter column per bin)")
    require(refCounts.keys.forall(b => b >= 0 && b < bins),
      "refCounts bucket out of range")
    val v = col(valueCol).cast("double")
    val bucket =
      if (refLo == refHi) lit(0)
      else least(greatest(
        floor((v - refLo) * bins / (refHi - refLo)).cast("int"),
        lit(0)), lit(bins - 1))

    // reference-side constants (plan-time)
    val lnM = (x: Double) => math.floor(math.log(x) * 1e6).toLong
    val ca1 = (0 until bins).map(b => refCounts.getOrElse(b, 0L) + 1L)
    // BigInt: a reference histogram summed over a 100 TB day can push
    // c * 1e6 past int64 — same silent-wrap class as the batch-side
    // decimal(38,0) routing in Corpus.driftReport.
    val ta = ca1.map(BigInt(_)).sum
    val lnTa = lnM(ta.toDouble)
    val pa = ca1.map(c => (BigInt(c) * 1000000 / ta).toLong)
    val lnCa1 = ca1.map(c => lnM(c.toDouble))

    val counters = (0 until bins).map(b =>
      count(when(col("__bucket") === b, 1)).as(s"c_$b"))
    val agged = df
      .filter(v.isNotNull)
      .withColumn("__bucket", bucket)
      .withWatermark(tsCol, s"${lateness.toMillis} milliseconds")
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol),
        s"${window.toMillis} milliseconds"))
      .agg(counters.head, counters.tail: _*)
    val n = (0 until bins).map(b => col(s"c_$b")).reduce(_ + _)
    val withTotals = agged
      .withColumn("n", n)
      .withColumn("tb", col("n") + bins)
    val lnTb = floor(log(col("tb").cast("double")) * 1e6).cast("long")
    val psi: Column = (0 until bins).map { b =>
      val cb1 = col(s"c_$b") + 1L
      val pb = expr(s"cast(c_$b + 1L as decimal(38,0)) * 1000000 div tb")
      val lnCb1 = floor(log(cb1.cast("double")) * 1e6).cast("long")
      (lit(pa(b)) - pb) * (lit(lnCa1(b)) - lit(lnTa) - lnCb1 + lnTb)
    }.reduce(_ + _)
    withTotals
      .withColumn("psi_pico", psi)
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        unix_millis(col("window.end")).as("window_end_ms"),
        col("n"), col("psi_pico"),
        (col("psi_pico") > 200000000000L).as("drifted"))
  }

  /** Streaming binned-KS drift monitor — the cumulative companion to
    * [[psiVsReference]] on the SAME reference histogram: PSI sums
    * per-bucket log-ratio mass (sensitive to reshuffling anywhere), KS
    * reads the worst CUMULATIVE gap (sensitive to location/scale shifts
    * that move mass across a boundary, and it carries a proper
    * sample-size-aware significance gate where PSI's 0.2 is a
    * convention). Same bucket rule, same one-stateful-aggregation plan:
    * per-window bucket counters, then an unrolled exact-integer
    * cumulative scan — `dd_b = |cumRef_b·n − cum_b·n_ref|` in
    * decimal(38,0), `ks_micro = ⌊10⁶·max dd / (n_ref·n)⌋` — the same
    * cross-multiplied arithmetic as [[graft.ops.Eval]]'s ksFromCells
    * core, which a window's score equals bit-for-bit when fed the same
    * bucket cells (StreamingSpec asserts it). No join, no second
    * stateful operator, append-mode-safe.
    *
    * `at_bucket` is the SMALLEST bucket attaining the max gap (the
    * first crossing; the batch core reports the largest observed cell
    * instead — documented difference, the D value itself is identical).
    * `drifted` compares against the asymptotic two-sample 5% critical
    * value `1.358·√((n_ref+n)/(n_ref·n))` computed per window — the
    * piece PSI cannot give: a quiet window with 40 rows will not flag
    * on noise.
    *
    * Output (append mode, watermark-closed windows):
    * `(window_start_ms, window_end_ms, n, ks_micro, at_bucket,
    * crit_micro, drifted)`; empty windows emit nothing.
    *
    * 100 TB shape: one shuffle on the window key; state per open window
    * is `bins` longs; the reference rides the plan as literals.
    */
  def ksVsReference(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      refLo: Double,
      refHi: Double,
      refCounts: Map[Int, Long],
      bins: Int,
      window: Duration,
      lateness: Duration): DataFrame = {
    require(df.isStreaming, "use ops.Eval.ksStatistic for batch inputs")
    require(bins >= 2 && bins <= 200,
      s"bins $bins out of [2,200] (one counter column per bin)")
    require(refCounts.keys.forall(b => b >= 0 && b < bins),
      "refCounts bucket out of range")
    require(refCounts.values.forall(_ >= 0), "negative reference count")
    val nRef = refCounts.values.sum
    require(nRef > 0, "empty reference histogram")
    val cumRef = (0 until bins)
      .scanLeft(0L)((a, b) => a + refCounts.getOrElse(b, 0L)).tail
    val v = col(valueCol).cast("double")
    val bucket =
      if (refLo == refHi) lit(0)
      else least(greatest(
        floor((v - refLo) * bins / (refHi - refLo)).cast("int"),
        lit(0)), lit(bins - 1))
    val counters = (0 until bins).map(b =>
      count(when(col("__bucket") === b, 1)).as(s"c_$b"))
    val agged = df
      .filter(v.isNotNull)
      .withColumn("__bucket", bucket)
      .withWatermark(tsCol, s"${lateness.toMillis} milliseconds")
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol),
        s"${window.toMillis} milliseconds"))
      .agg(counters.head, counters.tail: _*)
    val withCums = (0 until bins).foldLeft(agged) { (d, b) =>
      d.withColumn(s"cum_$b",
        if (b == 0) col("c_0") else col(s"cum_${b - 1}") + col(s"c_$b"))
    }
    val withN = withCums.withColumn("n", col(s"cum_${bins - 1}"))
    val withDds = (0 until bins).foldLeft(withN) { (d, b) =>
      d.withColumn(s"dd_$b",
        abs(lit(cumRef(b)).cast("decimal(38,0)") * col("n") -
          col(s"cum_$b").cast("decimal(38,0)") * lit(nRef)))
    }
    withDds
      .withColumn("__d",
        (0 until bins).map(b => col(s"dd_$b")).reduce(greatest(_, _)))
      .withColumn("at_bucket", coalesce(
        (0 until bins).map(b =>
          when(col(s"dd_$b") === col("__d"), lit(b))): _*))
      .withColumn("ks_micro", expr(
        s"""cast(__d * 1000000
           div (cast(${nRef}L as decimal(38,0)) * n) as long)"""))
      .withColumn("crit_micro",
        floor(lit(1358000.0) * sqrt((lit(nRef.toDouble) + col("n")) /
          (lit(nRef.toDouble) * col("n")))).cast("long"))
      .withColumn("drifted", col("ks_micro") >= col("crit_micro"))
      .select(
        unix_millis(col("window.start")).as("window_start_ms"),
        unix_millis(col("window.end")).as("window_end_ms"),
        col("n"), col("ks_micro"), col("at_bucket"), col("crit_micro"),
        col("drifted"))
  }
}
