package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream (batch form): events of one
  * key belong to the same session while consecutive gaps stay within `gapMs`
  * (inclusive); a strictly larger gap opens a new session — the same
  * boundary rule as Spark's `session_window`, which merges sessions whose
  * padded windows touch (events at exactly `gap` apart share a session),
  * so [[graft.streaming.StreamingSessions]] produces identical sessions
  * on the same data (asserted by DifferentialSpec). The classic
  * behavioral-feature primitive (session length / depth / recency feed
  * downstream feature views).
  */
object Sessions {

  /** Per-session aggregate: (key, session_idx, n_events, start/end/duration
    * in ms). `session_idx` numbers a key's sessions from 1 in time order.
    * Ordering ties on the timestamp break by `tieCol` (a unique event id),
    * so the assignment is deterministic for equal-timestamp events.
    *
    * 100 TB shape: ONE shuffle on the key — the lag, the running
    * session-index sum, and the final per-session aggregation all share
    * the same (key, time) sort order, so Catalyst plans a single Exchange
    * + Sort reused by both Window operators and a partial-free final agg.
    * Skew equals per-key event skew (a bot key with millions of events
    * sorts in one partition — pre-split such keys by day first).
    */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      tsMsCol: String,
      tieCol: String,
      gapMs: Long): DataFrame = {
    require(gapMs > 0, s"gapMs $gapMs must be positive")
    val byTime = Window.partitionBy(col(keyCol))
      .orderBy(col(tsMsCol), col(tieCol))
    val newSession = when(
      col(tsMsCol) - lag(col(tsMsCol), 1).over(byTime) > gapMs, 1L)
      .otherwise(when(lag(col(tsMsCol), 1).over(byTime).isNull, 1L).otherwise(0L))
    df.select(col(keyCol), col(tsMsCol), col(tieCol))
      .withColumn("session_idx",
        sum(newSession).over(
          byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsMsCol)).as("start_ms"),
        max(col(tsMsCol)).as("end_ms"))
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))
  }

  /** Ordered conversion funnel: how many keys reach each of `steps` IN
    * ORDER (each step strictly after the previous one's first qualifying
    * hit, greedy-earliest matching), optionally within `windowMs` of the
    * step-0 time. Returns `(step_idx, step, n_keys)` — one row per step,
    * monotonically non-increasing.
    *
    * Greedy-earliest is the standard funnel semantics: taking the FIRST
    * qualifying time at every step maximizes the remaining window, so it
    * never under-counts a key that any other matching would admit.
    *
    * 100 TB shape: each step is a type-filtered scan (predicate pushed to
    * the reader) aggregated to one row per key, then joined key-to-key —
    * k−1 co-partitioned joins on the same key, each input already
    * key-unique (no blow-up), and one final union counted by step. No
    * per-key event lists are ever collected.
    */
  def funnel(
      df: DataFrame,
      keyCol: String,
      tsMsCol: String,
      typeCol: String,
      steps: Seq[String],
      windowMs: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size, s"duplicate steps in $steps")
    val base = df.filter(col(keyCol).isNotNull && col(tsMsCol).isNotNull)
    val s0 = base.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsMsCol)).as("t"))
      .withColumn("t0", col("t"))
    val reached = steps.tail.zipWithIndex.scanLeft(s0) {
      case (prev, (step, _)) =>
        val hits = base.filter(col(typeCol) === step)
          .select(col(keyCol), col(tsMsCol).as("__ts"))
        val inWindow = windowMs
          .map(w => col("__ts") <= col("t0") + w)
          .getOrElse(lit(true))
        hits.join(prev, Seq(keyCol))
          .filter(col("__ts") > col("t") && inWindow)
          .groupBy(col(keyCol), col("t0"))
          .agg(min(col("__ts")).as("t"))
          .select(col(keyCol), col("t"), col("t0"))
    }
    reached.zip(steps).zipWithIndex
      .map { case ((d, step), i) =>
        d.select(lit(i).as("step_idx"), lit(step).as("step"), col(keyCol))
      }
      .reduce(_ unionAll _)
      .groupBy("step_idx", "step")
      .agg(count(lit(1)).as("n_keys"))
  }

  /** First-order transition matrix of an event stream: per (from, to)
    * adjacent-type pair, the count and the integer-micro row-conditional
    * probability `P(to | from)` — the Markov behavioral fingerprint
    * (bot traffic shows near-deterministic rows, organic traffic
    * doesn't). Adjacency is per key in (time, tie) order — `tieCol` (a
    * unique id) makes equal-timestamp ordering deterministic; each key's
    * first event has no predecessor and feeds no pair.
    *
    * 100 TB shape: one (key, time) window shuffle for the lag, then a
    * map-side-combined count to the types×types table; probabilities
    * join against per-from totals on that model-sized table only.
    */
  def transitions(
      df: DataFrame,
      keyCol: String,
      tsMsCol: String,
      typeCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsMsCol), col(tieCol))
    val pairs = df
      .filter(col(keyCol).isNotNull && col(tsMsCol).isNotNull &&
        col(typeCol).isNotNull)
      .withColumn("from_type", lag(col(typeCol), 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("cnt"))
    val totals = pairs.groupBy("from_type").agg(sum("cnt").as("row_total"))
    pairs.join(totals, "from_type")
      .withColumn("prob_micro", expr("cast(cnt as decimal(38,0)) * 1000000 div row_total"))
  }

  /** Pairwise association rules over baskets (market-basket lite): for
    * every ordered item pair (a → b) co-occurring in at least
    * `minSupport` baskets, the exact support / confidence / lift —
    * `lift > 1` means b is over-represented in a's baskets. A basket is
    * whatever grain `basketCols` defines (user-day, session, order).
    *
    * All integer arithmetic: `confidence_micro = n_ab·1e6 div n_a`,
    * `lift_micro = n_ab·N·1e6 div (n_a·n_b)` (decimal(38,0) inside, so
    * no overflow at any corpus size) — hashes across engines.
    *
    * 100 TB shape: one distinct to (basket, item) — THE shuffle — then
    * a basket-local self-join whose blow-up is bounded by per-basket
    * item counts (baskets are small by construction; cap upstream if a
    * bot basket isn't), and model-sized rule math. Item totals reuse
    * the distinct table map-side.
    */
  def associationRules(
      df: DataFrame,
      basketCols: Seq[String],
      itemCol: String,
      minSupport: Long = 1L): DataFrame = {
    require(basketCols.nonEmpty, "at least one basket column")
    require(minSupport >= 1, s"minSupport $minSupport must be >= 1")
    val items = df
      .filter(col(itemCol).isNotNull &&
        basketCols.map(col(_).isNotNull).reduce(_ && _))
      .select(basketCols.map(col) :+ col(itemCol).as("item"): _*)
      .distinct()
    val nBaskets = items.select(basketCols.map(col): _*).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemTotals = items.groupBy("item").agg(count(lit(1)).as("n_item"))
    val pairCounts = items.join(
        items.withColumnRenamed("item", "item_b"), basketCols)
      .filter(col("item") =!= col("item_b"))
      .groupBy(col("item").as("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairCounts
      .join(itemTotals.select(col("item").as("item_a"), col("n_item").as("n_a")),
        "item_a")
      .join(itemTotals.select(col("item").as("item_b"), col("n_item").as("n_b")),
        "item_b")
      .crossJoin(broadcast(nBaskets))
      .withColumn("confidence_micro", expr("cast(n_ab as decimal(38,0)) * 1000000 div n_a"))
      .withColumn("lift_micro", expr(
        """cast(cast(n_ab as decimal(38,0)) * n_baskets * 1000000
             div (cast(n_a as decimal(38,0)) * n_b) as long)"""))
      .select("item_a", "item_b", "n_ab", "n_a", "n_b", "n_baskets",
        "confidence_micro", "lift_micro")
  }
}
