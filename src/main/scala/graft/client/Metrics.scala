package graft.client

import graft.table.{AggFunc, Feature, SlidingWindowTransform}

import scala.concurrent.duration.Duration

/** Feature-quality metrics compiled into sliding-window transforms, the
  * reference's metric rewrite (ref: python/feathub/metric_stores/
  * metric.py:75-258 — Count/Ratio/Average/CountMap each become a
  * SlidingWindowTransform over the sink-bound table with step = window).
  * Materialize the resulting SlidingFeatureView to any sink (the reference
  * targets Prometheus; any [[graft.table.Sink]] works here).
  */
object Metrics {

  /** Row count (optionally of rows matching `filterExpr`) per window. */
  def count(
      name: String,
      filterExpr: Option[String],
      window: Duration,
      keys: Seq[String] = Nil): Feature =
    Feature(name, SlidingWindowTransform(
      "1", AggFunc.Count, window, window, keys, filterExpr))

  /** Fraction of rows matching `filterExpr` per window
    * (ref: metric.py:135 Ratio — AVG of the 0/1 indicator).
    */
  def ratio(
      name: String,
      filterExpr: String,
      window: Duration,
      keys: Seq[String] = Nil): Feature =
    Feature(name, SlidingWindowTransform(
      s"CASE WHEN $filterExpr THEN 1 ELSE 0 END",
      AggFunc.Avg, window, window, keys))

  /** Mean of `expr` per window (ref: metric.py:258 Average). */
  def average(
      name: String,
      expr: String,
      window: Duration,
      keys: Seq[String] = Nil,
      filterExpr: Option[String] = None): Feature =
    Feature(name, SlidingWindowTransform(
      expr, AggFunc.Avg, window, window, keys, filterExpr))

  /** Value → occurrence-count map per window (ref: metric.py:196 CountMap). */
  def countMap(
      name: String,
      expr: String,
      window: Duration,
      keys: Seq[String] = Nil): Feature =
    Feature(name, SlidingWindowTransform(
      expr, AggFunc.ValueCounts, window, window, keys))
}
