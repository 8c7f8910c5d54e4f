package graft.table

import scala.concurrent.duration.Duration

/** A data-quality metric attached to a [[Feature]], reported when the
  * hosting view materializes (ref: python/feathub/metric_stores/
  * metric.py:24-283 — Count/Ratio/Average/CountMap; python/feathub/
  * feature_views/feature.py:57-110 carries `metrics` per feature).
  *
  * `filterExpr` is a PARTIAL expression: a binary operator with its left
  * operand absent, enriched with the host feature name at rewrite time —
  * `Count(Some("IS NULL"))` on feature `f` counts rows where `f IS NULL`
  * (ref: metric.py:85-92).
  *
  * `windowSize` zero (the default) means "over all history": the rewrite
  * uses the engine's cumulative sliding path instead of a stepped window
  * (ref: metric.py:93-96).
  */
sealed trait Metric {
  def metricType: String
  def windowSize: Duration
  /** Reported with the metric as exposition labels (ref: metric.get_tags +
    * metric_store.py:142-174 `_get_metric_tags`).
    */
  def tags: Seq[(String, String)]
}

object Metric {

  final case class Count(
      filterExpr: Option[String] = None,
      windowSize: Duration = Duration.Zero) extends Metric {
    val metricType = "count"
    def tags: Seq[(String, String)] = Seq("filter_expr" -> filterExpr.getOrElse(""))
  }

  final case class Ratio(
      filterExpr: String,
      windowSize: Duration = Duration.Zero) extends Metric {
    val metricType = "ratio"
    def tags: Seq[(String, String)] = Seq("filter_expr" -> filterExpr)
  }

  final case class Average(
      filterExpr: Option[String] = None,
      windowSize: Duration = Duration.Zero) extends Metric {
    val metricType = "average"
    def tags: Seq[(String, String)] = Seq("filter_expr" -> filterExpr.getOrElse(""))
  }

  final case class CountMap(
      filterExpr: Option[String] = None,
      windowSize: Duration = Duration.Zero) extends Metric {
    val metricType = "count_map"
    def tags: Seq[(String, String)] =
      Seq("value" -> "null", "filter_expr" -> filterExpr.getOrElse(""))
  }

  /** One reporting entry produced by [[expand]]: the output metric name,
    * its exposition labels, the realizing features (two for Ratio — the
    * sliding mean plus the NULL→0 finisher), and the grouping window.
    */
  final case class Entry(
      name: String,
      tags: Seq[(String, String)],
      features: Seq[Feature],
      windowSize: Duration)

  /** Rewrite features' attached metrics into sliding-window reporting
    * features, named `<feature>_<metric_type>`
    * (ref: metric_store.py:126-141 `_get_metric_name` with the namespace
    * prefix applied at exposition time, and metric.py
    * `get_transform_functions` for each rewrite).
    */
  def expand(hostFeatures: Seq[Feature]): Seq[Entry] = {
    val entries = hostFeatures.flatMap { f =>
      f.metrics.map { m =>
        val name = s"${f.name}_${m.metricType}"
        val enriched = filterOf(f.name, m)
        // windowSize zero → the engine's cumulative path (window and step
        // both zero), matching "computed from all feature values processed
        // since the job is created"
        def slide(expr: String, agg: AggFunc, filter: Option[String]) =
          SlidingWindowTransform(expr, agg, m.windowSize, m.windowSize, Nil, filter)
        val feats = m match {
          case _: Count =>
            Seq(Feature(name, slide("1", AggFunc.Count, enriched)))
          case Ratio(pe, _) =>
            val raw = s"${name}__raw"
            Seq(
              Feature(raw, slide(
                s"CASE WHEN `${f.name}` $pe THEN 1 ELSE 0 END", AggFunc.Avg, None)),
              Feature(name, ExpressionTransform(
                s"CASE WHEN `$raw` IS NULL THEN 0 ELSE `$raw` END")))
          case _: Average =>
            Seq(Feature(name, slide(s"`${f.name}`", AggFunc.Avg, enriched)))
          case _: CountMap =>
            Seq(Feature(name, slide(
              s"CAST(`${f.name}` AS STRING)", AggFunc.ValueCounts, enriched)))
        }
        Entry(name, ("feature_name" -> f.name) +: m.tags, feats, m.windowSize)
      }
    }
    val dup = entries.groupBy(_.name).collect { case (n, es) if es.size > 1 => n }
    require(dup.isEmpty,
      s"duplicate metric entries ${dup.mkString(", ")}: at most one metric " +
        "of each type per feature")
    entries
  }

  private def filterOf(feature: String, m: Metric): Option[String] = {
    val pe = m match {
      case Count(fe, _)    => fe
      case Ratio(_, _)     => None // folded into the 0/1 indicator instead
      case Average(fe, _)  => fe
      case CountMap(fe, _) => fe
    }
    pe.map(p => s"`$feature` $p")
  }
}
