package graft.client

import graft.table._
import org.apache.spark.sql.Row

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Feature-quality metric reporting: metric features (built with
  * [[Metrics]]) compile into a sliding view over the sink-bound table and
  * are written in Prometheus text exposition format
  * (ref: python/feathub/metric_stores/metric_store.py:89-140 +
  * prometheus_metric_store.py — the reference pushes to a gateway; this
  * writes the same exposition text to a file, the network-free equivalent).
  *
  * Output: one gauge line per metric feature per final window per key,
  * `graft_<metric>{key="v", ...} <value> <window_time_ms>`.
  */
final class MetricStore(client: GraftClient, reportPath: String) {

  /** Materialize `desc` into `sink`, then compute and report `metricFeatures`
    * over the same table (ref: metric_store.py:89-140 wraps every sink this
    * way).
    */
  def materializeWithMetrics(
      desc: TableDescriptor,
      sink: Sink,
      metricFeatures: Seq[Feature],
      keys: Seq[String] = Nil): Unit = {
    client.materialize(desc, sink)
    val metricsView = SlidingFeatureView(
      s"${desc.name}_metrics", desc, metricFeatures,
      enableEmptyWindowOutput = false,
      skipSameWindowOutput = false)
    report(desc.name, metricsView, metricFeatures.map(_.name), keys)
  }

  private def sanitize(s: String): String =
    s.replaceAll("[^a-zA-Z0-9_]", "_")

  /** Escape a label VALUE per the Prometheus text exposition format:
    * backslash, double-quote, and line-feed must be escaped; anything else
    * passes through verbatim.
    */
  private def escapeLabel(v: Any): String =
    String.valueOf(v)
      .replace("\\", "\\\\")
      .replace("\"", "\\\"")
      .replace("\n", "\\n")

  private def report(
      table: String,
      view: SlidingFeatureView,
      metricNames: Seq[String],
      keys: Seq[String]): Unit = {
    val rows = client.getFeatures(view).collect()
    val sb = new StringBuilder
    metricNames.foreach { m =>
      sb.append(s"# TYPE graft_${sanitize(m)} gauge\n")
    }
    rows.foreach { r =>
      val labels =
        (Seq(s"""table="${escapeLabel(table)}"""") ++
          keys.map(k => s"""${sanitize(k)}="${escapeLabel(r.getAs[Any](k))}"""")).mkString(",")
      val wt = r.getAs[Long]("window_time")
      metricNames.foreach { m =>
        val v = r.getAs[Any](m)
        if (v != null)
          sb.append(s"graft_${sanitize(m)}{$labels} $v $wt\n")
      }
    }
    Files.write(
      Paths.get(reportPath), sb.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
  }
}
