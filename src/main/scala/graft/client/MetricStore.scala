package graft.client

import graft.table._
import org.apache.spark.sql.Row

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.concurrent.duration.Duration

/** Handle for a running [[MetricStore.reportStream]]: the metrics query
  * plus the re-emission timer. [[stop]] reports the final cached values
  * once more — the Flink operator's `endInput` flush.
  */
final class StreamingMetricReport private[client] (
    val query: org.apache.spark.sql.streaming.StreamingQuery,
    scheduler: java.util.concurrent.ScheduledExecutorService,
    emitNow: () => Unit) {
  def stop(): Unit = {
    scheduler.shutdownNow()
    query.stop()
    emitNow()
  }
}

/** Feature-quality metric reporting: metric features (built with
  * [[Metrics]]) compile into a sliding view over the sink-bound table and
  * are written in Prometheus text exposition format
  * (ref: python/feathub/metric_stores/metric_store.py:89-140 +
  * prometheus_metric_store.py). The target is either a local file (the
  * network-free equivalent) or a PushGateway group via
  * [[graft.table.PrometheusSink]] ([[PrometheusPush]]).
  *
  * Output: one gauge line per metric feature per final window per key,
  * `graft_<metric>{key="v", ...} <value> <window_time_ms>`.
  */
final class MetricStore private (client: GraftClient, target: Either[String, PrometheusSink]) {

  def this(client: GraftClient, reportPath: String) = this(client, Left(reportPath))
  def this(client: GraftClient, prometheus: PrometheusSink) = this(client, Right(prometheus))

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
    val rows = client.getFeatures(metricsView).collect().toSeq
    emit(MetricStore.exposition(
      rows, metricFeatures.map(_.name), keys, desc.name, Some("window_time")))
  }

  /** Materialize `desc` into `sink` and report the metrics ATTACHED to its
    * features ([[graft.table.Metric]]): each metric rewrites to a
    * sliding-window reporting feature, grouped into one view per distinct
    * window size, each reported with its feature/metric tags as labels
    * (ref: metric_store.py:88-141
    * `create_metric_materialization_descriptors` — one materialization per
    * window size — and :126-174 for names and tags).
    */
  def materializeWithMetrics(desc: TableDescriptor, sink: Sink): Unit = {
    client.materialize(desc, sink)
    val entries = Metric.expand(MetricStore.hostFeatures(desc))
    if (entries.isEmpty) return
    val text = entries.groupBy(_.windowSize).toSeq.sortBy(_._1.toMillis)
      .map { case (w, group) =>
        // plain sliding defaults, as the reference's _get_metrics_view:
        // empty-window output ON zero-fills idle windows
        val view = SlidingFeatureView(
          s"${desc.name}_metrics_${w.toMillis}", desc,
          group.flatMap(_.features))
        val rows = client.getFeatures(view).collect().toSeq
        MetricStore.taggedExposition(
          rows, group.map(e => e.name -> e.tags), Nil, desc.name,
          Some(view.timestampFieldName))
      }.mkString
    emit(text)
  }

  /** Streaming metric reporting with steady re-emission: the metric
    * features compile to a sliding view over the unbounded source
    * (empty-window output ON, so idle windows report zeros), each
    * microbatch updates a latest-row-per-key cache and reports it, and a
    * daemon timer re-reports the cached values every `reportInterval` so
    * the target stays fresh between windows — the Spark seat of the
    * reference's processing-time last-value operator
    * (ref: java/feathub-udf/flink-udf/src/main/java/com/alibaba/feathub/
    * flink/udf/PeriodicEmitLastValueOperator.java:36-92, wired by
    * metric_store.py:249-264 with interval = report_interval_sec).
    *
    * The per-batch collect touches only pre-aggregated metric rows
    * (dimension-sized by construction), never the data stream.
    */
  def reportStream(
      desc: TableDescriptor,
      metricFeatures: Seq[Feature],
      checkpointDir: String,
      keys: Seq[String] = Nil,
      reportInterval: Duration = Duration(10, "s")): StreamingMetricReport =
    reportStreamView(
      SlidingFeatureView(
        s"${desc.name}_metrics", desc, metricFeatures,
        skipSameWindowOutput = false),
      metricFeatures.map(_.name -> Seq.empty[(String, String)]),
      desc.name, checkpointDir, keys, reportInterval)

  /** Streaming report of the metrics ATTACHED to `desc`'s features: one
    * streaming query per distinct metric window size, each with steady
    * re-emission (the streaming face of the attached-metrics
    * [[materializeWithMetrics]]).
    */
  def reportStreamAttached(
      desc: TableDescriptor,
      checkpointDir: String,
      reportInterval: Duration = Duration(10, "s")): Seq[StreamingMetricReport] =
    Metric.expand(MetricStore.hostFeatures(desc))
      .groupBy(_.windowSize).toSeq.sortBy(_._1.toMillis)
      .map { case (w, group) =>
        reportStreamView(
          SlidingFeatureView(
            s"${desc.name}_metrics_${w.toMillis}", desc,
            group.flatMap(_.features),
            skipSameWindowOutput = false),
          group.map(e => e.name -> e.tags),
          desc.name, s"$checkpointDir/w${w.toMillis}", Nil, reportInterval)
      }

  private def reportStreamView(
      metricsView: SlidingFeatureView,
      metrics: Seq[(String, Seq[(String, String)])],
      table: String,
      checkpointDir: String,
      keys: Seq[String],
      reportInterval: Duration): StreamingMetricReport = {
    import org.apache.spark.sql.DataFrame
    val mdf = client.getFeatures(metricsView)
    val latest = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], (Long, Row)]
    def emitNow(): Unit = {
      val rows = latest.synchronized { latest.values.toSeq.sortBy(_._1).map(_._2) }
      if (rows.nonEmpty)
        emit(MetricStore.taggedExposition(
          rows, metrics, keys, table, Some(metricsView.timestampFieldName)))
    }
    val query = mdf.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect()
        if (rows.nonEmpty) {
          latest.synchronized {
            rows.foreach { r =>
              val t = r.getAs[Long](metricsView.timestampFieldName)
              val k = keys.map(r.getAs[Any])
              if (latest.get(k).forall(_._1 <= t)) latest(k) = (t, r)
            }
          }
          emitNow()
        }
      }.start()
    val scheduler = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-metric-report"); t.setDaemon(true); t
      })
    scheduler.scheduleAtFixedRate(
      () => emitNow(),
      reportInterval.toMillis, reportInterval.toMillis,
      java.util.concurrent.TimeUnit.MILLISECONDS)
    new StreamingMetricReport(query, scheduler, () => emitNow())
  }

  /** Best-effort cleanup: deletes the PushGateway group when the sink asked
    * for it (ref: prometheus_sink.py `delete_on_shutdown`). No-op for file
    * targets.
    */
  def shutdown(): Unit = target match {
    case Right(ps) if ps.deleteOnShutdown => PrometheusPush.delete(ps)
    case _                                => ()
  }

  private def emit(text: String): Unit = target match {
    case Left(path) =>
      Files.write(
        Paths.get(path), text.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
        StandardOpenOption.WRITE)
    case Right(ps) => PrometheusPush.push(ps, text)
  }
}

object MetricStore {

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

  /** Rows → gauge lines. `tsField` (epoch-millis long), when present and
    * non-null, becomes the sample timestamp.
    */
  def exposition(
      rows: Seq[Row],
      metricNames: Seq[String],
      keys: Seq[String],
      table: String,
      tsField: Option[String]): String =
    taggedExposition(rows, metricNames.map(_ -> Seq.empty[(String, String)]), keys, table, tsField)

  /** As above, with constant extra labels per metric (the reference's
    * metric tags — feature_name, filter_expr, …; metric_store.py:142-174).
    */
  def taggedExposition(
      rows: Seq[Row],
      metrics: Seq[(String, Seq[(String, String)])],
      keys: Seq[String],
      table: String,
      tsField: Option[String]): String = {
    val sb = new StringBuilder
    metrics.foreach { case (m, _) =>
      sb.append(s"# TYPE graft_${sanitize(m)} gauge\n")
    }
    rows.foreach { r =>
      val rowLabels =
        Seq(s"""table="${escapeLabel(table)}"""") ++
          keys.map(k => s"""${sanitize(k)}="${escapeLabel(r.getAs[Any](k))}"""")
      val ts = tsField
        .filter(f => r.schema.fieldNames.contains(f))
        .flatMap(f => Option(r.getAs[Any](f)))
        .collect { case n: Number => s" $n" } // non-numeric ts: no sample timestamp
        .getOrElse("")
      metrics.foreach { case (m, tags) =>
        val v = r.getAs[Any](m)
        val labels =
          (rowLabels ++ tags.map { case (k, tv) => s"""${sanitize(k)}="${escapeLabel(tv)}"""" })
            .mkString(",")
        if (v != null)
          sb.append(s"graft_${sanitize(m)}{$labels} $v$ts\n")
      }
    }
    sb.toString
  }

  /** The features whose attached metrics report when `desc` materializes —
    * recursing into the source chain when `keepSourceMetrics` is set
    * (ref: metric_store.py:131-139; feature_view.py:72-76).
    */
  def hostFeatures(desc: TableDescriptor): Seq[Feature] = desc match {
    case v: DerivedFeatureView =>
      v.features ++ (if (v.keepSourceMetrics) hostFeatures(v.source) else Nil)
    case v: SlidingFeatureView =>
      v.features ++ (if (v.keepSourceMetrics) hostFeatures(v.source) else Nil)
    case _ => Nil
  }
}

/** Minimal PushGateway client over java.net (ref: prometheus_sink.py —
  * metrics group at `/metrics/job/<job>[/<label>/<value>...]`; PUT replaces
  * the group, DELETE drops it).
  */
object PrometheusPush {

  private def groupUrl(ps: PrometheusSink): java.net.URL = {
    val enc: String => String = s => java.net.URLEncoder.encode(s, "UTF-8")
    new java.net.URL(
      ps.serverUrl.stripSuffix("/") + "/metrics/job/" + enc(ps.jobName) +
        ps.extraLabels.toSeq.sortBy(_._1)
          .map { case (k, v) => s"/${enc(k)}/${enc(v)}" }.mkString)
  }

  def push(ps: PrometheusSink, body: String): Unit = http("PUT", ps, Some(body))

  def delete(ps: PrometheusSink): Unit = http("DELETE", ps, None)

  private def http(method: String, ps: PrometheusSink, body: Option[String]): Unit = {
    val conn = groupUrl(ps).openConnection().asInstanceOf[java.net.HttpURLConnection]
    try {
      conn.setRequestMethod(method)
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(10000)
      body.foreach { b =>
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "text/plain; version=0.0.4; charset=utf-8")
        val os = conn.getOutputStream
        try os.write(b.getBytes("UTF-8")) finally os.close()
      }
      val code = conn.getResponseCode
      require(code >= 200 && code < 300,
        s"PushGateway $method ${groupUrl(ps)} returned HTTP $code")
    } finally conn.disconnect()
  }
}
