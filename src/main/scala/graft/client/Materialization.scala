package graft.client

import graft.table.{Sink, TableDescriptor}

import java.util.concurrent.Executors
import scala.collection.mutable
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** One queued feature materialization — descriptor → sink with optional
  * time bounds, ttl and overwrite policy
  * (ref: python/feathub/processors/materialization_descriptor.py:24-80).
  */
final case class MaterializationDescriptor(
    desc: TableDescriptor,
    sink: Sink,
    ttlMillis: Option[Long] = None,
    startMillis: Option[Long] = None,
    endMillis: Option[Long] = None,
    allowOverwrite: Boolean = false)

/** Handle over the asynchronously running jobs of one executed group
  * (ref: python/feathub/processors/spark/spark_job.py — SparkJob /
  * CombinedSparkJob wrap the per-sink futures the same way).
  */
final class MaterializationJob private[client] (futures: Seq[Future[Unit]]) {

  /** Block until every materialization in the group finishes; the first
    * failure propagates (remaining jobs keep running to completion in the
    * background, matching `concurrent.futures` semantics in the reference).
    */
  def waitUntilFinish(timeout: Duration = Duration.Inf): Unit = {
    implicit val ec: ExecutionContext = MaterializationGroup.executionContext
    Await.result(Future.sequence(futures), timeout)
    ()
  }

  def isDone: Boolean = futures.forall(_.isCompleted)
}

/** Groups multiple feature materializations and executes them as one
  * submission (ref: python/feathub/materialization_group.py:29-95).
  *
  * The group submits each sink write CONCURRENTLY on one shared
  * SparkSession: independent sinks overlap their stages instead of
  * running serially, which on a large cluster keeps executors busy while
  * any single write is in its long tail (the reference does the same via
  * a ThreadPoolExecutor, spark_processor.py:100,142-155). Subplans shared
  * between group members are built once — the client's Builder memoizes
  * by table name, so a view feeding several sinks compiles one plan.
  */
final class MaterializationGroup private[client] (client: GraftClient) {

  private val pending = mutable.Buffer.empty[MaterializationDescriptor]

  /** Queue one materialization (ref: materialization_group.py:40-78). */
  def materializeFeatures(
      desc: TableDescriptor,
      sink: Sink,
      ttlMillis: Option[Long] = None,
      startMillis: Option[Long] = None,
      endMillis: Option[Long] = None,
      allowOverwrite: Boolean = false): this.type = synchronized {
    pending += MaterializationDescriptor(
      desc, sink, ttlMillis, startMillis, endMillis, allowOverwrite)
    this
  }

  /** Execute every queued materialization concurrently and clear the
    * queue (ref: materialization_group.py:80-95). Validation is
    * synchronous — an empty group or a ttl request fails HERE, before any
    * job starts (spark_processor.py:126-129 rejects ttl the same way).
    */
  def execute(): MaterializationJob = synchronized {
    if (pending.isEmpty)
      throw new IllegalArgumentException(
        "There should be at least one materialization descriptor.")
    pending.foreach { d =>
      if (d.ttlMillis.isDefined)
        throw new IllegalArgumentException(
          "Spark engine does not support inserting features with ttl.")
    }
    val batch = pending.toList
    pending.clear()
    implicit val ec: ExecutionContext = MaterializationGroup.executionContext
    new MaterializationJob(batch.map { d =>
      Future {
        client.materialize(
          d.desc, d.sink, d.startMillis, d.endMillis,
          allowOverwrite = Some(d.allowOverwrite))
      }
    })
  }
}

object MaterializationGroup {
  /** Shared daemon pool for group submissions — sized for driver-side
    * job coordination (each task just submits Spark actions and blocks),
    * not for compute.
    */
  private[client] lazy val executionContext: ExecutionContext =
    ExecutionContext.fromExecutorService(
      Executors.newCachedThreadPool { r =>
        val t = new Thread(r, "graft-materialization")
        t.setDaemon(true)
        t
      })
}
