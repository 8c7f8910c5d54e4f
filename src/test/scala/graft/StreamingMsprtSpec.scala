package graft

import graft.ops.Features
import graft.streaming.StreamingMsprt
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.concurrent.duration._
import scala.util.Random

/** Streaming mSPRT vs the batch operator: identical (key, step)
  * decisions on the same rows across shuffled arrival and random
  * microbatch cuts, and the decided-tombstone contract.
  */
class StreamingMsprtSpec extends SparkSuite {
  import spark.implicits._

  private val (p0, tau2, alpha) = (500000L, 40000L, 50000L)

  test("streaming msprt decisions match batch across random cuts") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(13)
    // 6 keys x 40 outcomes, ~90% success: several keys reject H0: p=0.5
    val data = (0 until 240).map { i =>
      (1L + i % 6, i.toLong, (i / 6) * 1000L + 1 + rnd.nextInt(900),
        rnd.nextInt(10) < 9)
    }
    val maxT = data.map(_._3).max

    val stream = MemoryStream[(Long, Long, Long, Boolean)]
    val sdf = stream.toDF().toDF("k", "id", "t_ms", "o")
      .withColumn("ts", timestamp_millis(col("t_ms")))
    val out = StreamingMsprt.msprt(
      sdf, "k", "ts", "id", "o", p0, tau2, alpha, lateness = 1.hour)
    val query = out.writeStream.format("memory").queryName("s_msprt_out")
      .outputMode("append").start()
    try {
      val shuffled = rnd.shuffle(data.toList)
      var from = 0
      Seq(55, 120, 200, 240).foreach { to =>
        stream.addData(shuffled.slice(from, to): _*)
        query.processAllAvailable()
        from = to
      }
      stream.addData((99L, 9999L, maxT + 3700000L, true))
      query.processAllAvailable()

      val got = spark.sql(
        """SELECT k, n_at_decision, decision FROM s_msprt_out
           WHERE k < 99""")
        .as[(Long, Long, String)].collect().sortBy(_._1)
      val exp = Features.msprt(
        data.toDF("k", "t_ms", "id", "o")
          .select(col("k"), col("id"), col("t_ms"), col("o")),
        "k", "t_ms", "id", "o", p0, tau2, alpha)
        .filter(col("decision").isNotNull)
        .select(col("key"), col("n_at_decision"), col("decision"))
        .as[(Long, Long, String)].collect().sortBy(_._1)
      assert(exp.nonEmpty, "fixture must contain rejecting keys")
      assert(got.toSeq == exp.toSeq)
      // the emitted lnΛ at the decision step clears the threshold
      val thr = math.floor(1000.0 * math.log(1000000.0 / alpha)).toLong
      spark.sql("SELECT lnlam_at_decision_milli FROM s_msprt_out")
        .as[Long].collect().foreach(l => assert(l >= thr))
    } finally query.stop()
  }

  test("decided keys are tombstoned: later successes never re-emit") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Long, Boolean)]
    val sdf = stream.toDF().toDF("k", "id", "t_ms", "o")
      .withColumn("ts", timestamp_millis(col("t_ms")))
    val out = StreamingMsprt.msprt(
      sdf, "k", "ts", "id", "o", p0, tau2, alpha, lateness = 0.millis)
    val query = out.writeStream.format("memory").queryName("s_msprt_tomb")
      .outputMode("append").start()
    try {
      // enough straight successes to reject (batch: first crossing ≤ 25)
      val first = (1 to 25).map(i => (1L, i.toLong, i * 1000L, true))
      stream.addData(first: _*)
      stream.addData((9L, 90L, 1000000L, true)) // advance watermark
      query.processAllAvailable()
      val n1 = spark.sql(
        "SELECT COUNT(*) FROM s_msprt_tomb WHERE k = 1").as[Long].head()
      assert(n1 == 1L, s"exactly one decision expected, got $n1")
      // a second wave of successes after the decision: nothing new
      val second = (26 to 50).map(i => (1L, i.toLong, 1000000L + i * 1000L, true))
      stream.addData(second: _*)
      stream.addData((9L, 91L, 9000000L, true))
      query.processAllAvailable()
      val n2 = spark.sql(
        "SELECT COUNT(*) FROM s_msprt_tomb WHERE k = 1").as[Long].head()
      assert(n2 == 1L, "tombstone must suppress any further emits")
    } finally query.stop()
  }

  test("epoch boundary: t <= 0 rows are late-filtered by Spark; t >= 1 walk matches batch") {
    implicit val sqlCtx = spark.sqlContext
    // Twin of StreamingSprtSpec's epoch-boundary pin (see
    // [[StreamingMsprt]]'s watermark-mechanics scaladoc): t <= 0 rows
    // are dropped by Spark's exec before the operator, so the streaming
    // decision equals the batch decision on the t >= 1 rows alone. The
    // dropped rows are failures that would push the first crossing out.
    val admitted = (1 to 25).map(i => (1L, 10 + i, i.toLong, true))
    val dropped = Seq((1L, 1, 0L, false), (1L, 2, -7L, false))
    val stream = MemoryStream[(Long, Int, Long, Boolean)]
    val sdf = stream.toDF().toDF("k", "id", "t_ms", "o")
      .withColumn("ts", timestamp_millis(col("t_ms")))
    val out = StreamingMsprt.msprt(
      sdf, "k", "ts", "id", "o", p0, tau2, alpha, lateness = 0.millis)
    val query = out.writeStream.format("memory").queryName("s_msprt_epoch")
      .outputMode("append").start()
    try {
      stream.addData(dropped ++ admitted: _*)
      query.processAllAvailable()
      stream.addData((9L, 90, 1000000L, true)) // advance watermark
      query.processAllAvailable()
      val got = spark.sql(
        """SELECT k, n_at_decision, decision FROM s_msprt_epoch
           WHERE k = 1""").as[(Long, Long, String)].collect()
      val exp = Features.msprt(
        admitted.toDF("k", "id", "t_ms", "o"),
        "k", "t_ms", "id", "o", p0, tau2, alpha)
        .filter(col("decision").isNotNull)
        .select(col("key"), col("n_at_decision"), col("decision"))
        .as[(Long, Long, String)].collect()
      assert(exp.length == 1 && exp.head._3 == "reject_h0",
        s"fixture must reject on the admitted rows alone: ${exp.toSeq}")
      assert(got.toSeq == exp.toSeq,
        s"t <= 0 rows must never enter the walk: ${got.toSeq} vs ${exp.toSeq}")
    } finally query.stop()
  }
}
