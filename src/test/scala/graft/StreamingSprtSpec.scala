package graft

import graft.ops.Features
import graft.streaming.StreamingSprt
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.concurrent.duration._
import scala.util.Random

/** Streaming SPRT vs the batch operator: identical decision tuples on
  * the same rows across shuffled arrival and random microbatch cuts,
  * and the decided-tombstone contract (one decision, ever).
  */
class StreamingSprtSpec extends SparkSuite {
  import spark.implicits._

  private val (llrP, llrN, up, lo) = (3L, -2L, 7L, -7L)

  test("streaming sprt decisions match batch exactly across random cuts") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(7)
    // 6 keys x 30 outcomes with ~60% success: most keys decide somewhere
    val data = (0 until 180).map { i =>
      (1L + i % 6, i.toLong, (i / 6) * 1000L + 1 + rnd.nextInt(900),
        rnd.nextInt(10) < 6)
    }
    val maxT = data.map(_._3).max

    val stream = MemoryStream[(Long, Long, Long, Boolean)]
    val sdf = stream.toDF().toDF("k", "id", "t_ms", "o")
      .withColumn("ts", timestamp_millis(col("t_ms")))
    val out = StreamingSprt.sprtBernoulli(
      sdf, "k", "ts", "id", "o", llrP, llrN, up, lo, lateness = 1.hour)
    val query = out.writeStream.format("memory").queryName("s_sprt_out")
      .outputMode("append").start()
    try {
      val shuffled = rnd.shuffle(data.toList)
      var from = 0
      Seq(40, 90, 130, 180).foreach { to =>
        stream.addData(shuffled.slice(from, to): _*)
        query.processAllAvailable()
        from = to
      }
      stream.addData((99L, 9999L, maxT + 3700000L, true))
      query.processAllAvailable()

      val got = spark.sql(
        """SELECT k, n_at_decision, llr_at_decision_micro, decision
           FROM s_sprt_out WHERE k < 99""")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1)
      val exp = Features.sprtBernoulli(
        data.toDF("k", "t_ms", "id", "o")
          .select(col("k"), col("id"), col("t_ms"), col("o")),
        "k", "t_ms", "id", "o", llrP, llrN, up, lo)
        .filter(col("decision").isNotNull)
        .select(col("key"), col("n_at_decision"),
          col("llr_at_decision_micro"), col("decision"))
        .as[(Long, Long, Long, String)].collect().sortBy(_._1)
      assert(exp.nonEmpty, "fixture must contain decided keys")
      assert(got.toSeq == exp.toSeq)
    } finally query.stop()
  }

  test("decided keys are tombstoned: later rows never re-emit or restart") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Long, Boolean)]
    val sdf = stream.toDF().toDF("k", "id", "t_ms", "o")
      .withColumn("ts", timestamp_millis(col("t_ms")))
    val out = StreamingSprt.sprtBernoulli(
      sdf, "k", "ts", "id", "o", llrP, llrN, up, lo, lateness = 0.millis)
    val query = out.writeStream.format("memory").queryName("s_sprt_tomb")
      .outputMode("append").start()
    try {
      // three successes: 3, 6, 9 -> accept_h1 at step 3
      stream.addData((1L, 1L, 1000L, true), (1L, 2L, 2000L, true),
        (1L, 3L, 3000L, true))
      stream.addData((9L, 90L, 100000L, true)) // advance watermark
      query.processAllAvailable()
      // a fresh run of successes after the decision: must emit nothing
      stream.addData((1L, 4L, 200000L, true), (1L, 5L, 300000L, true),
        (1L, 6L, 400000L, true), (1L, 7L, 500000L, true))
      stream.addData((9L, 91L, 900000L, true))
      query.processAllAvailable()

      val got = spark.sql(
        """SELECT k, ts_ms, n_at_decision, llr_at_decision_micro, decision
           FROM s_sprt_tomb WHERE k = 1""")
        .as[(Long, Long, Long, Long, String)].collect()
      assert(got.toSeq == Seq((1L, 3000L, 3L, 9L, "accept_h1")))
    } finally query.stop()
  }

  test("epoch boundary: t <= 0 rows are late-filtered by Spark; t >= 1 walk matches batch") {
    implicit val sqlCtx = spark.sqlContext
    // Pins the watermark-mechanics contract on [[StreamingMsprt]]'s
    // scaladoc: rows stamped at or before the epoch are removed by
    // FlatMapGroupsWithStateExec's own late filter (eventTime <=
    // watermark, floor 0) BEFORE the operator runs — no GroupState-level
    // sentinel is involved — so the streaming walk equals the batch walk
    // on the t >= 1 rows only. The t <= 0 rows here are failures that
    // would flip the decision path if they ever counted.
    val admitted = Seq((1L, 11L, 1L, true), (1L, 12L, 2L, true),
      (1L, 13L, 3L, true))
    val dropped = Seq((1L, 1L, 0L, false), (1L, 2L, -5L, false))
    val stream = MemoryStream[(Long, Long, Long, Boolean)]
    val sdf = stream.toDF().toDF("k", "id", "t_ms", "o")
      .withColumn("ts", timestamp_millis(col("t_ms")))
    val out = StreamingSprt.sprtBernoulli(
      sdf, "k", "ts", "id", "o", llrP, llrN, up, lo, lateness = 0.millis)
    val query = out.writeStream.format("memory").queryName("s_sprt_epoch")
      .outputMode("append").start()
    try {
      stream.addData(dropped ++ admitted: _*)
      query.processAllAvailable() // watermark 0 during this batch
      stream.addData((9L, 90L, 100000L, true)) // watermark -> 3, finalizes
      query.processAllAvailable()
      val got = spark.sql(
        """SELECT k, ts_ms, n_at_decision, llr_at_decision_micro, decision
           FROM s_sprt_epoch WHERE k = 1""")
        .as[(Long, Long, Long, Long, String)].collect()
      val exp = Features.sprtBernoulli(
        admitted.toDF("k", "id", "t_ms", "o"),
        "k", "t_ms", "id", "o", llrP, llrN, up, lo)
        .filter(col("decision").isNotNull)
        .select(col("key"), col("n_at_decision"),
          col("llr_at_decision_micro"), col("decision"))
        .as[(Long, Long, Long, String)].collect()
      assert(exp.toSeq == Seq((1L, 3L, 9L, "accept_h1")),
        s"fixture must decide on the admitted rows alone: ${exp.toSeq}")
      assert(got.toSeq == Seq((1L, 3L, 3L, 9L, "accept_h1")),
        s"t <= 0 rows must never enter the walk: ${got.toSeq}")
    } finally query.stop()
  }
}
