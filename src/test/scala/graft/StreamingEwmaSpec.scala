package graft

import graft.ops.TimeSeries
import graft.streaming.StreamingEwma
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.concurrent.duration._
import scala.util.Random

/** Streaming EWMA vs the batch operator: bit-identical num/den on the
  * same rows, across shuffled arrival order and random microbatch cuts.
  */
class StreamingEwmaSpec extends SparkSuite {
  import spark.implicits._

  test("streaming ewmaPow2 matches batch exactly across random microbatch cuts") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new Random(42)
    // 3 keys x 40 rows, unique (t, id), values with negatives and zeros
    val data = (0 until 120).map { i =>
      (1L + i % 3, i.toLong, (i / 3) * 1000L + rnd.nextInt(900),
        math.round(rnd.nextGaussian() * 500 * 1e4) / 1e4)
    }
    val maxT = data.map(_._3).max

    val stream = MemoryStream[(Long, Long, Long, Double)]
    val sdf = stream.toDF().toDF("k", "id", "t_ms", "v")
      .withColumn("ts", timestamp_millis(col("t_ms")))
    val out = StreamingEwma.ewmaPow2(
      sdf, "k", "ts", "id", "v", lookback = 8, lateness = 1.hour)
    val query = out.writeStream.format("memory").queryName("s_ewma_out")
      .outputMode("append").start()
    try {
      // shuffled arrival, random batch cuts
      val shuffled = rnd.shuffle(data.toList)
      val cuts = Seq(30, 70, 120)
      var from = 0
      cuts.foreach { to =>
        stream.addData(shuffled.slice(from, to): _*)
        query.processAllAvailable()
        from = to
      }
      // sentinel far enough ahead to flush everything (lateness 1h)
      stream.addData((99L, 9999L, maxT + 3700000L, 0.0))
      query.processAllAvailable()

      val got = spark.sql(
        """SELECT k, id, ts_ms, v_micro, cast(ewma_num as long) n, ewma_den
           FROM s_ewma_out WHERE k < 99""")
        .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._3, r._2))
      val exp = TimeSeries.ewmaPow2(
        data.toDF("k", "id", "t_ms", "v"), "k", "t_ms", "id", "v", lookback = 8)
        .selectExpr("k", "id", "t_ms", "v_micro", "cast(ewma_num as long) n",
          "ewma_den")
        .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._3, r._2))
      assert(got.length == 120)
      assert(got.toSeq == exp.toSeq)
    } finally query.stop()
  }

  test("epoch boundary: t <= 0 never reaches the operator; t >= 1 ties across cuts match batch") {
    implicit val sqlCtx = spark.sqlContext
    // Pins the epoch-boundary contract. (a) Rows at or before the epoch
    // are dropped by Spark ITSELF before the operator sees them:
    // FlatMapGroupsWithStateExec's EventTimeTimeout late filter removes
    // eventTime <= watermark and the watermark floor is 0 — so the
    // "watermark unset" admission path can never resurrect a t <= 0 row,
    // and batch parity is scoped to t >= 1. (b) Same-timestamp t >= 1
    // rows split across microbatch cuts (all while the watermark is
    // still 0) must finalize together in (t, tie) order — nothing may
    // finalize before a real watermark passes it.
    val admitted = Seq(
      (1L, 5L, 1000L, 1.0), (1L, 2L, 1000L, 2.0),
      (1L, 3L, 1000L, 3.0), (1L, 6L, 2000L, 4.0))
    val dropped = Seq((1L, 7L, 0L, 9.0), (1L, 8L, -50L, 9.0))
    val stream = MemoryStream[(Long, Long, Long, Double)]
    val sdf = stream.toDF().toDF("k", "id", "t_ms", "v")
      .withColumn("ts", timestamp_millis(col("t_ms")))
    val out = StreamingEwma.ewmaPow2(
      sdf, "k", "ts", "id", "v", lookback = 8, lateness = 1.hour)
    val query = out.writeStream.format("memory").queryName("s_ewma_pre")
      .outputMode("append").start()
    try {
      Seq(Seq(admitted(0), dropped(0)), Seq(admitted(1), admitted(2)),
        Seq(admitted(3), dropped(1)),
        Seq((99L, 9999L, 2000L + 3700000L, 0.0))).foreach { batch =>
        stream.addData(batch: _*)
        query.processAllAvailable()
      }
      val got = spark.sql(
        """SELECT k, id, ts_ms, v_micro, cast(ewma_num as long) n, ewma_den
           FROM s_ewma_pre WHERE k < 99""")
        .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._3, r._2))
      val exp = TimeSeries.ewmaPow2(
        admitted.toDF("k", "id", "t_ms", "v"), "k", "t_ms", "id", "v", lookback = 8)
        .selectExpr("k", "id", "t_ms", "v_micro", "cast(ewma_num as long) n",
          "ewma_den")
        .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._3, r._2))
      assert(got.length == 4, s"t <= 0 rows must be late-filtered: $got")
      assert(got.toSeq == exp.toSeq)
    } finally query.stop()
  }
}
