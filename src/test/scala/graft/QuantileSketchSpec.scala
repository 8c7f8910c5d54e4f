package graft

import graft.functions.QuantileSketchAgg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The mergeable bottom-k-by-hash quantile sketch: exactness below
  * saturation, order/partitioning invariance (the property that makes
  * it oracle-replayable), and streaming-window bit-parity with batch.
  */
class QuantileSketchSpec extends SparkSuite {

  test("exact quantiles when the group fits the sketch (n <= k)") {
    val spark2 = spark
    import spark2.implicits._
    // values 0..20 scaled; k=64 >> 21 rows → sample is the whole group
    val df = (0 to 20).map(i => (s"id$i", i * 10L)).toDF("id", "v")
    val f = QuantileSketchAgg.qsketch(64, Seq(0, 25, 50, 75, 100))
    val r = df.agg(f(col("id"), col("v")).as("s")).select(col("s.*")).collect()(0)
    assert(r.getAs[Long]("n") == 21L && r.getAs[Long]("m") == 21L)
    // nearest-rank floor(p*(m-1)/100) over 0,10,...,200
    assert(r.getAs[scala.collection.Seq[Long]]("q_micro").toSeq == Seq(0L, 50L, 100L, 150L, 200L))
  }

  test("sketch is invariant to partitioning and row order") {
    val spark2 = spark
    import spark2.implicits._
    val rows = (0 until 500).map(i => (s"e$i", (i * 37 % 500).toLong))
    val f = QuantileSketchAgg.qsketch(32, Seq(10, 50, 90))
    def run(shuffle: Boolean, parts: Int): Seq[Any] = {
      val base = rows.toDF("id", "v")
      val df = if (shuffle) base.orderBy(rand(7)).repartition(parts)
        else base.repartition(parts)
      df.agg(f(col("id"), col("v")).as("s")).select(col("s.*"))
        .collect()(0).toSeq
    }
    val a = run(shuffle = false, 1)
    assert(a == run(shuffle = true, 7))
    assert(a == run(shuffle = true, 32))
    assert(a.head == 500L) // n exact regardless
  }

  test("duplicate ids deterministically keep the smallest value; nulls ignored") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(("a", java.lang.Long.valueOf(5L)), ("a", java.lang.Long.valueOf(3L)),
        ("b", java.lang.Long.valueOf(9L)), (null, java.lang.Long.valueOf(1L)),
        ("c", null.asInstanceOf[java.lang.Long]))
      .toDF("id", "v")
    val f = QuantileSketchAgg.qsketch(8, Seq(0, 100))
    val r = df.agg(f(col("id"), col("v")).as("s")).select(col("s.*")).collect()(0)
    // n counts the 3 valid rows (dup id rows both count); sample dedups
    assert(r.getAs[Long]("n") == 3L && r.getAs[Long]("m") == 2L)
    assert(r.getAs[scala.collection.Seq[Long]]("q_micro").toSeq == Seq(3L, 9L))
  }

  test("streaming windowed quantiles equal batch bit-for-bit, O(k) state") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val f = QuantileSketchAgg.qsketch(8, Seq(50, 90))
    // window 1 (min 0-10): 30 rows, saturates k=8; window 2: 5 rows, exact
    val rows = (0 until 35).map { i =>
      if (i < 30) (s"r$i", (i * 13 % 100).toLong, 60000L + (i % 9) * 60000L)
      else (s"s$i", (i * 7).toLong, 700000L + (i % 3) * 60000L)
    }
    val stream = MemoryStream[(String, Long, Long)]
    val sdf = stream.toDF().toDF("id", "v", "t_ms")
      .withColumn("ts", timestamp_millis(col("t_ms")))
      .withWatermark("ts", "1 second")
    val out = sdf.groupBy(window(col("ts"), "10 minutes"))
      .agg(f(col("id"), col("v")).as("s"))
      .select(col("window.start").cast("long").as("w_start"),
        col("s.n"), col("s.m"),
        element_at(col("s.q_micro"), 1).as("p50"),
        element_at(col("s.q_micro"), 2).as("p90"))
    val query = out.writeStream.format("memory").queryName("s_qsk_out")
      .outputMode("append").start()
    try {
      stream.addData(rows.take(18): _*)
      query.processAllAvailable()
      stream.addData(rows.drop(18): _*)
      query.processAllAvailable()
      stream.addData(("wm", 0L, 7200000L)) // watermark past both windows
      query.processAllAvailable()
      stream.addData(("wm2", 0L, 14400000L))
      query.processAllAvailable()

      val got = spark.sql(
        "SELECT w_start, n, m, p50, p90 FROM s_qsk_out WHERE w_start < 7200")
        .collect().map(_.toSeq).toSet
      val batch = rows.toDF("id", "v", "t_ms")
        .withColumn("ts", timestamp_millis(col("t_ms")))
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(f(col("id"), col("v")).as("s"))
        .select(col("window.start").cast("long").as("w_start"),
          col("s.n"), col("s.m"),
          element_at(col("s.q_micro"), 1).as("p50"),
          element_at(col("s.q_micro"), 2).as("p90"))
        .collect().map(_.toSeq).toSet
      assert(got == batch, s"stream $got != batch $batch")
      // window 1 saturated: m == k < n
      assert(got.exists(r => r(1) == 30L && r(2) == 8L))
    } finally query.stop()
  }

  test("hll aggregator: partitioning-invariant registers, ~6.5% accuracy, linear-counting small range") {
    val spark2 = spark
    import spark2.implicits._
    val f = graft.functions.HllAgg.hll
    def est(vals: Seq[String], parts: Int): (Long, Long, Long) = {
      val r = vals.toDF("v").repartition(parts)
        .agg(f(col("v")).as("s")).select(col("s.*")).collect()(0)
      (r.getAs[Long]("n_zero_regs"), r.getAs[Long]("s49"),
        r.getAs[Long]("est_distinct"))
    }
    // duplicates collapse; partitioning/merge shape never changes registers
    val big = (0 until 20000).map(i => s"u${i % 5000}")
    val a = est(big, 1)
    assert(a == est(big.reverse, 13))
    assert(math.abs(a._3 - 5000L) < 700L, s"estimate ${a._3} off >14%")
    // tiny set takes the linear-counting branch and lands very close
    val small = (0 until 40).map(i => s"x$i")
    val b = est(small, 3)
    assert(math.abs(b._3 - 40L) <= 4L, s"small-range estimate ${b._3}")
  }

  test("hll aggregator: streaming windowed cardinality equals batch bit-for-bit") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val f = graft.functions.HllAgg.hll
    val rows = (0 until 40).map { i =>
      if (i < 30) (s"u${i % 12}", 60000L + (i % 9) * 60000L)
      else (s"w${i % 4}", 700000L + (i % 3) * 60000L)
    }
    val stream = MemoryStream[(String, Long)]
    val sdf = stream.toDF().toDF("v", "t_ms")
      .withColumn("ts", timestamp_millis(col("t_ms")))
      .withWatermark("ts", "1 second")
    val out = sdf.groupBy(window(col("ts"), "10 minutes")).agg(f(col("v")).as("s"))
      .select(col("window.start").cast("long").as("w_start"),
        col("s.n_zero_regs"), col("s.s49"), col("s.est_distinct"))
    val query = out.writeStream.format("memory").queryName("s_hll_out")
      .outputMode("append").start()
    try {
      stream.addData(rows.take(25): _*)
      query.processAllAvailable()
      stream.addData(rows.drop(25): _*)
      query.processAllAvailable()
      stream.addData(("wm", 7200000L))
      query.processAllAvailable()
      stream.addData(("wm2", 14400000L))
      query.processAllAvailable()
      val got = spark.sql(
        "SELECT w_start, n_zero_regs, s49, est_distinct FROM s_hll_out WHERE w_start < 7200")
        .collect().map(_.toSeq).toSet
      val batch = rows.toDF("v", "t_ms")
        .withColumn("ts", timestamp_millis(col("t_ms")))
        .groupBy(window(col("ts"), "10 minutes")).agg(f(col("v")).as("s"))
        .select(col("window.start").cast("long").as("w_start"),
          col("s.n_zero_regs"), col("s.s49"), col("s.est_distinct"))
        .collect().map(_.toSeq).toSet
      assert(got == batch, s"stream $got != batch $batch")
    } finally query.stop()
  }
}
