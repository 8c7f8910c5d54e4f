package graft
import graft.client.GraftClient
import graft.table._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.concurrent.duration._

/** Empirical scaling check (dev aid): runs the heavy operators on events at
  * 1× and N× (users disjoint per replica, so key cardinality scales with
  * data — the realistic shape) and reports the time ratio. Linear operators
  * should stay near N×; anything super-linear is a red flag for the 100 TB
  * design claims in SCALE.md.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup

    val ev1 = spark.read.parquet(s"$dir/events.parquet")
    val evN = (0 until mult).map { i =>
      ev1.withColumn("user_id", col("user_id") + lit(i * 1000000L))
        .withColumn("event_id", col("event_id") + lit(i * 100000000L))
    }.reduce(_ unionByName _)

    def slidingTime(df: DataFrame, tag: String): Double = {
      val cl = new GraftClient(spark)
      val src = DataFrameSource(s"sc_$tag", df, keys = Some(Seq("user_id")),
        timestampField = Some("ts"), timestampFormat = "epoch_nanos")
      val view = SlidingFeatureView(s"sc_v_$tag", src, features = Seq(
        Feature("s7", SlidingWindowTransform("value", AggFunc.Sum, 7.days, 1.day, Seq("user_id"))),
        Feature("c1", SlidingWindowTransform("value", AggFunc.Count, 1.day, 1.day, Seq("user_id")))))
      val t0 = System.nanoTime()
      cl.getFeatures(view).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def overTime(df: DataFrame, tag: String): Double = {
      val cl = new GraftClient(spark)
      val src = DataFrameSource(s"so_$tag", df, keys = Some(Seq("user_id")),
        timestampField = Some("ts"), timestampFormat = "epoch_nanos")
      val view = DerivedFeatureView(s"so_v_$tag", src, features = Seq(
        Feature("a1", OverWindowTransform("value", AggFunc.Avg, Some(1.hour), Seq("user_id"))),
        Feature("c5", OverWindowTransform("value", AggFunc.Count, None, Seq("user_id"), limit = Some(5)))),
        keepSourceFields = true)
      val t0 = System.nanoTime()
      cl.getFeatures(view).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def pitTime(df: DataFrame, tag: String): Double = {
      import graft.engine.{EventTime, TemporalJoin}
      val left = EventTime.append(
        df.select(col("event_id"), col("user_id"), col("ts")), Some("ts"), "epoch_nanos")
      val right = EventTime.append(
        df.select(col("user_id"), col("ts"), col("value")), Some("ts"), "epoch_nanos")
        .select(col("user_id"), col(EventTime.Col), col("value").as("jv"))
      val t0 = System.nanoTime()
      TemporalJoin.pointInTime(left, right, Seq("user_id"), Seq(("jv", "last_v")))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    for ((name, f) <- Seq(
      ("sliding", slidingTime _), ("over", overTime _), ("pit", pitTime _))) {
      val t1 = f(ev1, s"${name}_1")
      val tN = f(evN, s"${name}_N")
      println(f"$name%-8s 1x=${t1}%6.2fs  ${mult}x=${tN}%6.2fs  ratio=${tN / t1}%.1f (linear=$mult.0)")
    }
    spark.stop()
  }
}
