package graft

import graft.client.{GraftClient, MemoryOnlineStore}
import graft.table._
import graft.types._
import org.apache.spark.sql.functions._

import scala.concurrent.duration._

/** The reference's README quickstart (python/feathub/examples/nyc_taxi.py)
  * ported statement-for-statement to this engine's Scala API — the
  * switch-over proof: every construct the quickstart uses (headerless CSV
  * source with a strftime timestamp, expression features, 90-day
  * over-window aggregates, a second view over STRING references with
  * derived expressions, time-ranged materialization into the online
  * store, and on-demand serving with a request-time expression) runs
  * against hand-computable data.
  */
class QuickstartSpec extends SparkSuite {

  test("nyc_taxi quickstart pipeline end-to-end") {
    MemoryOnlineStore.clear()
    val cl = new GraftClient(spark)

    // --- sample_data.csv stand-in: same 21-column schema, headerless ----
    val tmp = SparkEnv.scratchDir("graft_quickstart")
    val rows = Seq(
      // trip_id, vendor, pickup, dropoff, flag, rate, PU, DO, pax, dist, fare, rest...
      "0,2.0,2020-04-01 00:10:00,2020-04-01 00:20:00,N,1.0,42,247,1.0,1.5,10.0,0.5,0.5,0.0,0.0,,0.3,11.3,1.0,1.0,0.0",
      "1,2.0,2020-04-02 00:05:00,2020-04-02 00:25:00,N,1.0,43,247,1.0,35.0,20.0,0.5,0.5,0.0,0.0,,0.3,21.3,1.0,1.0,0.0",
      "2,1.0,2020-04-03 00:30:00,2020-04-03 00:40:00,N,1.0,44,247,2.0,2.0,6.0,0.5,0.5,0.0,0.0,,0.3,7.3,2.0,1.0,0.0",
      "3,2.0,2020-04-01 01:00:00,2020-04-01 01:08:00,N,1.0,45,41,1.0,1.2,8.0,0.5,0.5,0.0,0.0,,0.3,9.3,1.0,1.0,0.0",
      "4,1.0,2020-04-02 01:00:00,2020-04-02 01:30:00,N,1.0,46,41,3.0,4.0,4.0,0.5,0.5,0.0,0.0,,0.3,5.3,1.0,1.0,0.0")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(tmp))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(tmp, "sample.csv"),
      rows.mkString("\n").getBytes("UTF-8"))

    val schema = Schema(
      Seq("trip_id", "VendorID", "lpep_pickup_datetime", "lpep_dropoff_datetime",
        "store_and_fwd_flag", "RatecodeID", "PULocationID", "DOLocationID",
        "passenger_count", "trip_distance", "fare_amount", "extra", "mta_tax",
        "tip_amount", "tolls_amount", "ehail_fee", "improvement_surcharge",
        "total_amount", "payment_type", "trip_type", "congestion_surcharge"),
      Seq(DInt64, DFloat64, DString, DString, DString, DFloat64, DInt64, DInt64,
        DFloat64, DFloat64, DFloat64, DFloat64, DFloat64, DFloat64, DFloat64,
        DFloat64, DFloat64, DFloat64, DFloat64, DFloat64, DFloat64))

    val source = FileSource(
      "source_1", tmp, "csv", schema = Some(schema),
      timestampField = Some("lpep_dropoff_datetime"),
      timestampFormat = "%Y-%m-%d %H:%M:%S")

    // --- feature_view_1: expression + three 90-day over-windows ---------
    cl.registerTable(DerivedFeatureView(
      "feature_view_1", source,
      features = Seq(
        Feature.expr("f_trip_time_duration",
          "UNIX_TIMESTAMP(lpep_dropoff_datetime) - UNIX_TIMESTAMP(lpep_pickup_datetime)"),
        Feature("f_location_avg_fare",
          OverWindowTransform("fare_amount", AggFunc.Avg, Some(90.days), Seq("DOLocationID"))),
        Feature("f_location_max_fare",
          OverWindowTransform("fare_amount", AggFunc.Max, Some(90.days), Seq("DOLocationID"))),
        Feature("f_location_total_fare_cents",
          OverWindowTransform("fare_amount * 100", AggFunc.Sum, Some(90.days), Seq("DOLocationID")))),
      keepSourceFields = true))

    // --- feature_view_2: string references + derived expressions --------
    val featureView2 = UnresolvedDerivedFeatureView(
      "feature_view_2", "feature_view_1",
      Seq[FeatureRef](
        "f_location_avg_fare",
        Feature("f_trip_time_rounded", "f_trip_time_duration / 10"),
        Feature("f_is_long_trip_distance", "trip_distance > 30"),
        "f_location_total_fare_cents"),
      keepSourceFields = true).build()
    cl.registerTable(featureView2)

    // --- offline read (client.get_features(...).to_pandas()) ------------
    val train = cl.getFeatures("feature_view_2")
      .orderBy("trip_id").collect()
    assert(train.length == 5)
    val byTrip = train.map(r => r.getAs[Long]("trip_id") -> r).toMap
    assert(byTrip(0L).getAs[Double]("f_location_avg_fare") == 10.0)
    assert(byTrip(1L).getAs[Double]("f_location_avg_fare") == 15.0)
    assert(byTrip(2L).getAs[Double]("f_location_avg_fare") == 12.0) // (10+20+6)/3
    assert(byTrip(4L).getAs[Double]("f_location_avg_fare") == 6.0)  // (8+4)/2
    assert(byTrip(1L).getAs[Double]("f_trip_time_rounded") == 120.0) // 1200s / 10
    assert(byTrip(1L).getAs[Boolean]("f_is_long_trip_distance"))
    assert(byTrip(2L).getAs[Double]("f_location_total_fare_cents") == 3600.0)

    // --- materialize selected features into the online store ------------
    // view_2 keeps source fields, so f_location_max_fare (a view_1 output)
    // is still selectable by name — exactly the quickstart's view_3
    val selected = UnresolvedDerivedFeatureView(
      "feature_view_3", "feature_view_2",
      Seq[FeatureRef]("f_location_avg_fare", "f_location_max_fare"),
      keys = Some(Seq("DOLocationID"))).build()
    cl.materialize(
      selected,
      MemoryStoreSink("table_name_1"),
      startMillis = Some(1577836800000L),  // 2020-01-01, the quickstart range
      endMillis = Some(1589932800000L))    // 2020-05-20

    // --- on-demand view over the store + request-time expression --------
    val onlineSource = MemoryStoreSource(
      "online_store_source", "table_name_1", keys = Some(Seq("DOLocationID")))
    cl.registerTable(onlineSource)
    val onDemand = OnDemandFeatureView(
      "on_demand_feature_view",
      features = Seq(
        Feature("f_location_avg_fare",
          JoinTransform("online_store_source", "f_location_avg_fare"),
          keys = Some(Seq("DOLocationID"))),
        Feature("f_location_max_fare",
          JoinTransform("online_store_source", "f_location_max_fare"),
          keys = Some(Seq("DOLocationID"))),
        Feature.expr("max_avg_ratio", "f_location_max_fare / f_location_avg_fare")),
      requestFields = Seq("DOLocationID"))
    val online = cl.getOnlineFeatures(Seq(Map("DOLocationID" -> 247L)), onDemand)
    assert(online.head("f_location_avg_fare") == 12.0) // latest per key
    assert(online.head("f_location_max_fare") == 20.0)
    assert(online.head("max_avg_ratio") == 20.0 / 12.0)
  }
}
