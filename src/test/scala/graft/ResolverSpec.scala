package graft

import graft.engine.Registry
import graft.table._
import graft.types._
import org.apache.spark.sql.functions._

import scala.concurrent.duration._

/** String feature/source references resolved at build()
  * (ref goldens: python/feathub/feature_views/tests/
  * test_derived_feature_view.py:62-130).
  */
class ResolverSpec extends SparkSuite {

  private def source1 = FileSource(
    "source_1", "dummy_source_file", "csv",
    schema = Some(Schema(
      Seq("id", "fare_amount", "lpep_dropoff_datetime"),
      Seq(DInt32, DInt32, DString))),
    keys = Some(Seq("id")),
    timestampField = Some("lpep_dropoff_datetime"),
    timestampFormat = "%Y-%m-%d %H:%M:%S")

  private def source2 = FileSource(
    "source_2", "dummy_source_file", "csv",
    schema = Some(Schema(
      Seq("id", "distance", "lpep_dropoff_datetime"),
      Seq(DInt32, DInt32, DString))),
    keys = Some(Seq("id")),
    timestampField = Some("lpep_dropoff_datetime"),
    timestampFormat = "%Y-%m-%d %H:%M:%S")

  test("declaration-order golden: string join + shorthand exprs resolve; bad orders throw") {
    // Ref: test_derived_feature_view.py:62-130.
    Registry.clear()
    Registry.register(source2)
    val joinFeature: FeatureRef = "source_2.distance"
    val exprFeature1: FeatureRef = Feature("id_plus_distance", "id + distance")
    val overFeature1: FeatureRef = Feature(
      "over_window",
      OverWindowTransform("fare_amount + distance", AggFunc.Avg),
      keys = Some(Seq("id")))
    val overFeature2: FeatureRef = Feature(
      "over_window_2",
      OverWindowTransform("fare_amount", AggFunc.Avg),
      keys = Some(Seq("id_plus_distance")))
    val exprFeature2: FeatureRef = Feature("expression_feature", "over_window + 1")

    val built = UnresolvedDerivedFeatureView(
      "derived_feature_view", source1,
      Seq(joinFeature, exprFeature1, overFeature1, overFeature2, exprFeature2)).build()
    assert(built.features.map(_.name) ==
      Seq("distance", "id_plus_distance", "over_window", "over_window_2", "expression_feature"))
    assert(built.features.head.transform == JoinTransform("source_2", "`distance`"))
    assert(built.features.head.keys.contains(Seq("id")))
    // build() registers the resolved view
    assert(Registry.get("derived_feature_view") == built)

    // id_plus_distance depends on the joined distance: declaring it first throws
    assertThrows[IllegalArgumentException] {
      UnresolvedDerivedFeatureView(
        "bad_order_1", source1,
        Seq(exprFeature1, joinFeature, overFeature1, overFeature2, exprFeature2)).build()
    }
    // expression_feature depends on over_window: declaring it earlier throws
    assertThrows[IllegalArgumentException] {
      UnresolvedDerivedFeatureView(
        "bad_order_2", source1,
        Seq(joinFeature, exprFeature1, exprFeature2, overFeature1, overFeature2)).build()
    }
  }

  test("source by name; passthrough must exist; join table must have keys") {
    Registry.clear()
    Registry.register(source1)
    val v = UnresolvedDerivedFeatureView(
      "by_name", "source_1", Seq[FeatureRef]("fare_amount")).build()
    assert(v.source == source1)
    assert(v.features == Seq(
      Feature("fare_amount", ExpressionTransform("`fare_amount`"), keys = Some(Seq("id")))))

    assertThrows[IllegalArgumentException] {
      UnresolvedDerivedFeatureView(
        "bad_passthrough", "source_1", Seq[FeatureRef]("no_such_field")).build()
    }

    Registry.register(source2.copy(name = "keyless", keys = None))
    assertThrows[IllegalArgumentException] {
      UnresolvedDerivedFeatureView(
        "bad_join", "source_1", Seq[FeatureRef]("keyless.distance")).build()
    }
  }

  test("static map-lookup string gets a generated name and joins the entry") {
    Registry.clear()
    Registry.register(source2)
    val mapTable = DataFrameSource(
      "map_table",
      spark.range(1).select(
        col("id").cast("int").as("id"),
        map(lit("k"), lit(7L)).as("m"),
        lit(1000L).as("t_ms")),
      keys = Some(Seq("id")),
      timestampField = Some("t_ms"), timestampFormat = "epoch_millis")
    Registry.register(mapTable)
    val v = UnresolvedDerivedFeatureView(
      "map_lookup", source1, Seq[FeatureRef]("map_table.m['k']")).build()
    assert(v.features == Seq(
      Feature("_0", JoinTransform("map_table", "m['k']"), keys = Some(Seq("id")))))
  }

  test("joining a right table without a timestamp field is an error") {
    // Ref: test_join_transform.py:331-373 — no implicit latest-row join.
    Registry.clear()
    val spark2 = spark
    import spark2.implicits._
    val cl = new graft.client.GraftClient(spark)
    Registry.register(DataFrameSource(
      "no_ts_right", Seq(("Alex", 100.0)).toDF("name", "avg_cost"),
      keys = Some(Seq("name"))))
    val left = DataFrameSource(
      "ts_left", Seq(("Alex", 100L, 1000L)).toDF("name", "cost", "t_ms"),
      keys = Some(Seq("name")),
      timestampField = Some("t_ms"), timestampFormat = "epoch_millis")
    val e = intercept[IllegalArgumentException] {
      cl.getFeatures(UnresolvedDerivedFeatureView(
        "bad_join_no_ts", left, Seq[FeatureRef]("no_ts_right.avg_cost")).build())
    }
    Seq("join", "timestamp", "field").foreach(w =>
      assert(e.getMessage.toLowerCase.contains(w), s"message missing '$w': ${e.getMessage}"))
  }

  test("chained string-ref views: join key declared as feature golden") {
    // Ref: test_join_transform.py:487-560 — three chained views; the third
    // re-declares the join key as a passthrough feature and derives over
    // the joined value.
    Registry.clear()
    val spark2 = spark
    import spark2.implicits._
    val cl = new graft.client.GraftClient(spark)
    val df1 = Seq(
      ("Alex", 100L, 100L, "2022-01-01 08:01:00"),
      ("Emma", 400L, 250L, "2022-01-01 08:02:00"),
      ("Alex", 300L, 200L, "2022-01-02 08:03:00"),
      ("Emma", 200L, 250L, "2022-01-02 08:04:00"),
      ("Jack", 500L, 500L, "2022-01-03 08:05:00"),
      ("Alex", 600L, 800L, "2022-01-03 08:06:00")).toDF("name", "cost", "distance", "time")
    val source = DataFrameSource(
      "cj_src", df1, keys = Some(Seq("name")),
      timestampField = Some("time"), timestampFormat = "%Y-%m-%d %H:%M:%S")
    val view1 = UnresolvedDerivedFeatureView(
      "cj_view1", source,
      Seq[FeatureRef](Feature("cost", "cost"), Feature("distance", "distance")),
      keepSourceFields = true).build()
    Registry.register(DataFrameSource(
      "cj_src2",
      Seq(
        ("Alex", 100.0, "2022-01-01 09:01:00"),
        ("Emma", 400.0, "2022-01-01 09:02:00"),
        ("Alex", 200.0, "2022-01-02 07:03:00"),
        ("Emma", 300.0, "2022-01-02 09:04:00"),
        ("Jack", 500.0, "2022-01-03 09:05:00"),
        ("Alex", 450.0, "2022-01-03 09:06:00")).toDF("name", "avg_cost", "time"),
      keys = Some(Seq("name")),
      timestampField = Some("time"), timestampFormat = "%Y-%m-%d %H:%M:%S"))
    val view2 = UnresolvedDerivedFeatureView(
      "cj_view2", view1,
      Seq[FeatureRef](Feature("cost", "cost"), "distance", "cj_src2.avg_cost")).build()
    val view3 = UnresolvedDerivedFeatureView(
      "cj_view3", view2,
      Seq[FeatureRef]("name", Feature("derived_cost", "avg_cost * distance")),
      keepSourceFields = true).build()
    val got = cl.getFeatures(view3)
      .orderBy("time")
      .collect()
      .map(r => (r.getAs[String]("name"),
        Option(r.get(r.fieldIndex("avg_cost"))).map(_.asInstanceOf[Double]),
        Option(r.get(r.fieldIndex("derived_cost"))).map(_.asInstanceOf[Double]))).toSeq
    assert(got == Seq(
      ("Alex", None, None),
      ("Emma", None, None),
      ("Alex", Some(200.0), Some(40000.0)),
      ("Emma", Some(400.0), Some(100000.0)),
      ("Jack", None, None),
      ("Alex", Some(200.0), Some(160000.0))))
  }

  test("sliding view: join features rejected; string feature must be a grouping key") {
    // Refs: test_sliding_feature_view.py:90-105 (join rejected) and
    // :209-234 (string passthrough that is not a grouping key errors).
    Registry.clear()
    import scala.concurrent.duration._
    val slide = Feature("feature_2", SlidingWindowTransform(
      "fare_amount + 1", AggFunc.Sum, 30.seconds, 10.seconds, Seq("id")))

    assertThrows[IllegalArgumentException] {
      SlidingFeatureView(
        "sv_join", source1,
        Seq(Feature("feature_1", JoinTransform("t1", "f1")), slide))
    }

    val e = intercept[IllegalArgumentException] {
      UnresolvedSlidingFeatureView(
        "sv_badkey", source1, Seq[FeatureRef]("fare_amount", slide)).build()
    }
    assert(e.getMessage.contains("not used as grouping key"))

    // a string feature that IS the grouping key resolves fine
    val ok = UnresolvedSlidingFeatureView(
      "sv_ok", source1, Seq[FeatureRef]("id", slide)).build()
    assert(ok.features.head ==
      Feature("id", ExpressionTransform("`id`"), keys = Some(Seq("id"))))
    assert(Registry.get("sv_ok") == ok)

    // join-shaped string reference is invalid in a sliding view
    Registry.register(source2)
    assertThrows[IllegalArgumentException] {
      UnresolvedSlidingFeatureView(
        "sv_joinref", source1, Seq[FeatureRef]("source_2.distance", slide)).build()
    }
  }

  test("string references execute end-to-end") {
    Registry.clear()
    val spark2 = spark
    import spark2.implicits._
    val cl = new graft.client.GraftClient(spark)
    val rides = DataFrameSource(
      "rides", Seq((1, 10L, 100L), (2, 20L, 150L)).toDF("id", "fare", "t_ms"),
      keys = Some(Seq("id")),
      timestampField = Some("t_ms"), timestampFormat = "epoch_millis")
    val dims = DataFrameSource(
      "dims", Seq((1, 5L, 50L), (2, 8L, 50L)).toDF("id", "distance", "t_ms"),
      keys = Some(Seq("id")),
      timestampField = Some("t_ms"), timestampFormat = "epoch_millis")
    Registry.register(rides)
    Registry.register(dims)
    val v = UnresolvedDerivedFeatureView(
      "rides_enriched", "rides",
      Seq[FeatureRef](
        "fare",
        "dims.distance",
        Feature("fare_per_dist", "fare / distance")),
      keepSourceFields = true).build()
    val got = cl.getFeatures(v).orderBy("id")
      .select("id", "fare", "distance", "fare_per_dist")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((1, 10L, 5L, 2.0), (2, 20L, 8L, 2.5)))
  }
}
