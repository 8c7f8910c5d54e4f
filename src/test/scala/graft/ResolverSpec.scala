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
