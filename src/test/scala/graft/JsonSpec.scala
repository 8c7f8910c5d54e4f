package graft

import graft.table._
import graft.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.concurrent.duration._

/** Descriptor JSON round-trip — the registry serialization contract the
  * reference enforces on every test (RegistryWithJsonCheck,
  * ref: python/feathub/tests/feathub_it_test_base.py:55-95).
  */
class JsonSpec extends AnyFunSuite {

  private def roundTrip(d: TableDescriptor): Unit =
    assert(Json.fromJson(Json.toJson(d)) == d)

  private val fileSrc = FileSource(
    "src", "/data/t.parquet", "parquet",
    schema = Some(Schema(Seq("k", "v", "m"), Seq(DInt64, DFloat64, DMap(DString, DInt32)))),
    keys = Some(Seq("k")),
    timestampField = Some("ts"),
    timestampFormat = "epoch_millis",
    maxOutOfOrderness = 5.seconds)

  test("sources round-trip") {
    roundTrip(fileSrc)
    roundTrip(FileSource("s2", "/d", "csv", isBounded = false,
      schema = Some(Schema(Seq("a"), Seq(DString)))))
    roundTrip(DataGenSource(
      "gen", 1000,
      Seq(
        SequenceField("id", DInt64, 1, 1000),
        RandomField("x", DFloat64, 0.5, 2.5, 8),
        RandomField("ev", DTimestamp, maxPast = 2.hours)),
      seed = 7, keys = Some(Seq("id")), timestampField = Some("id"),
      timestampFormat = "epoch",
      rowsPerSecond = 2500L, unbounded = true))
    roundTrip(KafkaSource(
      "k", "broker:9092", "topic",
      Schema(Seq("a", "b"), Seq(DString, DVector(DFloat32))),
      keys = Some(Seq("a")), timestampField = Some("b"),
      startupMode = "timestamp", startupTimestampMillis = Some(123L),
      maxOutOfOrderness = 1.minute, isBounded = true,
      valueFormat = "protobuf",
      valueFormatProps = Map(
        "protobuf.field_numbers" -> "a:2,b:5",
        "ignore_parse_error" -> "false"),
      keyFormat = Some("csv"),
      keyFormatProps = Map("ignore_parse_error" -> "true"),
      consumerGroup = Some("graft-cg"),
      consumerProps = Map("session.timeout.ms" -> "30000"),
      // accepted-and-ignored parity field (kafka_source.py:44): Spark
      // discovers partitions per micro-batch, no interval to configure
      partitionDiscoveryIntervalMs = Some(300000L)))
    roundTrip(JdbcSource("j", "jdbc:mysql://h/db", "tbl", "u", "p",
      keys = Some(Seq("id"))))
  }

  test("views round-trip") {
    val derived = DerivedFeatureView(
      "v", fileSrc,
      features = Seq(
        Feature.expr("e", "v * 2", Some(DFloat64)),
        Feature("j", JoinTransform("dim", "price"), keys = Some(Seq("k"))),
        Feature("w", OverWindowTransform(
          "v", AggFunc.Avg, Some(1.hour), Seq("k"), Some("v > 0"), Some(10)))),
      keepSourceFields = true,
      filterExpr = Some("v IS NOT NULL"))
    roundTrip(derived)
    roundTrip(SlidingFeatureView(
      "sv", fileSrc,
      features = Seq(
        Feature("s", SlidingWindowTransform(
          "v", AggFunc.Sum, 7.days, 1.day, Seq("k"), None, Some(5))),
        Feature.expr("t", "GET_WINDOW_TIME()")),
      enableEmptyWindowOutput = false,
      skipSameWindowOutput = false))
    roundTrip(SqlFeatureView(
      "q", "SELECT k, sum(v) AS s FROM src GROUP BY k",
      dependencies = Seq(fileSrc), keys = Some(Seq("k"))))
    roundTrip(OnDemandFeatureView(
      "od",
      features = Seq(
        Feature("r", JoinTransform("dim", "rate"), keys = Some(Seq("uid"))),
        Feature.expr("x", "r * amount")),
      requestFields = Seq("uid", "amount"),
      keepSourceFields = false))
  }

  test("boundedView converts an unbounded descriptor tree recursively") {
    val ufs = fileSrc.copy(isBounded = false)
    val inner = DerivedFeatureView(
      "bv_inner", ufs,
      features = Seq(Feature.expr("e", "v * 2", Some(DFloat64))),
      keepSourceFields = true)
    val outer = SlidingFeatureView(
      "bv_outer", inner,
      features = Seq(
        Feature("s", SlidingWindowTransform(
          "e", AggFunc.Sum, 7.days, 1.day, Seq("k"))),
        Feature.expr("t", "GET_WINDOW_TIME()")))
    assert(!outer.isBoundedView)
    val b = outer.boundedView
    assert(b.isBoundedView)
    // every level was copied; the leaf flipped to bounded
    val leaf = b.asInstanceOf[SlidingFeatureView]
      .source.asInstanceOf[DerivedFeatureView]
      .source.asInstanceOf[FileSource]
    assert(leaf.isBounded && leaf == fileSrc)
    // the bounded twin is a plain descriptor: JSON round-trips
    roundTrip(b)
    // an already-bounded tree returns itself, no copies
    assert(b.boundedView eq b)
    // reference parity: unbounded SqlFeatureView refuses (may not be
    // batch-safe), as does a streaming DataFrameSource wrapper
    intercept[IllegalArgumentException] {
      SqlFeatureView("bv_sql", "SELECT 1", dependencies = Seq(ufs)).boundedView
    }
    // unbounded KafkaSource and rate-mode DataGenSource flip to bounded
    assert(KafkaSource(
      "bv_k", "b:9092", "t", Schema(Seq("a"), Seq(DString)))
      .boundedView.asInstanceOf[KafkaSource].isBounded)
    assert(!DataGenSource("bv_g", 10, Seq(SequenceField("id", DInt64, 1, 10)),
      unbounded = true).boundedView.asInstanceOf[DataGenSource].unbounded)
  }

  test("feature-attached metrics round-trip") {
    roundTrip(DerivedFeatureView(
      "vm", fileSrc,
      features = Seq(
        Feature.expr("v", "v").copy(metrics = Seq(
          Metric.Count(Some("IS NULL"), 1.day),
          Metric.Ratio("> 0", 1.day),
          Metric.Average(None),
          Metric.CountMap(Some("IS NOT NULL"), 12.hours)))),
      keepSourceFields = true))
  }

  test("live-object descriptors refuse serialization") {
    val udfView = DerivedFeatureView(
      "u", fileSrc,
      features = Seq(Feature("f", UdfTransform((r: org.apache.spark.sql.Row) => 1, DInt32))))
    assertThrows[IllegalArgumentException](Json.toJson(udfView))
  }
}
