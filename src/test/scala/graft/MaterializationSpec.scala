package graft

import graft.client.GraftClient
import graft.table._

import java.nio.file.{Files, Paths}

/** MaterializationGroup semantics vs the reference
  * (materialization_group.py:29-95, spark_processor.py:119-155,
  * source_sink_utils.py:96-103).
  */
class MaterializationSpec extends SparkSuite {

  private lazy val client = new GraftClient(spark)

  private def src(name: String): FileSource = {
    val path = writeTempParquet(purchases, s"mat_$name")
    FileSource(
      name, path, "parquet",
      keys = Some(Seq("name")),
      timestampField = Some("time"),
      timestampFormat = "%Y-%m-%d %H:%M:%S")
  }

  test("group executes several materializations concurrently; outputs land") {
    val outA = s"${SparkSuite.tmpDir}/mat_out_a"
    val outB = s"${SparkSuite.tmpDir}/mat_out_b"
    val source = src("mat_src1")
    val viewA = DerivedFeatureView(
      "mat_view_a", source,
      features = Seq(Feature.expr("total", "cost + distance")),
      keepSourceFields = true)
    val viewB = DerivedFeatureView(
      "mat_view_b", source,
      features = Seq(Feature.expr("ratio", "cost / distance")),
      keepSourceFields = true)

    client.createMaterializationGroup()
      .materializeFeatures(viewA, FileSink(outA), allowOverwrite = true)
      .materializeFeatures(viewB, FileSink(outB), allowOverwrite = true)
      .execute()
      .waitUntilFinish()

    assert(spark.read.parquet(outA).count() == 6)
    assert(spark.read.parquet(outB).count() == 6)
    assert(spark.read.parquet(outA).columns.contains("total"))
    assert(spark.read.parquet(outB).columns.contains("ratio"))
  }

  test("allow_overwrite=false errors on existing output; true overwrites") {
    val out = s"${SparkSuite.tmpDir}/mat_out_collide"
    val view = DerivedFeatureView(
      "mat_view_c", src("mat_src2"),
      features = Seq(Feature.expr("total", "cost + distance")),
      keepSourceFields = true)

    client.createMaterializationGroup()
      .materializeFeatures(view, FileSink(out), allowOverwrite = true)
      .execute().waitUntilFinish()
    assert(Files.exists(Paths.get(out)))

    // collide: reference maps allow_overwrite=false to Spark's error mode
    val ex = intercept[Exception] {
      client.createMaterializationGroup()
        .materializeFeatures(view, FileSink(out), allowOverwrite = false)
        .execute().waitUntilFinish()
    }
    assert(ex.getMessage.toLowerCase.contains("already exists"))

    // and true overwrites cleanly
    client.createMaterializationGroup()
      .materializeFeatures(view, FileSink(out), allowOverwrite = true)
      .execute().waitUntilFinish()
    assert(spark.read.parquet(out).count() == 6)
  }

  test("ttl is rejected synchronously, before any job starts") {
    val view = DerivedFeatureView(
      "mat_view_d", src("mat_src3"),
      features = Seq(Feature.expr("total", "cost + distance")),
      keepSourceFields = true)
    val out = s"${SparkSuite.tmpDir}/mat_out_ttl"
    val g = client.createMaterializationGroup()
      .materializeFeatures(view, FileSink(out), ttlMillis = Some(3600000L))
    val ex = intercept[IllegalArgumentException](g.execute())
    assert(ex.getMessage.contains("ttl"))
    assert(!Files.exists(Paths.get(out)))
  }

  test("empty group rejected; queue clears after execute") {
    val ex = intercept[IllegalArgumentException](
      client.createMaterializationGroup().execute())
    assert(ex.getMessage.contains("at least one materialization"))

    val g = client.createMaterializationGroup()
    g.materializeFeatures(
      DerivedFeatureView(
        "mat_view_e", src("mat_src4"),
        features = Seq(Feature.expr("total", "cost + distance")),
        keepSourceFields = true),
      FileSink(s"${SparkSuite.tmpDir}/mat_out_e"), allowOverwrite = true)
    g.execute().waitUntilFinish()
    // reference clears the descriptor list after execute
    intercept[IllegalArgumentException](g.execute())
  }

  test("direct materialize without a policy keeps the sink's declared mode") {
    val out = s"${SparkSuite.tmpDir}/mat_out_direct"
    val view = DerivedFeatureView(
      "mat_view_f", src("mat_src5"),
      features = Seq(Feature.expr("total", "cost + distance")),
      keepSourceFields = true)
    client.materialize(view, FileSink(out, mode = "overwrite"))
    client.materialize(view, FileSink(out, mode = "overwrite")) // no error
    assert(spark.read.parquet(out).count() == 6)
  }
}
