package graft

import graft.functions.VectorDot
import graft.plans.{GraftExtensions, RewriteHofDotProduct}
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions surface: the `vector_dot` SQL function and
  * the HOF-dot-product optimizer rewrite, attached via
  * `GraftExtensions.register` (same objects the
  * `spark.sql.extensions=graft.plans.GraftExtensions` cluster path
  * injects).
  */
class ExtensionsSpec extends SparkSuite {

  private def hasVectorDot(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[VectorDot]))

  private def hasVectorL2(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[graft.functions.VectorL2Micro]))

  test("vector_dot SQL function evaluates the native expression") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT vector_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .collect().head.getDouble(0)
    assert(r == 32.0)
    // NULL contract: length mismatch and null element both yield NULL
    val n = spark.sql(
      """SELECT vector_dot(array(1.0D), array(1.0D, 2.0D)) AS a,
               vector_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS b""")
      .collect().head
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("vector_l2_micro SQL function: exact long L2, HOF parity, NULLs") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT vector_l2_micro(array(1L, 5L, -3L), array(4L, 1L, 2L)) AS d")
      .collect().head.getLong(0)
    assert(r == 9L + 16L + 25L)
    // parity with the interpreted HOF formulation it replaces
    val hof = spark.sql(
      """SELECT aggregate(zip_with(array(1L, 5L, -3L), array(4L, 1L, 2L),
           (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v) AS d""")
      .collect().head.getLong(0)
    assert(hof == r)
    val n = spark.sql(
      """SELECT vector_l2_micro(array(1L), array(1L, 2L)) AS a,
               vector_l2_micro(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L)) AS b""")
      .collect().head
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("optimizer rewrites the double HOF dot product and keeps results identical") {
    GraftExtensions.register(spark)
    // spark.range (not a LocalRelation) so ConvertToLocalRelation can't
    // constant-fold the projection away before we can inspect it
    val d = spark.range(2).selectExpr(
      "id",
      "CASE WHEN id = 0 THEN array(1.0D, 2.0D, 3.0D) ELSE array(0.0D, 0.0D) END AS a",
      "CASE WHEN id = 0 THEN array(0.5D, -1.0D, 2.0D) ELSE array(1.0D, 1.0D) END AS b")
    val hof = "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    val q = d.selectExpr("id", s"$hof AS dot")
    assert(hasVectorDot(q), q.queryExecution.optimizedPlan.toString)
    val got = q.orderBy("id").collect().map(_.getDouble(1)).toSeq
    assert(got == Seq(1.0 * 0.5 + 2.0 * -1.0 + 3.0 * 2.0, 0.0))
  }

  test("optimizer rewrites the long HOF squared-L2 fold; int arrays do not") {
    GraftExtensions.register(spark)
    val d = spark.range(2).selectExpr(
      "id",
      "CASE WHEN id = 0 THEN array(1L, 5L, -3L) ELSE array(2L, 2L) END AS a",
      "CASE WHEN id = 0 THEN array(4L, 1L, 2L) ELSE array(2L, 0L) END AS b")
    val hof = "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, " +
      "(acc, v) -> acc + v)"
    val q = d.selectExpr("id", s"$hof AS d2")
    assert(hasVectorL2(q), q.queryExecution.optimizedPlan.toString)
    val got = q.orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(9L + 16L + 25L, 4L))
    // int arrays widen per element — NOT the long-exact pattern; no rewrite
    val ints = spark.range(1).selectExpr(
      "array(1, 2) AS a", "array(3, 4) AS b")
    val qi = ints.selectExpr(s"$hof AS d2")
    assert(!hasVectorL2(qi), qi.queryExecution.optimizedPlan.toString)
    // a different lambda (x*y) must not match either
    val qo = d.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS o")
    assert(!hasVectorL2(qo), qo.queryExecution.optimizedPlan.toString)
  }

  test("float arrays rewrite only under explicit double casts (bit safety)") {
    GraftExtensions.register(spark)
    val d = spark.range(1).selectExpr(
      "array(CAST(1.5 AS FLOAT), CAST(2.5 AS FLOAT)) AS a",
      "array(CAST(2.0 AS FLOAT), CAST(4.0 AS FLOAT)) AS b")
    // float×float product then widen: NOT bit-identical to a double loop → no rewrite
    val bare = d.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x) AS dot")
    assert(!hasVectorDot(bare), bare.queryExecution.optimizedPlan.toString)
    // explicit per-element double casts: product in double → rewrite fires
    val casted = d.selectExpr(
      """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
         CAST(0 AS DOUBLE), (acc, x) -> acc + x) AS dot""")
    assert(hasVectorDot(casted), casted.queryExecution.optimizedPlan.toString)
    assert(casted.collect().head.getDouble(0) == 1.5 * 2.0 + 2.5 * 4.0)
  }

  test("register is idempotent; rule object injects once") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark)
    assert(spark.experimental.extraOptimizations.count(_ == RewriteHofDotProduct) == 1)
  }
}
