package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for graft's native Catalyst expressions.
  * Spark 4's `classic.ExpressionUtils` is private[sql]; extension libraries
  * conventionally expose it through a same-package shim.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a temp SQL function on an already-built session —
    * `sessionState` is private[sql], so the extension library reaches it
    * through this shim (the `spark.sql.extensions` path doesn't need it).
    */
  def registerTempFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
