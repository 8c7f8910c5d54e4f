package graft.plans

import graft.functions.VectorDot
import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Catalyst optimizer rule: rewrite the composable-but-interpreted
  * higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE),
  *     (acc, x) -> acc + x) }}}
  *
  * into the whole-stage-codegen [[graft.functions.VectorDot]] — so SQL
  * written against the plain HOF surface (e.g. through SqlFeatureView)
  * gets the native ~50× path automatically, plan-wide.
  *
  * The rewrite fires ONLY when it is bit-identical:
  *   - both inputs are float/double arrays AND every multiply operand is
  *     double-valued (a double element, or an explicit element cast to
  *     double) — so the per-element product is computed in double
  *     exactly as VectorDot does. A float×float product (float
  *     precision, then widened at the add) is NOT rewritten: its result
  *     differs in low bits from the double-product loop.
  *   - the zero is literal double 0.0, the merge is `acc + x` over the
  *     zip output (no cast — the product is already double), and the
  *     finish lambda is the identity the analyzer fills in.
  *
  * NULL semantics already agree: zip_with pads length mismatches with
  * NULL, NULL elements poison the product, and a NULL sum is exactly
  * VectorDot's NULL-on-mismatch/NULL-element contract.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def fpArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** Operand is the given lambda variable as a DOUBLE: either directly
    * (element type already double) or under an explicit cast to double.
    */
  private def doubleRef(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId && nv.dataType == DoubleType
    case c: Cast if c.dataType == DoubleType =>
      c.child match {
        case nv: NamedLambdaVariable => nv.exprId == v.exprId
        case _ => false
      }
    case _ => false
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          zw @ ZipWith(l, r,
            LambdaFunction(Multiply(mx, my, _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(aRef, eRef, _),
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
        if zero == 0.0d && fpArray(l.dataType) && fpArray(r.dataType) &&
          doubleRef(mx, x) && doubleRef(my, y) &&
          isVar(aRef, acc) && isVar(eRef, el) && isVar(fin, fv) =>
      VectorDot(l, r)
  }
}

/** Catalyst optimizer rule: rewrite the interpreted HOF squared-L2 fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L,
  *     (acc, v) -> acc + v) }}}
  *
  * over two `array<bigint>` columns into the codegen
  * [[graft.functions.VectorL2Micro]] — the micro-quantized distance SQL
  * written against the plain HOF surface gets the native path plan-wide
  * (measured ~7× on the medoid scan). Bit-identical by construction:
  * long elements need no cast, per-element `(x−y)·(x−y)` is the same
  * wrapping long arithmetic the expression runs, the zero is literal 0L,
  * the merge is the bare `acc + v`, and NULL semantics already agree
  * (zip_with pads a length mismatch with NULL, which poisons the sum —
  * exactly the expression's NULL-on-mismatch/NULL-element contract).
  */
object RewriteHofL2Micro extends Rule[LogicalPlan] {

  import org.apache.spark.sql.types.LongType

  private def longArray(t: DataType): Boolean = t match {
    case org.apache.spark.sql.types.ArrayType(LongType, _) => true
    case _ => false
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(
              Multiply(Subtract(a1, b1, _), Subtract(a2, b2, _), _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(zero, LongType),
          LambdaFunction(Add(aRef, eRef, _),
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
        if zero == 0L && longArray(l.dataType) && longArray(r.dataType) &&
          isVar(a1, x) && isVar(b1, y) && isVar(a2, x) && isVar(b2, y) &&
          isVar(aRef, acc) && isVar(eRef, el) && isVar(fin, fv) =>
      graft.functions.VectorL2Micro(l, r)
  }
}

/** Session-extension entry point for cluster deployment:
  *
  * {{{ spark.sql.extensions=graft.plans.GraftExtensions }}}
  *
  * registers the `vector_dot` SQL function and the
  * [[RewriteHofDotProduct]] optimizer rule on every session the cluster
  * builds — no code changes in user jobs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vectorDotFunction)
    ext.injectFunction(GraftExtensions.vectorL2Function)
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
    ext.injectOptimizerRule(_ => RewriteHofL2Micro)
  }
}

object GraftExtensions {

  private def buildVectorDot(args: Seq[Expression]): Expression = {
    if (args.length != 2)
      throw new IllegalArgumentException(
        s"vector_dot expects 2 arguments, got ${args.length}")
    VectorDot(args.head, args(1))
  }

  private def buildVectorL2(args: Seq[Expression]): Expression = {
    if (args.length != 2)
      throw new IllegalArgumentException(
        s"vector_l2_micro expects 2 arguments, got ${args.length}")
    graft.functions.VectorL2Micro(args.head, args(1))
  }

  val vectorDotFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      buildVectorDot _)

  val vectorL2Function
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier("vector_l2_micro"),
      new ExpressionInfo(classOf[graft.functions.VectorL2Micro].getName,
        "vector_l2_micro"),
      buildVectorL2 _)

  /** Attach the same function + rule to an ALREADY-BUILT session (tests,
    * notebooks, `GraftClient` sessions the caller didn't configure):
    * the rule goes through the public `spark.experimental
    * .extraOptimizations` hook, the function through the session's
    * registry. Idempotent.
    */
  def register(spark: SparkSession): Unit = {
    GraftBridge.registerTempFunction(spark, "vector_dot", buildVectorDot)
    GraftBridge.registerTempFunction(spark, "vector_l2_micro", buildVectorL2)
    if (!spark.experimental.extraOptimizations.contains(RewriteHofDotProduct))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofDotProduct
    if (!spark.experimental.extraOptimizations.contains(RewriteHofL2Micro))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteHofL2Micro
  }
}
