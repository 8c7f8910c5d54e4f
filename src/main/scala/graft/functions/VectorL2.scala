package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native EXACT squared L2 distance over two `array<long>` columns (the
  * micro-quantized vector representation of [[graft.ops.Cluster]]), with
  * whole-stage codegen — the integer sibling of [[VectorDot]].
  *
  * The composable `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0L, _+_)`
  * evaluates interpreted lambdas per element (HOFs don't codegen), which
  * made the within-cluster medoid scan ~20 s at sf0.1; this compiles to a
  * primitive long loop.
  *
  * Exactness bound: the long accumulator holds Σ(x−y)² up to 2⁶³ — with
  * components bounded by ±8e6 (micro quantization at shift 4, |x| ≤ 4)
  * that is safe beyond 35k dimensions. NULL if either array is NULL,
  * lengths differ, or any element is NULL; accumulation is sequential
  * index order (bit-compatible with a SQL list fold).
  */
case class VectorL2Micro(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_l2_micro requires array<bigint> inputs, got $other")
    }
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  long $s = 0L;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    long $d = $a.getLong($i) - $b.getLong($i);
        |    $s += $d * $d;
        |  }
        |  if (!${ev.isNull}) ${ev.value} = $s;
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorL2Micro =
    copy(left = newLeft, right = newRight)
}

object VectorL2Micro {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(VectorL2Micro(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
