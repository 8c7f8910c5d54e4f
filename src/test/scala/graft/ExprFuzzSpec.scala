package graft

import graft.expr.{RowInterpreter, SparkCompiler}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import scala.util.Random

/** Differential fuzzing of the two DSL evaluators: the serving-path
  * [[RowInterpreter]] must agree with the Spark compiler (the engine's
  * oracle-checked source of truth) on randomized expressions over
  * randomized rows, including nulls, zeros, and negative values.
  */
class ExprFuzzSpec extends SparkSuite {

  private def genLong(rnd: Random, depth: Int): String =
    if (depth == 0) rnd.nextInt(4) match {
      case 0 => "a"
      case 1 => "c"
      case _ => rnd.nextInt(10).toString
    }
    else rnd.nextInt(6) match {
      case 0 => s"(${genLong(rnd, depth - 1)} + ${genLong(rnd, depth - 1)})"
      case 1 => s"(${genLong(rnd, depth - 1)} - ${genLong(rnd, depth - 1)})"
      case 2 => s"(${genLong(rnd, depth - 1)} * ${genLong(rnd, depth - 1)})"
      case 3 => s"(-${genLong(rnd, depth - 1)})"
      case 4 => s"CASE WHEN ${genBool(rnd, depth - 1)} THEN ${genLong(rnd, depth - 1)} " +
        s"ELSE ${genLong(rnd, depth - 1)} END"
      case 5 => genLong(rnd, 0)
    }

  private def genDbl(rnd: Random, depth: Int): String =
    if (depth == 0) rnd.nextInt(4) match {
      case 0 => "b"
      case 1 => "d"
      case _ => s"${rnd.nextInt(5)}.${rnd.nextInt(10)}"
    }
    else rnd.nextInt(6) match {
      case 0 => s"(${genDbl(rnd, depth - 1)} + ${genDbl(rnd, depth - 1)})"
      case 1 => s"(${genDbl(rnd, depth - 1)} - ${genDbl(rnd, depth - 1)})"
      case 2 => s"(${genDbl(rnd, depth - 1)} * ${genDbl(rnd, depth - 1)})"
      case 3 => s"(${genDbl(rnd, depth - 1)} / ${genDbl(rnd, depth - 1)})"
      case 4 => s"CASE WHEN ${genBool(rnd, depth - 1)} THEN ${genDbl(rnd, depth - 1)} " +
        s"ELSE ${genDbl(rnd, depth - 1)} END"
      case 5 => s"CAST(${genLong(rnd, depth - 1)} AS DOUBLE)"
    }

  private def genStr(rnd: Random, depth: Int): String =
    if (depth == 0) rnd.nextInt(3) match {
      case 0 => "s"
      case 1 => "'Xy'"
      case 2 => "''"
    }
    else rnd.nextInt(4) match {
      case 0 => s"LOWER(${genStr(rnd, depth - 1)})"
      case 1 => s"UPPER(${genStr(rnd, depth - 1)})"
      case 2 => s"CONCAT(${genStr(rnd, depth - 1)}, ${genStr(rnd, depth - 1)})"
      case 3 => s"CASE WHEN ${genBool(rnd, depth - 1)} THEN ${genStr(rnd, depth - 1)} " +
        s"ELSE ${genStr(rnd, depth - 1)} END"
    }

  private def genBool(rnd: Random, depth: Int): String =
    if (depth == 0) {
      val cmp = Seq("<", "<=", ">", ">=", "=", "<>")(rnd.nextInt(6))
      rnd.nextInt(3) match {
        case 0 => s"(a $cmp c)"
        case 1 => s"(b $cmp d)"
        case 2 => s"(s = 'Ab')"
      }
    }
    else rnd.nextInt(5) match {
      case 0 => s"(${genBool(rnd, depth - 1)} AND ${genBool(rnd, depth - 1)})"
      case 1 => s"(${genBool(rnd, depth - 1)} OR ${genBool(rnd, depth - 1)})"
      case 2 => s"(NOT ${genBool(rnd, depth - 1)})"
      case 3 => s"(${genLong(rnd, depth - 1)} IS NULL)"
      case 4 => s"(${genDbl(rnd, depth - 1)} IS NOT NULL)"
    }

  test("row interpreter matches the Spark compiler on randomized expressions") {
    val rnd = new Random(7)
    val exprs = (
      (1 to 40).map(_ => genLong(rnd, 3)) ++
        (1 to 40).map(_ => genDbl(rnd, 3)) ++
        (1 to 20).map(_ => genStr(rnd, 3)) ++
        (1 to 30).map(_ => genBool(rnd, 2))).distinct
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("c", LongType),
      StructField("b", DoubleType), StructField("d", DoubleType),
      StructField("s", StringType)))
    val rows: Seq[Map[String, Any]] = Seq(
      Map("a" -> 7L, "c" -> -3L, "b" -> 1.5, "d" -> 2.25, "s" -> "Ab"),
      Map("a" -> 0L, "c" -> 123456789L, "b" -> 0.0, "d" -> -1.5, "s" -> ""),
      Map("a" -> null, "c" -> 2L, "b" -> null, "d" -> 0.0, "s" -> null),
      Map("a" -> -1L, "c" -> null, "b" -> -2.5, "d" -> null, "s" -> "zz"))
    rows.foreach { m =>
      val df = spark.createDataFrame(
        java.util.List.of(Row(m("a"), m("c"), m("b"), m("d"), m("s"))), schema)
      val sparkRow = df
        .select(exprs.zipWithIndex.map { case (e, i) =>
          SparkCompiler.compile(e).as(s"e_$i") }: _*)
        .collect().head
      exprs.zipWithIndex.foreach { case (e, i) =>
        val viaSpark = if (sparkRow.isNullAt(i)) null else sparkRow.get(i)
        val viaInterp = RowInterpreter.eval(e, m.filter(_._2 != null))
        assert(viaInterp == viaSpark,
          s"expr `$e` on $m: interpreter=$viaInterp spark=$viaSpark")
      }
    }
  }
}
