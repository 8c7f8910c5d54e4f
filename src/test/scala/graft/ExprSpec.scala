package graft

import graft.expr._
import graft.types._
import org.scalatest.funsuite.AnyFunSuite

class ExprSpec extends AnyFunSuite {

  test("parser precedence and shapes") {
    assert(Parser.parse("a + b * 2") ==
      BinaryOp("+", Ident("a"), BinaryOp("*", Ident("b"), IntLit(2))))
    assert(Parser.parse("a > 1 AND b < 2 OR c = 3") ==
      LogicalOp("OR",
        LogicalOp("AND",
          CompareOp(">", Ident("a"), IntLit(1)),
          CompareOp("<", Ident("b"), IntLit(2))),
        CompareOp("=", Ident("c"), IntLit(3))))
    assert(Parser.parse("x IS NOT NULL") == IsNullOp(Ident("x"), negated = true))
    assert(Parser.parse("`case`") == Ident("case"))
    assert(Parser.parse("CAST(x AS DOUBLE)") ==
      CastOp(Ident("x"), DFloat64, exceptionOnFailure = true))
    assert(Parser.parse("TRY_CAST(x AS INTEGER)") ==
      CastOp(Ident("x"), DInt32, exceptionOnFailure = false))
    assert(Parser.parse("m['k']") == BracketOp(Ident("m"), StringLit("k")))
    assert(Parser.parse("CASE WHEN a THEN 1 ELSE 2 END") ==
      CaseOp(Seq((Ident("a"), IntLit(1))), Some(IntLit(2))))
    assert(Parser.parse("lower(name)") == FuncCall("LOWER", Seq(Ident("name"))))
    assert(Parser.parse("-2.5e3") == UminusOp(FloatLit(2500.0)))
  }

  test("strftime conversion matches the reference mapping") {
    assert(TimeFormats.toJavaDateFormat("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss")
    assert(TimeFormats.toJavaDateFormat("%Y-%m-%d %H:%M:%S.%f") == "yyyy-MM-dd HH:mm:ss.SSS")
  }

  test("row interpreter evaluates serving-path expressions") {
    val row = Map[String, Any]("a" -> 10L, "b" -> 4L, "s" -> "Hi", "n" -> null)
    assert(RowInterpreter.eval("a + b * 2", row) == 18L)
    assert(RowInterpreter.eval("a / b", row) == 2.5)
    assert(RowInterpreter.eval("n + 1", row) == null)
    assert(RowInterpreter.eval("LOWER(s)", row) == "hi")
    assert(RowInterpreter.eval("CASE WHEN a > 5 THEN 'big' ELSE 'small' END", row) == "big")
    assert(RowInterpreter.eval("n IS NULL", row) == true)
    assert(RowInterpreter.eval("CAST(a AS STRING)", row) == "10")
    assert(RowInterpreter.eval("TRY_CAST(s AS INTEGER)", row) == null)
    assert(RowInterpreter.eval("MAP('x', 1, 'y', 2)['y']", row) == 2L)
  }

  test("type inference") {
    val lookup: String => Option[DType] =
      Map("i" -> DInt32, "l" -> DInt64, "d" -> DFloat64, "s" -> DString).get
    assert(SparkCompiler.inferType(Parser.parse("i + l"), lookup) == DInt64)
    assert(SparkCompiler.inferType(Parser.parse("i / l"), lookup) == DFloat64)
    assert(SparkCompiler.inferType(Parser.parse("CONCAT(s, s)"), lookup) == DString)
    assert(SparkCompiler.inferType(Parser.parse("i > l"), lookup) == DBool)
  }
}
