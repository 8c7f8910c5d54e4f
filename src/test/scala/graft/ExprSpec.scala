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

  test("lexer edge cases: backticks, case-insensitivity, quote styles") {
    assert(Parser.parse("`weird col name`") == Ident("weird col name"))
    assert(Parser.parse("case WHEN tRuE then 1 End") ==
      CaseOp(Seq((BoolLit(true), IntLit(1))), None))
    assert(Parser.parse("\"double\" = 'single'") ==
      CompareOp("=", StringLit("double"), StringLit("single")))
    assert(Parser.parse("a AND NOT b") ==
      LogicalOp("AND", Ident("a"), NotOp(Ident("b"))))
    assert(Parser.parse("m['a'][2]") ==
      BracketOp(BracketOp(Ident("m"), StringLit("a")), IntLit(2)))
    assert(Parser.parse("round(x, 2)") == FuncCall("ROUND", Seq(Ident("x"), IntLit(2))))
    // integer and exponent literal forms
    assert(Parser.parse("1e3") == FloatLit(1000.0))
    assert(Parser.parse(".5") == FloatLit(0.5))
    assertThrows[IllegalArgumentException](Parser.parse("a +"))
    assertThrows[IllegalArgumentException](Parser.parse("`unterminated"))
    // ref: dsl/tests/test_expr_lexer_rules.py — illegal characters raise;
    // a backticked reserved word is a plain identifier
    assertThrows[IllegalArgumentException](Parser.parse("!@#"))
    assert(Parser.parse("CAST(`integer` AS integer)") ==
      CastOp(Ident("integer"), graft.types.DInt32, exceptionOnFailure = true))
    assert(Parser.parse("-0.1") == UminusOp(FloatLit(0.1)))
  }

  test("row interpreter: long arithmetic stays exact past 2^53") {
    val big = 9007199254740993L // 2^53 + 1 — not representable as Double
    val row = Map[String, Any]("x" -> big)
    assert(RowInterpreter.eval("x + 0", row) == big)
    assert(RowInterpreter.eval("x * 1", row) == big)
    assert(RowInterpreter.eval("x - 1", row) == big - 1)
  }

  test("row interpreter UNIX_TIMESTAMP handles zoned formats") {
    // Ref: test_expression_transform.py:122-171 — %z parses explicit
    // offsets onto the instant axis.
    val row = Map[String, Any](
      "t8" -> "2022-01-01 08:00:00.001 +0800",
      "t0" -> "2022-01-01 00:00:00.001 +0000")
    val a = RowInterpreter.eval("UNIX_TIMESTAMP(t8, '%Y-%m-%d %H:%M:%S.%f %z')", row)
    val b = RowInterpreter.eval("UNIX_TIMESTAMP(t0, '%Y-%m-%d %H:%M:%S.%f %z')", row)
    assert(a == b) // same instant
    assert(a == 1640995200L)
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
