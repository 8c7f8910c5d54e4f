package graft.expr

import graft.types.DType
import Lexer._

/** Recursive-descent parser for the expression DSL.
  * Precedence per the reference grammar (ref: python/feathub/dsl/
  * expr_parser.py:41-211): OR < AND < NOT < comparison/IS < `+ -` < `* /`
  * < unary minus < postfix `[subscript]`.
  */
object Parser {

  def parse(input: String): ExprNode = new Parser(Lexer.tokenize(input), input).parseFull()

  private final class Parser(tokens: Vector[Token], input: String) {
    private var pos = 0
    private def peek: Token = tokens(pos)
    private def advance(): Token = { val t = tokens(pos); pos += 1; t }
    private def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"Parse error in <$input> at token $pos (${peek}): $msg")

    private def expectOp(op: String): Unit = advance() match {
      case TOp(`op`) => ()
      case other     => err(s"expected '$op', got $other")
    }
    private def expectKw(kw: String): Unit = advance() match {
      case TKeyword(`kw`) => ()
      case other          => err(s"expected $kw, got $other")
    }
    private def atKw(kw: String): Boolean = peek match {
      case TKeyword(`kw`) => true
      case _              => false
    }
    private def atOp(op: String): Boolean = peek match {
      case TOp(`op`) => true
      case _         => false
    }

    def parseFull(): ExprNode = {
      val e = parseOr()
      peek match {
        case TEof => e
        case t    => err(s"trailing token $t")
      }
    }

    private def parseOr(): ExprNode = {
      var left = parseAnd()
      while (atKw("OR")) { advance(); left = LogicalOp("OR", left, parseAnd()) }
      left
    }

    private def parseAnd(): ExprNode = {
      var left = parseNot()
      while (atKw("AND")) { advance(); left = LogicalOp("AND", left, parseNot()) }
      left
    }

    private def parseNot(): ExprNode =
      if (atKw("NOT")) { advance(); NotOp(parseNot()) } else parseComparison()

    private def parseComparison(): ExprNode = {
      var left = parseAdditive()
      var done = false
      while (!done) {
        peek match {
          case TOp(op @ ("<" | "<=" | ">" | ">=" | "=" | "<>")) =>
            advance(); left = CompareOp(op, left, parseAdditive())
          case TKeyword("IS") =>
            advance()
            val negated = if (atKw("NOT")) { advance(); true } else false
            expectKw("NULL")
            left = IsNullOp(left, negated)
          case _ => done = true
        }
      }
      left
    }

    private def parseAdditive(): ExprNode = {
      var left = parseMultiplicative()
      var done = false
      while (!done) {
        if (atOp("+")) { advance(); left = BinaryOp("+", left, parseMultiplicative()) }
        else if (atOp("-")) { advance(); left = BinaryOp("-", left, parseMultiplicative()) }
        else done = true
      }
      left
    }

    private def parseMultiplicative(): ExprNode = {
      var left = parseUnary()
      var done = false
      while (!done) {
        if (atOp("*")) { advance(); left = BinaryOp("*", left, parseUnary()) }
        else if (atOp("/")) { advance(); left = BinaryOp("/", left, parseUnary()) }
        else done = true
      }
      left
    }

    private def parseUnary(): ExprNode =
      if (atOp("-")) { advance(); UminusOp(parseUnary()) } else parsePostfix()

    private def parsePostfix(): ExprNode = {
      var e = parsePrimary()
      while (atOp("[")) {
        advance()
        val key = parseOr()
        expectOp("]")
        e = BracketOp(e, key)
      }
      e
    }

    private def parseTypeName(): DType = advance() match {
      case TKeyword(kw) =>
        DType.fromCastName(kw).getOrElse(err(s"not a type name: $kw"))
      case other => err(s"expected type name, got $other")
    }

    private def parsePrimary(): ExprNode = peek match {
      case TInt(v)    => advance(); IntLit(v)
      case TFloat(v)  => advance(); FloatLit(v)
      case TString(v) => advance(); StringLit(v)
      case TKeyword("NULL")  => advance(); NullLit
      case TKeyword("TRUE")  => advance(); BoolLit(true)
      case TKeyword("FALSE") => advance(); BoolLit(false)
      case TKeyword(kw @ ("CAST" | "TRY_CAST")) =>
        advance(); expectOp("(")
        val child = parseOr()
        expectKw("AS")
        val t = parseTypeName()
        expectOp(")")
        CastOp(child, t, exceptionOnFailure = kw == "CAST")
      case TKeyword("CASE") =>
        advance()
        val whens = Vector.newBuilder[(ExprNode, ExprNode)]
        while (atKw("WHEN")) {
          advance()
          val cond = parseOr()
          expectKw("THEN")
          whens += ((cond, parseOr()))
        }
        val default = if (atKw("ELSE")) { advance(); Some(parseOr()) } else None
        expectKw("END")
        val ws = whens.result()
        if (ws.isEmpty) err("CASE requires at least one WHEN")
        CaseOp(ws, default)
      case TOp("(") =>
        advance()
        val e = parseOr()
        expectOp(")")
        e
      case TIdent(name) =>
        advance()
        if (atOp("(")) {
          advance()
          val args = Vector.newBuilder[ExprNode]
          if (!atOp(")")) {
            args += parseOr()
            while (atOp(",")) { advance(); args += parseOr() }
          }
          expectOp(")")
          FuncCall(name.toUpperCase, args.result())
        } else Ident(name)
      case t => err(s"unexpected token $t")
    }
  }
}
