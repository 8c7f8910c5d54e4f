package graft.expr

import graft.types.DType

/** AST for the scalar expression DSL.
  * Node inventory mirrors the reference grammar
  * (ref: python/feathub/dsl/ast.py:49-386): binary arithmetic, comparison,
  * logic, unary minus, IS [NOT] NULL, CASE WHEN, CAST/TRY_CAST, bracket
  * (map subscript), literals, identifiers, and built-in function calls.
  */
sealed trait ExprNode

final case class BinaryOp(op: String, left: ExprNode, right: ExprNode) extends ExprNode // + - * /
final case class CompareOp(op: String, left: ExprNode, right: ExprNode) extends ExprNode // < <= > >= = <>
final case class LogicalOp(op: String, left: ExprNode, right: ExprNode) extends ExprNode // AND OR
final case class NotOp(child: ExprNode) extends ExprNode
final case class UminusOp(child: ExprNode) extends ExprNode
final case class IsNullOp(child: ExprNode, negated: Boolean) extends ExprNode
final case class CaseOp(whens: Seq[(ExprNode, ExprNode)], default: Option[ExprNode]) extends ExprNode
final case class CastOp(child: ExprNode, to: DType, exceptionOnFailure: Boolean) extends ExprNode
final case class BracketOp(coll: ExprNode, key: ExprNode) extends ExprNode
final case class FuncCall(name: String, args: Seq[ExprNode]) extends ExprNode
final case class Ident(name: String) extends ExprNode
final case class IntLit(value: Long) extends ExprNode
final case class FloatLit(value: Double) extends ExprNode
final case class StringLit(value: String) extends ExprNode
final case class BoolLit(value: Boolean) extends ExprNode
case object NullLit extends ExprNode
