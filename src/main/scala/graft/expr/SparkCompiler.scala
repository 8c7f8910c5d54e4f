package graft.expr

import graft.types._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiles the expression DSL AST directly to Spark `Column`s so Catalyst
  * sees a fully declarative tree (predicate pushdown, constant folding,
  * whole-stage codegen all apply). The reference's Spark path instead
  * compiles to a SQL string fed to `functions.expr`
  * (ref: python/feathub/processors/spark/ast_evaluator/
  * spark_ast_evaluator.py:36-112); building `Column`s natively avoids
  * string-escaping hazards and is the idiomatic Scala equivalent.
  */
object SparkCompiler {

  /** Name of the engine-managed event-time metadata column (epoch millis). */
  val EventTimeCol = "__event_time__"

  /** Sentinel column produced by sliding-window views for GET_WINDOW_TIME()
    * (ref: python/feathub/feature_views/sliding_feature_view.py:51).
    */
  val WindowTimeCol = "__window_time__"

  def compile(e: String): Column = compile(Parser.parse(e))

  def compile(node: ExprNode): Column = node match {
    case Ident(name)   => col(quoted(name))
    case IntLit(v)     => lit(v)
    case FloatLit(v)   => lit(v)
    case StringLit(v)  => lit(v)
    case BoolLit(v)    => lit(v)
    case NullLit       => lit(null)
    case UminusOp(c)   => -compile(c)
    case NotOp(c)      => !compile(c)
    case BinaryOp(op, l, r) =>
      val (cl, cr) = (compile(l), compile(r))
      op match {
        case "+" => cl + cr
        case "-" => cl - cr
        case "*" => cl * cr
        // try_divide: NULL on integer division-by-zero (the reference's
        // non-ANSI Spark behavior) instead of an ANSI error; float division
        // still follows IEEE (Infinity).
        case "/" => try_divide(cl, cr)
      }
    case CompareOp(op, l, r) =>
      val (cl, cr) = (compile(l), compile(r))
      op match {
        case "<"  => cl < cr
        case "<=" => cl <= cr
        case ">"  => cl > cr
        case ">=" => cl >= cr
        case "="  => cl === cr
        case "<>" => cl =!= cr
      }
    case LogicalOp(op, l, r) =>
      if (op == "AND") compile(l) && compile(r) else compile(l) || compile(r)
    case IsNullOp(c, negated) =>
      if (negated) compile(c).isNotNull else compile(c).isNull
    case CaseOp(whens, default) =>
      val head = when(compile(whens.head._1), compile(whens.head._2))
      val chained = whens.tail.foldLeft(head) { case (acc, (c, v)) =>
        acc.when(compile(c), compile(v))
      }
      default.map(d => chained.otherwise(compile(d))).getOrElse(chained)
    case CastOp(c, to, exceptionOnFailure) =>
      if (exceptionOnFailure) compile(c).cast(to.toSpark)
      else compile(c).try_cast(to.toSpark)
    // try_element_at: missing map key / out-of-range index yields NULL (the
    // reference's lookup semantics) even under ANSI mode. Integer-literal
    // subscripts compile as INT — array indices reject BIGINT.
    case BracketOp(coll, IntLit(v)) if v >= Int.MinValue && v <= Int.MaxValue =>
      try_element_at(compile(coll), lit(v.toInt))
    case BracketOp(coll, key) => try_element_at(compile(coll), compile(key))
    case FuncCall(name, args) => compileFunc(name, args)
  }

  /** Built-in scalar functions
    * (ref: python/feathub/dsl/built_in_func.py:48-74; Spark translations at
    * python/feathub/processors/spark/ast_evaluator/functions.py:23-43).
    */
  private def compileFunc(name: String, args: Seq[ExprNode]): Column = name match {
    case "LOWER"     => lower(compile(args.head))
    case "UPPER"     => upper(compile(args.head))
    case "CONCAT"    => concat(args.map(a => compile(a).cast("string")): _*)
    case "CONCAT_WS" =>
      concat_ws(args.head match {
        case StringLit(s) => s
        case other => throw new IllegalArgumentException(s"CONCAT_WS separator must be a string literal, got $other")
      }, args.tail.map(a => compile(a).cast("string")): _*)
    case "UNIX_TIMESTAMP" =>
      val fmt = if (args.length > 1) args(1) match {
        case StringLit(s) => s
        case other => throw new IllegalArgumentException(s"UNIX_TIMESTAMP format must be a string literal, got $other")
      } else "%Y-%m-%d %H:%M:%S"
      unix_timestamp(compile(args.head), TimeFormats.toJavaDateFormat(fmt)).cast("bigint")
    case "JSON_STRING" =>
      // Wrap in a single-element array, to_json, strip the brackets; NULL in
      // → NULL out (ref: processors/spark/ast_evaluator/functions.py:33-42).
      val c = compile(args.head)
      val arrJson = to_json(array(c))
      when(c.isNotNull, expr_substr(arrJson)).otherwise(lit(null).cast("string"))
    case "MAP" =>
      require(args.nonEmpty && args.length % 2 == 0, "MAP requires an even number of args")
      map(args.map(compile): _*)
    case "ARRAY" =>
      require(args.nonEmpty, "ARRAY requires at least one arg")
      array(args.map(compile): _*)
    case "SIZE" => size(compile(args.head))
    case "ROUND" =>
      val scale = if (args.length > 1) args(1) match {
        case IntLit(n) => n.toInt
        case other => throw new IllegalArgumentException(s"ROUND scale must be an integer literal, got $other")
      } else 0
      round(compile(args.head), scale)
    case "ARRAY_JOIN" =>
      val sep = args(1) match {
        case StringLit(s) => s
        case other => throw new IllegalArgumentException(s"ARRAY_JOIN separator must be a string literal, got $other")
      }
      array_join(compile(args.head), sep)
    case "GET_WINDOW_TIME" => col(WindowTimeCol)
    case other => throw new IllegalArgumentException(s"Unknown function $other")
  }

  private def expr_substr(arrJson: Column): Column =
    arrJson.substr(lit(2), length(arrJson) - 2)

  /** Backtick-quote a column name for `col` so dotted names stay literal. */
  private def quoted(name: String): String =
    if (name.contains(".")) s"`$name`" else name

  /** Result-type inference for expressions
    * (ref: python/feathub/dsl/ast.py eval_dtype methods and
    * python/feathub/dsl/built_in_func.py:48-74 result-type strategies).
    * `lookup` resolves an identifier to its column type.
    */
  def inferType(node: ExprNode, lookup: String => Option[DType]): DType = node match {
    case Ident(n)      => lookup(n).getOrElse(DUnknown)
    case IntLit(_)     => DInt64
    case FloatLit(_)   => DFloat64
    case StringLit(_)  => DString
    case BoolLit(_)    => DBool
    case NullLit       => DUnknown
    case UminusOp(c)   => inferType(c, lookup)
    case NotOp(_)      => DBool
    case BinaryOp("/", _, _) => DFloat64
    case BinaryOp(_, l, r)   => DType.widen(inferType(l, lookup), inferType(r, lookup))
    case CompareOp(_, _, _)  => DBool
    case LogicalOp(_, _, _)  => DBool
    case IsNullOp(_, _)      => DBool
    case CaseOp(whens, default) =>
      val branches = whens.map(_._2) ++ default.toSeq
      branches.map(b => inferType(b, lookup)).reduce(DType.widen)
    case CastOp(_, to, _) => to
    case BracketOp(coll, _) =>
      inferType(coll, lookup) match {
        case DMap(_, v)  => v
        case DVector(e)  => e
        case _           => DUnknown
      }
    case FuncCall(name, args) => name match {
      case "LOWER" | "UPPER" | "CONCAT" | "CONCAT_WS" | "JSON_STRING" => DString
      case "UNIX_TIMESTAMP" => DInt64
      case "SIZE"           => DInt32
      case "ROUND"          => DFloat64
      case "ARRAY_JOIN"     => DString
      case "MAP" =>
        DMap(inferType(args.head, lookup), inferType(args(1), lookup))
      case "ARRAY"           => DVector(inferType(args.head, lookup))
      case "GET_WINDOW_TIME" => DInt64
      case _                 => DUnknown
    }
  }
}
