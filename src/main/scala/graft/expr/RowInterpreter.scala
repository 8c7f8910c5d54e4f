package graft.expr

import graft.types._

/** Row-level interpreter for the expression DSL — the serving path evaluates
  * per-request features without a Spark job
  * (ref: python/feathub/processors/local/ast_evaluator/
  * local_ast_evaluator.py:45-198). Semantics match the Spark compiler:
  * NULL-propagating arithmetic and comparisons.
  */
object RowInterpreter {

  def eval(exprStr: String, row: Map[String, Any]): Any =
    eval(Parser.parse(exprStr), row)

  def eval(node: ExprNode, row: Map[String, Any]): Any = node match {
    case Ident(n)     => row.getOrElse(n, null)
    case IntLit(v)    => v
    case FloatLit(v)  => v
    case StringLit(v) => v
    case BoolLit(v)   => v
    case NullLit      => null
    case NotOp(c) =>
      eval(c, row) match { case null => null; case b: Boolean => !b }
    case UminusOp(c) =>
      eval(c, row) match {
        case null => null
        case v =>
          // preserve exact int64 (negating through Double would round
          // beyond 2^53), matching Spark's typed unary minus
          asLong(v) match {
            case Some(l) => -l
            case None    => -num(v).asInstanceOf[Double]
          }
      }
    case BinaryOp(op, l, r) =>
      // Evaluate each operand exactly once; keep exact Long arithmetic when
      // both operands are integral (int64 beyond 2^53 must not round-trip
      // through Double), falling back to Double for floating-point inputs
      // and for division, which is always FLOAT64 in the DSL.
      (eval(l, row), eval(r, row)) match {
        case (null, _) | (_, null) => null
        case (lv, rv) =>
          (asLong(lv), asLong(rv)) match {
            case (Some(a), Some(b)) if op != "/" =>
              op match {
                case "+" => a + b
                case "-" => a - b
                case "*" => a * b
              }
            case _ =>
              val a = num(lv).asInstanceOf[Double]
              val b = num(rv).asInstanceOf[Double]
              op match {
                case "+" => a + b
                case "-" => a - b
                case "*" => a * b
                // division by zero is NULL, matching the engine's
                // try_divide (ANSI DSL semantics) — not Infinity
                case "/" => if (b == 0.0) null else a / b
              }
          }
      }
    case CompareOp(op, l, r) =>
      (eval(l, row), eval(r, row)) match {
        case (null, _) | (_, null) => null
        case (a, b) =>
          val c = cmp(a, b)
          op match {
            case "<"  => c < 0
            case "<=" => c <= 0
            case ">"  => c > 0
            case ">=" => c >= 0
            case "="  => c == 0
            case "<>" => c != 0
          }
      }
    case LogicalOp("AND", l, r) =>
      (eval(l, row), eval(r, row)) match {
        case (java.lang.Boolean.FALSE, _) | (_, java.lang.Boolean.FALSE) => false
        case (null, _) | (_, null)                                       => null
        case _                                                           => true
      }
    case LogicalOp(_, l, r) =>
      (eval(l, row), eval(r, row)) match {
        case (java.lang.Boolean.TRUE, _) | (_, java.lang.Boolean.TRUE) => true
        case (null, _) | (_, null)                                     => null
        case _                                                         => false
      }
    case IsNullOp(c, negated) =>
      val isNull = eval(c, row) == null
      if (negated) !isNull else isNull
    case CaseOp(whens, default) =>
      whens
        .collectFirst { case (c, v) if eval(c, row) == true => eval(v, row) }
        .orElse(default.map(eval(_, row)))
        .orNull
    case CastOp(c, to, exceptionOnFailure) =>
      val v = eval(c, row)
      try castTo(v, to)
      catch {
        case e: Exception => if (exceptionOnFailure) throw e else null
      }
    case BracketOp(coll, key) =>
      (eval(coll, row), eval(key, row)) match {
        case (null, _) | (_, null)  => null
        case (m: Map[_, _], k)      => m.asInstanceOf[Map[Any, Any]].getOrElse(k, null)
        case (s: Seq[_], i: Long)   => if (i >= 1 && i <= s.length) s(i.toInt - 1) else null
        case _                      => null
      }
    case FuncCall(name, args) => evalFunc(name, args, row)
  }

  private def evalFunc(name: String, args: Seq[ExprNode], row: Map[String, Any]): Any = {
    def a(i: Int) = eval(args(i), row)
    name match {
      case "LOWER" => a(0) match { case null => null; case s => s.toString.toLowerCase }
      case "UPPER" => a(0) match { case null => null; case s => s.toString.toUpperCase }
      case "CONCAT" =>
        val vs = args.map(eval(_, row))
        if (vs.contains(null)) null else vs.mkString
      case "CONCAT_WS" =>
        val sep = a(0).toString
        args.tail.map(eval(_, row)).filter(_ != null).mkString(sep)
      case "UNIX_TIMESTAMP" =>
        a(0) match {
          case null => null
          case s =>
            val fmt = if (args.length > 1) eval(args(1), row).toString else "%Y-%m-%d %H:%M:%S"
            val jfmt = TimeFormats.toJavaDateFormat(fmt)
            val f = java.time.format.DateTimeFormatter.ofPattern(jfmt)
            val parsed = f.parse(s.toString)
            // honor an explicit zone offset (%z); zoneless strings are UTC
            try java.time.OffsetDateTime.from(parsed).toEpochSecond
            catch {
              case _: java.time.DateTimeException =>
                java.time.LocalDateTime.from(parsed)
                  .toEpochSecond(java.time.ZoneOffset.UTC)
            }
        }
      case "JSON_STRING" =>
        a(0) match {
          case null       => null
          case s: String  => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
          case b: Boolean => b.toString
          case v          => v.toString
        }
      case "MAP" =>
        args.map(eval(_, row)).grouped(2).map { case Seq(k, v) => k -> v }.toMap
      case "ARRAY" => args.map(eval(_, row))
      case "SIZE" =>
        a(0) match {
          case null        => null
          case m: Map[_, _] => m.size
          case s: Seq[_]    => s.size
          case _            => null
        }
      case "ROUND" =>
        a(0) match {
          case null => null
          case v =>
            val scale = if (args.length > 1) num(eval(args(1), row)).asInstanceOf[Double].toInt else 0
            // Match Spark's HALF_UP decimal rounding of the double value.
            BigDecimal(num(v).asInstanceOf[Double])
              .setScale(scale, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      case "ARRAY_JOIN" =>
        (a(0), a(1)) match {
          case (null, _) => null
          case (s: Seq[_], sep) => s.filter(_ != null).mkString(sep.toString)
          case _ => null
        }
      case other => throw new IllegalArgumentException(s"Unknown function $other")
    }
  }

  private def num(v: Any): Any = v match {
    case null       => null
    case i: Int     => i.toDouble
    case l: Long    => l.toDouble
    case f: Float   => f.toDouble
    case d: Double  => d
    case s: Short   => s.toDouble
    case b: Byte    => b.toDouble
    case other => throw new IllegalArgumentException(s"not numeric: $other")
  }

  private def asLong(v: Any): Option[Long] = v match {
    case i: Int   => Some(i.toLong)
    case l: Long  => Some(l)
    case s: Short => Some(s.toLong)
    case b: Byte  => Some(b.toLong)
    case _        => None
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String)   => x.compareTo(y)
    case (x: Boolean, y: Boolean) => x.compareTo(y)
    case _ => java.lang.Double.compare(
      num(a).asInstanceOf[Double], num(b).asInstanceOf[Double])
  }

  private def castTo(v: Any, to: DType): Any =
    if (v == null) null
    else to match {
      case DString  => v.toString
      case DInt32   => v match { case s: String => s.trim.toInt; case x => num(x).asInstanceOf[Double].toInt }
      case DInt64   => v match { case s: String => s.trim.toLong; case x => num(x).asInstanceOf[Double].toLong }
      case DFloat32 => v match { case s: String => s.trim.toFloat; case x => num(x).asInstanceOf[Double].toFloat }
      case DFloat64 => v match { case s: String => s.trim.toDouble; case x => num(x).asInstanceOf[Double] }
      case DBool    => v match { case s: String => s.trim.toBoolean; case b: Boolean => b; case x => num(x) != 0.0 }
      case other    => throw new IllegalArgumentException(s"CAST to $other not supported in row interpreter")
    }
}
