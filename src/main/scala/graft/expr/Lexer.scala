package graft.expr

/** Hand-rolled lexer for the expression DSL.
  * Token set per the reference lexer (ref: python/feathub/dsl/
  * expr_lexer_rules.py:26-131): case-insensitive keywords, backtick-quoted
  * identifiers, single- or double-quoted strings, INTEGER/FLOAT literals.
  */
object Lexer {

  sealed trait Token
  final case class TIdent(name: String) extends Token
  final case class TKeyword(kw: String) extends Token // upper-cased
  final case class TInt(v: Long) extends Token
  final case class TFloat(v: Double) extends Token
  final case class TString(v: String) extends Token
  final case class TOp(op: String) extends Token // + - * / ( ) [ ] , < <= > >= = <>
  case object TEof extends Token

  val keywords: Set[String] = Set(
    "AND", "OR", "NOT", "IS", "NULL", "TRUE", "FALSE",
    "CASE", "WHEN", "THEN", "ELSE", "END", "CAST", "TRY_CAST", "AS",
    "BYTES", "STRING", "INTEGER", "BIGINT", "FLOAT", "DOUBLE", "BOOLEAN", "TIMESTAMP")

  def tokenize(input: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    var i = 0
    val n = input.length
    def err(msg: String) = throw new IllegalArgumentException(s"Lex error at $i in <$input>: $msg")
    while (i < n) {
      val c = input(i)
      if (c.isWhitespace) { i += 1 }
      else if (c == '`') {
        val j = input.indexOf('`', i + 1)
        if (j < 0) err("unterminated backtick identifier")
        out += TIdent(input.substring(i + 1, j))
        i = j + 1
      } else if (c == '\'' || c == '"') {
        val j = input.indexOf(c, i + 1)
        if (j < 0) err("unterminated string literal")
        out += TString(input.substring(i + 1, j))
        i = j + 1
      } else if (c.isDigit || (c == '.' && i + 1 < n && input(i + 1).isDigit)) {
        val start = i
        while (i < n && input(i).isDigit) i += 1
        var isFloat = false
        if (i < n && input(i) == '.') { isFloat = true; i += 1; while (i < n && input(i).isDigit) i += 1 }
        if (i < n && (input(i) == 'e' || input(i) == 'E')) {
          isFloat = true; i += 1
          if (i < n && (input(i) == '+' || input(i) == '-')) i += 1
          while (i < n && input(i).isDigit) i += 1
        }
        val s = input.substring(start, i)
        if (isFloat) out += TFloat(s.toDouble) else out += TInt(s.toLong)
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (input(i).isLetterOrDigit || input(i) == '_')) i += 1
        val s = input.substring(start, i)
        val up = s.toUpperCase
        if (keywords.contains(up)) out += TKeyword(up) else out += TIdent(s)
      } else c match {
        case '<' =>
          if (i + 1 < n && input(i + 1) == '=') { out += TOp("<="); i += 2 }
          else if (i + 1 < n && input(i + 1) == '>') { out += TOp("<>"); i += 2 }
          else { out += TOp("<"); i += 1 }
        case '>' =>
          if (i + 1 < n && input(i + 1) == '=') { out += TOp(">="); i += 2 }
          else { out += TOp(">"); i += 1 }
        case '+' | '-' | '*' | '/' | '(' | ')' | '[' | ']' | ',' | '=' =>
          out += TOp(c.toString); i += 1
        case other => err(s"unexpected character '$other'")
      }
    }
    out += TEof
    out.result()
  }
}
