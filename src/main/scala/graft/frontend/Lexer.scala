package graft.frontend

import Syntax.{Lit, LitBool, LitFloat, LitInt, LitString, fail}

/** Hand-written lexer for the sqlpp dialect (token set per reference
  * lexer.ml:112-264; keywords are case-insensitive, `--` starts a line
  * comment, strings are single-quoted with backslash escapes, quoted
  * identifiers use double quotes or backticks, `?name` is a parameter,
  * `...name` a fieldset splice and `...` the openness ellipsis).
  * Divergence from the reference, on purpose: we lex `<>` as NEQ (the
  * reference types it but cannot lex it, lexer.ml:152).
  */
object Lexer {

  sealed trait Token
  final case class TIdent(name: String) extends Token
  final case class TKw(kw: String) extends Token // canonical UPPER keyword
  final case class TLit(lit: Lit) extends Token
  final case class TParam(name: String) extends Token
  final case class TSplice(name: String) extends Token // ...name
  final case class TOp(op: String) extends Token // + - * / = != > < >= <=
  case object TLParen extends Token
  case object TRParen extends Token
  case object TComma extends Token
  case object TSemi extends Token
  case object TDot extends Token
  case object TColon extends Token
  case object TBar extends Token
  case object TArrow extends Token // ->
  case object TAscribe extends Token // :- (scope/row ascription)
  case object TEllipsis extends Token // ...
  case object TEof extends Token

  private val keywords: Set[String] = Set(
    "SELECT", "INSERT", "UPDATE", "DELETE", "SET", "INTO", "VALUES",
    "FROM", "LEFT", "JOIN", "AS", "WHERE", "HAVING", "ORDER", "GROUP",
    "BY", "ASC", "ON", "DESC", "NOT", "AND", "OR", "NULL", "IN",
    "EXISTS", "CREATE", "QUERY", "TABLE", "FIELDSET", "CONFLICT",
    "REPLACE", "IGNORE", "EXPR", "IS", "END", "MATCH", "WITH",
    "WITHSCOPE", "RETURNING", "LIMIT", "OFFSET", "PRIMARY", "KEY",
    "AUTOINCREMENT", "DEFAULT")

  def tokenize(src: String): Vector[Token] =
    tokenizeWithOffsets(src)._1

  /** Builder recording each token's start offset (for positioned
    * parse errors, reference report.ml's snippet style).
    */
  private final class TokBuilder {
    val toks = Vector.newBuilder[Token]
    val offs = Vector.newBuilder[Int]
    var start = 0
    def +=(t: Token): Unit = { toks += t; offs += start }
  }

  def tokenizeWithOffsets(src: String): (Vector[Token], Vector[Int]) = {
    val out = new TokBuilder
    var i = 0
    val n = src.length
    def peek(k: Int): Char = if (i + k < n) src.charAt(i + k) else ' '
    while (i < n) {
      out.start = i
      val c = src.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
      else if (c == '-' && peek(1) == '-') {
        while (i < n && src.charAt(i) != '\n') i += 1
      } else if (c == '-' && peek(1) == '>') { out += TArrow; i += 2 }
      else if (c.isDigit) {
        val start = i
        while (i < n && src.charAt(i).isDigit) i += 1
        if (i < n && src.charAt(i) == '.' && i + 1 < n &&
            src.charAt(i + 1).isDigit) {
          i += 1
          while (i < n && src.charAt(i).isDigit) i += 1
          out += TLit(LitFloat(src.substring(start, i).toDouble))
        } else out += TLit(LitInt(src.substring(start, i).toLong))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (src.charAt(i).isLetterOrDigit ||
            src.charAt(i) == '_')) i += 1
        val word = src.substring(start, i)
        val up = word.toUpperCase
        up match {
          case "TRUE"  => out += TLit(LitBool(true))
          case "FALSE" => out += TLit(LitBool(false))
          case kw if keywords.contains(kw) => out += TKw(kw)
          case _ => out += TIdent(word)
        }
      } else if (c == '?') {
        val start = i + 1
        i += 1
        if (i >= n || !(src.charAt(i).isLetter || src.charAt(i) == '_'))
          fail("expected parameter name after '?'")
        while (i < n && (src.charAt(i).isLetterOrDigit ||
            src.charAt(i) == '_')) i += 1
        out += TParam(src.substring(start, i))
      } else if (c == '.') {
        if (peek(1) == '.' && peek(2) == '.') {
          i += 3
          if (i < n && (src.charAt(i).isLetter || src.charAt(i) == '_')) {
            val start = i
            while (i < n && (src.charAt(i).isLetterOrDigit ||
                src.charAt(i) == '_')) i += 1
            out += TSplice(src.substring(start, i))
          } else out += TEllipsis
        } else { out += TDot; i += 1 }
      } else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = src.charAt(i)
          if (ch == '\\' && i + 1 < n) { sb.append(src.charAt(i + 1)); i += 2 }
          else if (ch == '\'') { closed = true; i += 1 }
          else { sb.append(ch); i += 1 }
        }
        if (!closed) fail("string not closed")
        out += TLit(LitString(sb.toString))
      } else if (c == '"' || c == '`') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = src.charAt(i)
          if (ch == '\\' && i + 1 < n) { sb.append(src.charAt(i + 1)); i += 2 }
          else if (ch == quote) { closed = true; i += 1 }
          else { sb.append(ch); i += 1 }
        }
        if (!closed) fail("identifier not closed")
        out += TIdent(sb.toString)
      } else c match {
        case '(' => out += TLParen; i += 1
        case ')' => out += TRParen; i += 1
        case ',' => out += TComma; i += 1
        case ';' => out += TSemi; i += 1
        // `:-` is TAscribe ONLY when what follows can start an STY
        // (whitespace, `(`, or an identifier — parseSty's first set).
        // A digit or `.` after the `-` means a negative numeric
        // literal, so `x:-1` stays TColon TOp("-") TNum — the
        // expression-level EAscribe path that an unconditional `:-`
        // token regressed (an STY can never start with a digit, so
        // the guard loses nothing).
        case ':' if peek(1) == '-' &&
            !(Character.isDigit(peek(2)) || peek(2) == '.') =>
          out += TAscribe; i += 2
        case ':' => out += TColon; i += 1
        case '|' => out += TBar; i += 1
        case '=' => out += TOp("="); i += 1
        case '!' if peek(1) == '=' => out += TOp("!="); i += 2
        case '<' if peek(1) == '>' => out += TOp("!="); i += 2
        case '<' if peek(1) == '=' => out += TOp("<="); i += 2
        case '>' if peek(1) == '=' => out += TOp(">="); i += 2
        case '<' => out += TOp("<"); i += 1
        case '>' => out += TOp(">"); i += 1
        case '+' => out += TOp("+"); i += 1
        case '-' => out += TOp("-"); i += 1
        case '*' => out += TOp("*"); i += 1
        case '/' => out += TOp("/"); i += 1
        case other => fail(s"unexpected character '$other'")
      }
    }
    out.start = n
    out += TEof
    (out.toks.result(), out.offs.result())
  }
}
