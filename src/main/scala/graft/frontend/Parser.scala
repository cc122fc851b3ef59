package graft.frontend

import Syntax._
import Lexer._

/** Recursive-descent / Pratt parser for the sqlpp dialect.
  *
  * Grammar per reference parser.mly (entry points expr_one / query_one /
  * decl_one / decl_many; precedence table parser.mly:66-75:
  * OR < AND < NOT < (= != IS) < (> < >= <=) < IN < (+ -) < (* /) <
  * ascription < unary minus).
  * Deliberate divergence: the reference maps the `*` token to the "-"
  * operator (parser.mly:355, a bug) — we map `*` to "*".
  */
final class Parser(tokens: Vector[Token],
    offsets: Vector[Int] = Vector.empty, src: String = "") {
  private var pos = 0

  /** Positioned parse error when source offsets are available
    * (reference report.ml snippet style).
    */
  private def perr(msg: String): Nothing =
    if (offsets.isEmpty || src.isEmpty) fail(msg)
    else fail(Report.format(src,
      offsets(math.min(pos, offsets.length - 1)), msg))

  private def peek: Token = tokens(pos)
  private def peek2: Token = tokens(math.min(pos + 1, tokens.length - 1))
  private def next(): Token = { val t = tokens(pos); pos += 1; t }
  private def expect(t: Token, what: String): Unit =
    if (peek == t) pos += 1 else perr(s"expected $what but got $peek")
  private def at(kw: String): Boolean = peek == TKw(kw)
  private def eat(kw: String): Boolean =
    if (at(kw)) { pos += 1; true } else false
  private def expectKw(kw: String): Unit =
    if (!eat(kw)) perr(s"expected $kw but got $peek")

  private def ident(): String = next() match {
    case TIdent(n) => n
    case t         => perr(s"expected identifier but got $t")
  }

  // ------------- flexible lists (trailing delimiter allowed) -------------

  private def flexList[A](startsItem: Token => Boolean)(
      item: () => A): List[A] = {
    val buf = List.newBuilder[A]
    if (startsItem(peek)) {
      buf += item()
      while (peek == TComma) {
        next()
        if (startsItem(peek)) buf += item()
      }
    }
    buf.result()
  }

  private def nonemptyFlexList[A](startsItem: Token => Boolean)(
      item: () => A): List[A] = {
    val buf = List.newBuilder[A]
    buf += item()
    while (peek == TComma) {
      next()
      if (startsItem(peek)) buf += item()
    }
    buf.result()
  }

  private def startsExpr(t: Token): Boolean = t match {
    case TIdent(_) | TLit(_) | TParam(_) | TLParen => true
    case TKw("NULL") | TKw("NOT") | TKw("EXISTS") | TKw("MATCH") => true
    case TOp("-") => true
    case _ => false
  }

  // ------------- expressions -------------

  private def binopPrec(op: String): Int = op match {
    case "OR"                      => 10
    case "AND"                     => 20
    case "=" | "!="                => 40
    case ">" | "<" | ">=" | "<="   => 50
    case "+" | "-"                 => 60
    case "*" | "/"                 => 70
    case _                         => -1
  }

  def parseExpr(): Expr = parseExprPrec(0)

  private def parseExprPrec(minPrec: Int): Expr = {
    // prefix
    var lhs: Expr = peek match {
      case TKw("NOT") =>
        next(); EApp("NOT", List(parseExprPrec(30)))
      case TOp("-") =>
        next(); EApp("-", List(parseExprPrec(90)))
      case _ => parsePrimary()
    }
    // postfix / infix loop
    var done = false
    while (!done) {
      peek match {
        case TKw("IS") if 40 >= minPrec =>
          next()
          if (eat("NOT")) { expectKw("NULL"); lhs = EApp("IS NOT NULL", List(lhs)) }
          else { expectKw("NULL"); lhs = EApp("IS NULL", List(lhs)) }
        case TKw("IN") if 55 >= minPrec =>
          next()
          expect(TLParen, "(")
          val sel = parseSelect()
          expect(TRParen, ")")
          lhs = EIn(List(lhs), sel)
        case TColon if 80 >= minPrec =>
          next()
          lhs = EAscribe(lhs, parseTyOrExpr())
        case TKw(op @ ("AND" | "OR")) =>
          val prec = binopPrec(op)
          if (prec >= minPrec) { next(); lhs = EApp(op, List(lhs, parseExprPrec(prec + 1))) }
          else done = true
        case TOp(op) =>
          val prec = binopPrec(op)
          if (prec >= 0 && prec >= minPrec) {
            next(); lhs = EApp(op, List(lhs, parseExprPrec(prec + 1)))
          } else done = true
        case _ => done = true
      }
    }
    lhs
  }

  /** Primary expressions, incl. the reference's expr_simple forms
    * (parser.mly:326-334) plus literals, NULL, and multi-column IN.
    */
  private def parsePrimary(): Expr = peek match {
    case TLit(l) => next(); ELit(l)
    case TKw("NULL") => next(); ENull
    case TParam(p) => next(); EParam(p)
    case TKw("EXISTS") =>
      next(); expect(TLParen, "(")
      val sel = parseSelect()
      expect(TRParen, ")")
      EExists(sel)
    case TKw("MATCH") =>
      next()
      val p = peek match {
        case TParam(name) => next(); name
        case t            => perr(s"expected ?param after MATCH but got $t")
      }
      expectKw("WITH")
      if (peek == TBar) next()
      val cases = List.newBuilder[MatchCase]
      cases += parseMatchCase()
      while (peek == TBar) { next(); cases += parseMatchCase() }
      expectKw("END")
      EMatch(p, cases.result())
    case TLParen =>
      next()
      val e = parseExpr()
      if (peek == TComma) {
        // (e1, e2, ...) IN (select)  — parser.mly:323-324
        next()
        val rest = nonemptyFlexList(startsExpr)(() => parseExpr())
        expect(TRParen, ")")
        expectKw("IN")
        expect(TLParen, "(")
        val sel = parseSelect()
        expect(TRParen, ")")
        EIn(e :: rest, sel)
      } else {
        expect(TRParen, ")")
        e
      }
    case TIdent(_) => parseSimpleName()
    case t => perr(s"unexpected token in expression: $t")
  }

  /** name | name.simple | name(args) — the expr_simple chain. */
  private def parseSimpleName(): Expr = {
    val n = ident()
    peek match {
      case TDot =>
        next()
        ENav(n, parseSimpleAfterDot())
      case TLParen =>
        next()
        val args = flexList(startsExpr)(() => parseExpr())
        expect(TRParen, ")")
        EApp(n, args)
      case _ => EName(n)
    }
  }

  /** After a dot: expr_simple only (name/nav/app/param/parens/...). */
  private def parseSimpleAfterDot(): Expr = peek match {
    case TIdent(_)  => parseSimpleName()
    case TParam(p)  => next(); EParam(p)
    case TLParen    =>
      next(); val e = parseExpr(); expect(TRParen, ")"); e
    case TKw("EXISTS") | TKw("MATCH") => parsePrimary()
    case t => perr(s"unexpected token after '.': $t")
  }

  private def parseMatchCase(): MatchCase = {
    val tag = ident()
    val args: List[String] = peek match {
      case TParam(p) => next(); List(p)
      case TLParen =>
        next()
        val ps = flexList({ case TParam(_) => true; case _ => false }) { () =>
          peek match { case TParam(p) => next(); p; case t => perr(s"expected param, got $t") }
        }
        expect(TRParen, ")")
        ps
      case _ => Nil
    }
    expect(TArrow, "->")
    MatchCase(tag, args, parseExpr())
  }

  // ------------- types -------------

  private def parseTy(): Ty = {
    val name = ident().toUpperCase
    val core = if (name == "NUMERIC") NUMERIC else TyName(name)
    if (eat("NULL")) Ty(core, nullable = true)
    else if (at("NOT")) { next(); expectKw("NULL"); Ty(core, nullable = false) }
    else Ty(core, nullable = true)
  }

  private def parseTyOrExpr(): TyOrExpr = {
    val ty = parseTy()
    if (eat("EXPR")) TyExpr(ty) else TyVal(ty)
  }

  // ------------- select -------------

  def parseSelect(): Select = {
    expectKw("SELECT")
    var isOpen = false
    val startsField: Token => Boolean = {
      case TEllipsis | TSplice(_) | TKw("WITH") | TKw("WITHSCOPE") => true
      case t => startsExpr(t)
    }
    val fieldOpts = nonemptyFlexList(startsField) { () =>
      peek match {
        case TEllipsis => next(); isOpen = true; None
        case TKw("WITHSCOPE") =>
          next()
          val path = parseScopeName()
          expectKw("AS")
          Some(FieldWithScope(path, ident()))
        case TKw("WITH") =>
          next()
          peek match {
            case TSplice(name) =>
              next()
              Some(FieldFieldset(name, parseFieldsetArgs(), isUsed = false))
            case _ =>
              val e = parseExpr()
              val alias = if (eat("AS")) Some(ident()) else None
              Some(FieldE(alias, e, isUsed = false))
          }
        case TSplice(name) =>
          next()
          Some(FieldFieldset(name, parseFieldsetArgs(), isUsed = true))
        case _ =>
          val e = parseExpr()
          val alias = if (eat("AS")) Some(ident()) else None
          Some(FieldE(alias, e, isUsed = true))
      }
    }
    val fields = fieldOpts.flatten
    val from =
      if (at("FROM")) { next(); Some(parseFrom()) } else None
    val where = if (eat("WHERE")) Some(parseExpr()) else None
    val groupBy =
      if (at("GROUP")) {
        next(); expectKw("BY")
        if (peek == TLParen && peek2 == TRParen) { next(); next(); Some(Nil) }
        else Some(nonemptyFlexList(startsExpr)(() => parseExpr()))
      } else None
    val having = if (eat("HAVING")) Some(parseExpr()) else None
    val orderBy =
      if (at("ORDER")) {
        next(); expectKw("BY")
        Some(nonemptyFlexList(startsExpr) { () =>
          val e = parseExpr()
          val dir = if (eat("ASC")) Asc else if (eat("DESC")) Desc else Asc
          (e, dir)
        })
      } else None
    val limit = if (eat("LIMIT")) Some(parseExpr()) else None
    val offset = if (eat("OFFSET")) Some(parseExpr()) else None
    // `:- STY` scope/row ascription (reference README.md:103-186) —
    // an analysis-time assertion over the select's scope and row
    val asc = if (peek == TAscribe) { next(); Some(parseSty()) } else None
    Select(fields, from, where, groupBy, having, orderBy, limit, offset,
      isOpen, asc)
  }

  private def parseFieldsetArgs(): List[List[String]] =
    if (peek == TLParen) {
      next()
      val args = flexList({ case TIdent(_) => true; case _ => false })(
        () => parseScopeName())
      expect(TRParen, ")")
      args
    } else Nil

  private def parseScopeName(): List[String] = {
    val buf = List.newBuilder[String]
    buf += ident()
    while (peek == TDot) { next(); buf += ident() }
    buf.result()
  }

  private def parseFromOne(): FromOne = peek match {
    case TLParen =>
      next()
      val sel = parseSelect()
      expect(TRParen, ")")
      expectKw("AS") // alias required for subselects (parser.mly:294)
      FromSelect(sel, ident())
    case _ =>
      val table = ident()
      val alias = if (eat("AS")) Some(ident()) else None
      FromTable(table, alias)
  }

  private def parseFrom(): From = {
    var from: From = FromSingle(parseFromOne())
    var done = false
    while (!done) {
      val kind: Option[JoinKind] =
        if (at("JOIN")) { next(); Some(JoinInner) }
        else if (at("LEFT")) {
          next()
          // OPTIONAL is contextual (a plain identifier here, not a
          // reserved word — tables/columns named `optional` stay
          // legal): after LEFT only JOIN can follow, so claiming the
          // identifier is unambiguous
          val opt = peek match {
            case TIdent(w) if w.equalsIgnoreCase("OPTIONAL") =>
              next(); true
            case _ => false
          }
          expectKw("JOIN")
          Some(if (opt) JoinLeftOpt() else JoinLeft)
        } else None
      kind match {
        case Some(k) =>
          val right = parseFromOne()
          expectKw("ON")
          from = FromJoin(from, right, k, parseExpr())
        case None => done = true
      }
    }
    from
  }

  // ------------- DML -------------

  private def parseReturning(): List[SelectField] =
    if (eat("RETURNING"))
      nonemptyFlexList(startsExpr) { () =>
        val e = parseExpr()
        val alias = if (eat("AS")) Some(ident()) else None
        FieldE(alias, e, isUsed = true)
      }
    else Nil

  def parseInsert(): Insert = {
    expectKw("INSERT"); expectKw("INTO")
    val table = ident()
    val (columns, from) = peek match {
      case TLParen =>
        next()
        val cols = nonemptyFlexList({ case TIdent(_) => true; case _ => false })(() => ident())
        expect(TRParen, ")")
        val f: InsertFrom =
          if (eat("VALUES")) {
            InsertValues(nonemptyFlexList({ case TLParen => true; case _ => false }) { () =>
              expect(TLParen, "(")
              val es = nonemptyFlexList(startsExpr)(() => parseExpr())
              expect(TRParen, ")")
              es
            })
          } else InsertSelect(parseSelect())
        (cols, f)
      case TKw("SET") =>
        next()
        val sets = nonemptyFlexList({ case TIdent(_) => true; case _ => false }) { () =>
          val nm = ident()
          expect(TOp("="), "=")
          (nm, parseExpr())
        }
        (sets.map(_._1), InsertValues(List(sets.map(_._2))))
      case t => perr(s"expected (columns) or SET in INSERT, got $t")
    }
    val onConflict =
      if (at("ON")) {
        next(); expectKw("CONFLICT")
        if (eat("IGNORE")) Some(ConflictIgnore)
        else if (eat("REPLACE")) Some(ConflictReplace)
        else {
          // accept both UPDATE SET and DO UPDATE SET ("do" lexes as a
          // plain identifier — it is not a dialect keyword)
          peek match {
            case TIdent(w) if w.equalsIgnoreCase("do") => next()
            case _ => ()
          }
          if (eat("UPDATE")) {
            expectKw("SET")
            val sets = nonemptyFlexList(
              { case TIdent(_) => true; case _ => false }) { () =>
              val nm = ident()
              expect(TOp("="), "=")
              (nm, parseExpr())
            }
            Some(ConflictUpdate(sets))
          } else perr(
            "expected IGNORE, REPLACE or [DO] UPDATE SET after ON CONFLICT")
        }
      } else None
    Insert(table, columns, from, onConflict, parseReturning())
  }

  def parseUpdate(): Update = {
    expectKw("UPDATE")
    val table = ident()
    expectKw("SET")
    val sets = nonemptyFlexList({ case TIdent(_) => true; case _ => false }) { () =>
      val nm = ident()
      expect(TOp("="), "=")
      (nm, parseExpr())
    }
    val from = if (eat("FROM")) Some(parseFrom()) else None
    val where = if (eat("WHERE")) Some(parseExpr()) else None
    Update(table, sets, from, where, parseReturning())
  }

  def parseDelete(): Delete = {
    expectKw("DELETE"); expectKw("FROM")
    val table = ident()
    val where = if (eat("WHERE")) Some(parseExpr()) else None
    Delete(table, where, parseReturning())
  }

  def parseQuery(): Query = peek match {
    case TKw("SELECT") => QSelect(parseSelect())
    case TKw("INSERT") => QInsert(parseInsert())
    case TKw("UPDATE") => QUpdate(parseUpdate())
    case TKw("DELETE") => QDelete(parseDelete())
    case t             => perr(s"expected a query but got $t")
  }

  // ------------- declarations -------------

  def parseDecl(): Decl = {
    expectKw("CREATE")
    if (eat("QUERY")) {
      val name = ident()
      expectKw("AS")
      DeclQuery(name, parseQuery())
    } else if (eat("TABLE")) {
      val name = ident()
      expect(TLParen, "(")
      val cols = nonemptyFlexList({ case TIdent(_) => true; case _ => false }) { () =>
        val cn = ident()
        val ty = parseTy()
        var pk = false
        var auto = false
        var default: Option[Expr] = None
        var more = true
        while (more) {
          if (at("PRIMARY")) { next(); expectKw("KEY"); pk = true }
          else if (eat("AUTOINCREMENT")) auto = true
          else if (eat("DEFAULT")) default = Some(parseExpr())
          else more = false
        }
        ColumnDef(cn, ty, pk, auto, default)
      }
      expect(TRParen, ")")
      DeclTable(name, cols)
    } else if (eat("FIELDSET")) {
      val name = ident()
      val args =
        if (peek == TLParen) {
          next()
          val as = flexList({ case TKw("FROM") => true; case _ => false }) { () =>
            expectKw("FROM")
            val sty = parseSty()
            if (eat("AS")) (ident(), sty)
            else sty match {
              case StyName(n) => (n, sty)
              case _          => fail("structural fieldset arg requires AS name")
            }
          }
          expect(TRParen, ")")
          as
        } else Nil
      expectKw("AS"); expectKw("SELECT")
      val exprs = nonemptyFlexList(startsExpr) { () =>
        val e = parseExpr()
        expectKw("AS")
        (ident(), e)
      }
      DeclFieldset(name, Fieldset(args, exprs))
    } else perr(s"expected QUERY, TABLE or FIELDSET after CREATE, got $peek")
  }

  private def parseSty(): Sty = peek match {
    case TLParen =>
      next()
      val elems = nonemptyFlexList({
        case TIdent(_) | TKw("FROM") => true
        case _ => false
      }) { () =>
        if (eat("FROM")) {
          val sty = parseSty()
          if (eat("AS")) (ident(), StyElemScope(sty): StyElem)
          else sty match {
            case StyName(n) => (n, StyElemScope(sty): StyElem)
            case _ => fail("structural scope element requires AS name")
          }
        } else {
          val n = ident()
          (n, StyElemTy(parseTy()): StyElem)
        }
      }
      expect(TRParen, ")")
      StyStruct(elems)
    case _ => StyName(ident())
  }

  def parseDecls(): List[Decl] = {
    val buf = List.newBuilder[Decl]
    while (peek != TEof) {
      buf += parseDecl()
      while (peek == TSemi) next()
    }
    buf.result()
  }

  private def expectEof(): Unit =
    if (peek != TEof) perr(s"unexpected trailing input: $peek")

  def parseExprEof(): Expr = { val e = parseExpr(); expectEof(); e }
  def parseQueryEof(): Query = { val q = parseQuery(); expectEof(); q }
}

object Parser {
  private def of(src: String): Parser = {
    val (toks, offs) = Lexer.tokenizeWithOffsets(src)
    new Parser(toks, offs, src)
  }
  def parseQuery(src: String): Query = of(src).parseQueryEof()
  def parseExpr(src: String): Expr = of(src).parseExprEof()
  def parseDecls(src: String): List[Decl] = of(src).parseDecls()
}
