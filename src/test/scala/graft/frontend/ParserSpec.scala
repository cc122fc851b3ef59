package graft.frontend

import org.scalatest.funsuite.AnyFunSuite
import Syntax._

/** Parser/lexer golden checks, shaped after the reference's cram tests
  * (reference test/sqlpp dir, the .t files): precedence, field forms,
  * joins, DML, declarations.
  */
class ParserSpec extends AnyFunSuite {

  test("precedence: OR < AND < comparisons < additive < multiplicative") {
    val e = Parser.parseExpr("a OR b AND c = d + e * f")
    assert(e == EApp("OR", List(
      EName("a"),
      EApp("AND", List(
        EName("b"),
        EApp("=", List(
          EName("c"),
          EApp("+", List(
            EName("d"),
            EApp("*", List(EName("e"), EName("f"))))))))))))
  }

  test("`*` parses as multiplication (diverges from reference parser.mly:355 bug)") {
    assert(Parser.parseExpr("a * b") == EApp("*", List(EName("a"), EName("b"))))
  }

  test("`<>` lexes as !=") {
    assert(Parser.parseExpr("a <> b") == EApp("!=", List(EName("a"), EName("b"))))
  }

  test("unary minus binds tighter than binary ops") {
    assert(Parser.parseExpr("-a + b") ==
      EApp("+", List(EApp("-", List(EName("a"))), EName("b"))))
  }

  test("IS NULL / IS NOT NULL postfix") {
    assert(Parser.parseExpr("a IS NULL") == EApp("IS NULL", List(EName("a"))))
    assert(Parser.parseExpr("a IS NOT NULL AND b") ==
      EApp("AND", List(EApp("IS NOT NULL", List(EName("a"))), EName("b"))))
  }

  test("nav chains and function application") {
    assert(Parser.parseExpr("a.b.c") ==
      ENav("a", ENav("b", EName("c"))))
    assert(Parser.parseExpr("stats.count(1)") ==
      ENav("stats", EApp("count", List(ELit(LitInt(1))))))
  }

  test("params, ascription, NULL ascription") {
    assert(Parser.parseExpr("?x") == EParam("x"))
    assert(Parser.parseExpr("?x: int") ==
      EAscribe(EParam("x"), TyVal(Ty(TyName("INT"), nullable = true))))
    assert(Parser.parseExpr("null: int not null") ==
      EAscribe(ENull, TyVal(Ty(TyName("INT"), nullable = false))))
  }

  test("`:-` before a digit is colon + minus, not ascription (r11 lexer regression)") {
    // `x:-1` is an expression-level colon ascription followed by a
    // negative literal: the `:-` must NOT lex as TAscribe there (an
    // STY can never start with a digit). Both lexings end in a parse
    // error (parseTy wants a type name), but the guarded lexer fails
    // inside the type — proving TColon was emitted — instead of
    // failing earlier on an unexpected ascription token.
    val toks = Lexer.tokenize("x:-1")
    assert(toks.take(4) == Vector(
      Lexer.TIdent("x"), Lexer.TColon, Lexer.TOp("-"),
      Lexer.TLit(LitInt(1))))
    // ...while `:-` before an STY head (identifier / paren / space)
    // still lexes as the ascription token the select suffix consumes
    val toks2 = Lexer.tokenize("x :- (a int)")
    assert(toks2.take(2) == Vector(Lexer.TIdent("x"), Lexer.TAscribe))
    val toks3 = Lexer.tokenize("x:-sty")
    assert(toks3.take(2) == Vector(Lexer.TIdent("x"), Lexer.TAscribe))
  }

  test("LEFT OPTIONAL JOIN parses; OPTIONAL stays a contextual identifier") {
    val QSelect(s) = Parser.parseQuery(
      "SELECT a FROM t LEFT OPTIONAL JOIN u ON a = b"): @unchecked
    val Some(FromJoin(_, _, kind, _)) = s.from: @unchecked
    assert(kind == JoinLeftOpt(Nil))
    // `optional` is NOT reserved: legal as a column or table name
    assert(Parser.parseExpr("optional") == EName("optional"))
    val QSelect(s2) = Parser.parseQuery(
      "SELECT optional FROM optional AS o"): @unchecked
    assert(s2.from == Some(FromSingle(FromTable("optional", Some("o")))))
    // print/parse round trip keeps the marker
    val printed = Printer.query(QSelect(s))
    assert(printed.contains("LEFT OPTIONAL JOIN"), printed)
    val QSelect(s3) = Parser.parseQuery(printed): @unchecked
    val Some(FromJoin(_, _, kind3, _)) = s3.from: @unchecked
    assert(kind3 == JoinLeftOpt(Nil))
  }

  test("IN subquery, single and multi column") {
    val q1 = Parser.parseExpr("x IN (SELECT a FROM t)")
    assert(q1.isInstanceOf[EIn] && q1.asInstanceOf[EIn].exprs.length == 1)
    val q2 = Parser.parseExpr("(x, y) IN (SELECT a, b FROM t)")
    assert(q2.asInstanceOf[EIn].exprs == List(EName("x"), EName("y")))
  }

  test("EXISTS subquery") {
    assert(Parser.parseExpr("EXISTS (SELECT a FROM t)").isInstanceOf[EExists])
  }

  test("select: full clause set") {
    val QSelect(s) = Parser.parseQuery(
      """SELECT a, b AS bb, WITH c + 1 AS lazyc, ...
        |FROM t AS u LEFT JOIN v ON u.id = v.id
        |WHERE a > 1 GROUP BY a HAVING count(1) > 0
        |ORDER BY a DESC LIMIT 10 OFFSET 2""".stripMargin): @unchecked
    assert(s.isOpen)
    assert(s.proj.length == 3)
    assert(s.proj(2) == FieldE(Some("lazyc"),
      EApp("+", List(EName("c"), ELit(LitInt(1)))), isUsed = false))
    assert(s.from.exists(_.isInstanceOf[FromJoin]))
    assert(s.groupBy.contains(List(EName("a"))))
    assert(s.orderBy.contains(List((EName("a"), Desc))))
    assert(s.limit.contains(ELit(LitInt(10))))
    assert(s.offset.contains(ELit(LitInt(2))))
  }

  test("GROUP BY () is the explicit global aggregation") {
    val QSelect(s) =
      Parser.parseQuery("SELECT count(1) AS n FROM t GROUP BY ()"): @unchecked
    assert(s.groupBy.contains(Nil))
  }

  test("WITHSCOPE and fieldset splices") {
    val QSelect(s) = Parser.parseQuery(
      "SELECT WITHSCOPE a.b AS c, ...fs(x, y.z), WITH ...gs FROM t"): @unchecked
    assert(s.proj(0) == FieldWithScope(List("a", "b"), "c"))
    assert(s.proj(1) ==
      FieldFieldset("fs", List(List("x"), List("y", "z")), isUsed = true))
    assert(s.proj(2) == FieldFieldset("gs", Nil, isUsed = false))
  }

  test("MATCH variant param") {
    val e = Parser.parseExpr(
      "MATCH ?q WITH | all -> true | name ?n -> name = ?n END")
    val m = e.asInstanceOf[EMatch]
    assert(m.param == "q")
    assert(m.cases.map(_.tag) == List("all", "name"))
    assert(m.cases(1).args == List("n"))
  }

  test("INSERT forms: VALUES, SET sugar, SELECT, ON CONFLICT, RETURNING") {
    val QInsert(i1) = Parser.parseQuery(
      "INSERT INTO t(a, b) VALUES (1, 'x'), (2, 'y') ON CONFLICT IGNORE RETURNING a"): @unchecked
    assert(i1.columns == List("a", "b"))
    assert(i1.from.asInstanceOf[InsertValues].rows.length == 2)
    assert(i1.onConflict.contains(ConflictIgnore))
    assert(i1.returning.length == 1)

    val QInsert(i2) =
      Parser.parseQuery("INSERT INTO t SET a = 1, b = 'x'"): @unchecked
    assert(i2.columns == List("a", "b"))

    val QInsert(i3) =
      Parser.parseQuery("INSERT INTO t(a) SELECT x FROM u"): @unchecked
    assert(i3.from.isInstanceOf[InsertSelect])
  }

  test("UPDATE with FROM join and WHERE") {
    val QUpdate(u) = Parser.parseQuery(
      "UPDATE t SET a = b + 1 FROM u JOIN v ON v.id = u.id WHERE a > 0 RETURNING a"): @unchecked
    assert(u.set == List(("a", EApp("+", List(EName("b"), ELit(LitInt(1)))))))
    assert(u.where.isDefined && u.returning.length == 1)
  }

  test("DELETE with WHERE") {
    val QDelete(d) =
      Parser.parseQuery("DELETE FROM t WHERE a = 1"): @unchecked
    assert(d.table == "t" && d.where.isDefined)
  }

  test("declarations: table, query, fieldset") {
    val decls = Parser.parseDecls(
      """CREATE TABLE users(id int not null, name string);
        |CREATE QUERY active AS SELECT id FROM users WHERE name IS NOT NULL;
        |CREATE FIELDSET info(from users AS u) AS SELECT u.id AS uid;
        |""".stripMargin)
    assert(decls.length == 3)
    val DeclTable(tn, cols) = decls(0): @unchecked
    assert(tn == "users")
    assert(cols == List(
      ColumnDef("id", Ty(TyName("INT"), nullable = false)),
      ColumnDef("name", Ty(TyName("STRING"), nullable = true))))
    assert(decls(1).isInstanceOf[DeclQuery])
    val DeclFieldset(fn, fs) = decls(2): @unchecked
    assert(fn == "info" && fs.args.map(_._1) == List("u"))
    assert(fs.exprs == List(("uid", ENav("u", EName("id")))))
  }

  test("comments and quoted identifiers") {
    assert(Parser.parseExpr("a -- trailing comment\n + b") ==
      EApp("+", List(EName("a"), EName("b"))))
    assert(Parser.parseExpr("\"weird name\"") == EName("weird name"))
  }

  test("type lattice: lub, glb, subsumes") {
    val intN = Ty(TyName("INT"), nullable = false)
    val floatNull = Ty(TyName("FLOAT"), nullable = true)
    assert(tyLub(intN, floatNull) ==
      Ty(TyOneOf(None, List("INT", "FLOAT")), nullable = true))
    assert(tyGlb(Ty(NUMERIC, nullable = true), intN) == intN.copy(nullable = false))
    assert(subsumes(intN, Ty(NUMERIC, nullable = true)) == intN)
    intercept[SqlppError](subsumes(floatNull, intN))
    intercept[SqlppError](
      tyGlb(Ty(TyName("STRING"), nullable = true), intN))
  }
}
