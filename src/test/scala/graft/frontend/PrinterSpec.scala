package graft.frontend

import org.scalatest.funsuite.AnyFunSuite
import Syntax._
import Analyzer._

/** Printer round-trips (parse ∘ print = identity on the AST) and
  * elaborated-print goldens in the reference `sqlpp-analyze` shape
  * (reference test/sqlpp/nested.t).
  */
class PrinterSpec extends AnyFunSuite {

  val roundTripCases: List[String] = List(
    "select 1 as x",
    "select a, b AS bb, WITH c + 1 AS lazyc FROM t AS u LEFT JOIN v ON u.id = v.id WHERE a > 1 GROUP BY a HAVING count(1) > 0 ORDER BY a DESC LIMIT 10 OFFSET 2",
    "select a * (b + c) / d - -e from t",
    "select not (a and b) or c from t",
    "select a is not null, nullif(a, 1) from t",
    "select x in (select a from t), (x, y) in (select a, b from t) from u",
    "select exists (select 1 from t) from u",
    "select ?p: int not null as p, null: string as q",
    "select match ?q with | all -> true | one ?x -> a = ?x end from t",
    "select withscope a.b as c, ...fs(x, y.z), with ...gs from t",
    "select count(1) from t group by ()",
    "insert into t(a, b) values (1, 'x'), (2, 'y') on conflict ignore returning a",
    "insert into t set a = 1, b = 'z'",
    "update t set a = b + 1 from u join v on v.id = u.id where a > 0 returning a",
    "delete from t where a = 1 returning a",
  )

  test("parse-print-parse fixpoint") {
    roundTripCases.foreach { src =>
      val q1 = Parser.parseQuery(src)
      val printed = Printer.query(q1)
      val q2 = Parser.parseQuery(printed)
      assert(q2 == q1, s"round-trip failed for: $src\nprinted: $printed")
    }
  }

  test("operator precedence survives printing") {
    val e1 = Parser.parseExpr("a + b * c")
    assert(Printer.expr(e1) == "a + b * c")
    val e2 = Parser.parseExpr("(a + b) * c")
    assert(Printer.expr(e2) == "(a + b) * c")
    assert(Parser.parseExpr(Printer.expr(e2)) == e2)
    val e3 = Parser.parseExpr("not (a or b)")
    assert(Parser.parseExpr(Printer.expr(e3)) == e3)
  }

  def env(): Env = new Env().addDecls(
    """create table users (
      |  id int not null, name string, info string not null,
      |  created_at float not null);""".stripMargin)

  test("elaborated print matches the reference analyze shape (nested.t:4-13)") {
    val e = env()
    val info = analyzeQuery(e, Parser.parseQuery(
      "select x.users.id from (select id from users) as x"))
    assert(Printer.elaboratedQuery(e, info) ==
      "SELECT x.id AS id FROM (SELECT users.id AS id FROM users) AS x")
  }

  test("elaborated print shows generated fields (nested.t:26-42)") {
    val e = env()
    val info = analyzeQuery(e, Parser.parseQuery(
      "select id, x.id, x.users.id from (select id, ... from users) as x"))
    assert(Printer.elaboratedQuery(e, info) ==
      "SELECT x.id AS id, x.id AS _1, x.id AS _2 " +
        "FROM (SELECT users.id AS id FROM users) AS x")
  }

  test("elaborated print prunes lazy fields (optional_fields.t:87-96)") {
    val e = env()
    val info = analyzeQuery(e, Parser.parseQuery(
      "select with 1 as x, x+x from users"))
    assert(Printer.elaboratedQuery(e, info) ==
      "SELECT 1 + 1 AS _1 FROM users")
  }
}
