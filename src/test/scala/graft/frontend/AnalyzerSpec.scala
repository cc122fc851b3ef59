package graft.frontend

import org.scalatest.funsuite.AnyFunSuite
import Syntax._
import Analyzer._

/** Ports of the reference's golden analyzer tests (reference
  * test/sqlpp: infer.t, group_by.t, nested.t, optional_fields.t,
  * compose.t), asserting inferred row types, param types, generated
  * field naming and pruning against the same fixtures schema
  * (reference test/sqlpp/schema.sql).
  */
class AnalyzerSpec extends AnyFunSuite {

  def freshEnv(): Env = new Env().addDecls(
    """create table users (
      |  id int not null,
      |  name string,
      |  info string not null,
      |  created_at float not null
      |);
      |create table profiles (
      |  user_id int not null,
      |  settings string not null,
      |  info string not null
      |);
      |create fieldset users_fields(from users) as
      |select users.id as user_id, users.name as user_name;
      |create query user_stats as
      |select id as user_id, with count(1) as count, ...
      |from users group by id;
      |""".stripMargin)

  def analyze(src: String): QueryInfo =
    analyzeQuery(freshEnv(), Parser.parseQuery(src))

  def row(src: String): List[(String, String)] =
    analyze(src).row.map { case (n, t) => (n, t.show) }

  def err(src: String): String =
    intercept[SqlppError](analyze(src)).msg

  // ---- infer.t ----

  test("select 1 as x / positional naming") {
    assert(row("select 1 as x") == List("x" -> "INT NOT NULL"))
    assert(row("select 1") == List("_0" -> "INT NOT NULL"))
  }

  test("row types from tables (infer.t:67-76)") {
    assert(row("select id, name from users") ==
      List("id" -> "INT NOT NULL", "name" -> "STRING"))
  }

  test("inner join keeps right non-null (infer.t:44-56)") {
    assert(row("select id, name, user_id from users join profiles on id = user_id") ==
      List("id" -> "INT NOT NULL", "name" -> "STRING",
        "user_id" -> "INT NOT NULL"))
  }

  test("left join makes right scope nullable (infer.t:58-72)") {
    assert(row("select id, name, user_id from users left join profiles on id = user_id") ==
      List("id" -> "INT NOT NULL", "name" -> "STRING",
        "user_id" -> "INT"))
  }

  test("param unification matrix (infer.t:74-149)") {
    def p(src: String): (String, List[(String, String)]) = {
      val info = analyze(src)
      val PtyTy(t) = info.params("x"): @unchecked
      (t.show, info.row.map { case (n, ty) => (n, ty.show) })
    }
    assert(p("select ?x:int not null as x, ?x:int not null as y") ==
      ("INT NOT NULL", List("x" -> "INT NOT NULL", "y" -> "INT NOT NULL")))
    assert(p("select ?x:int null as x, ?x:int null as y") ==
      ("INT", List("x" -> "INT", "y" -> "INT")))
    // glb: non-null wins; earlier occurrence keeps its local ty
    assert(p("select ?x:int null as x, ?x:int not null as y") ==
      ("INT NOT NULL", List("x" -> "INT", "y" -> "INT NOT NULL")))
    assert(p("select ?x:int not null as x, ?x:int as y") ==
      ("INT NOT NULL", List("x" -> "INT NOT NULL", "y" -> "INT NOT NULL")))
  }

  test("duplicate explicit column name is an error (infer.t:151-153)") {
    assert(err("select 1 as x, 2 as x") == "column `x` is already defined")
  }

  test("NULL literal requires ascription (analyze.ml:449)") {
    assert(err("select null") == "missing type annotation for NULL value")
    assert(row("select null:int as x") == List("x" -> "INT"))
    assert(err("select null:int not null as x")
      .contains("expected value of type INT NOT NULL but got NULL"))
  }

  // ---- group_by.t ----

  test("aggregate without GROUP BY is an error (group_by.t:4-14)") {
    assert(err("select count(1)")
      == "aggregate function `count(..)` is not allowed without GROUP BY")
    assert(err("select count(1) from users")
      == "aggregate function `count(..)` is not allowed without GROUP BY")
  }

  test("GROUP BY () enables global aggregation (group_by.t:17-21)") {
    assert(row("select count(1) from users group by ()") ==
      List("_0" -> "INT NOT NULL"))
  }

  test("nested aggregates are forbidden (group_by.t:23-27)") {
    assert(err("select count(count(1)) from users group by ()")
      == "aggregate function `count(..)` is not allowed without GROUP BY")
  }

  test("non-grouped column refs are errors; grouped ones fine (group_by.t:29-60)") {
    assert(err("select count(1), id from users group by ()")
      == "expression `users.id` is not in GROUP BY clause and is not under aggregate function")
    assert(row("select count(1), id from users group by id") ==
      List("_0" -> "INT NOT NULL", "id" -> "INT NOT NULL"))
    assert(row("select count(1), id + id from users group by id") ==
      List("_0" -> "INT NOT NULL", "_1" -> "INT NOT NULL"))
    assert(err("select count(1), id, created_at from users group by id")
      == "expression `users.created_at` is not in GROUP BY clause and is not under aggregate function")
  }

  test("grouping by complex expressions; usage through aggs (group_by.t:62-86)") {
    assert(row("select count(1), id, max(created_at) from users group by id") ==
      List("_0" -> "INT NOT NULL", "id" -> "INT NOT NULL",
        "_2" -> "FLOAT NOT NULL"))
    assert(row("select count(1), id + id from users group by id + id") ==
      List("_0" -> "INT NOT NULL", "_1" -> "INT NOT NULL"))
    // a grouping expression can appear nested inside a larger expr
    assert(row("select count(1), 1 + (id + id) from users group by id + id") ==
      List("_0" -> "INT NOT NULL", "_1" -> "INT NOT NULL"))
  }

  test("sum/min/max type-preserving; count non-null int (analyze.ml:549-554)") {
    assert(row("select sum(created_at), max(id), count(name) from users group by ()") ==
      List("_0" -> "FLOAT NOT NULL", "_1" -> "INT NOT NULL",
        "_2" -> "INT NOT NULL"))
  }

  // ---- nested.t ----

  def topEmission(info: QueryInfo): List[(String, Expr)] = {
    val QSelect(sel) = info.query: @unchecked
    emission(info.scope, sel.proj)
  }

  test("nav into closed subquery reuses fields (nested.t:4-13)") {
    val info = analyze("select x.users.id from (select id from users) as x")
    assert(topEmission(info) ==
      List("id" -> ENav("x", EName("id"))))
    assert(info.row == List("id" -> nonNull(INT)))
  }

  test("closed subquery forbids new expressions (nested.t:15-24)") {
    assert(err("select x.(id + id) from (select id from users) as x")
      == "subquery `x` doesn't allow to build new expressions inside")
  }

  test("open subquery generated fields + reuse (nested.t:26-42)") {
    val info = analyze(
      "select id, x.id, x.users.id from (select id, ... from users) as x")
    // all three resolve to the same inner field; outer names: id, _1, _2
    assert(topEmission(info) == List(
      "id" -> ENav("x", EName("id")),
      "_1" -> ENav("x", EName("id")),
      "_2" -> ENav("x", EName("id"))))
    // inner emission stays a single column
    val sub = info.scope.scopes.collectFirst {
      case ("x", SElem(s, _)) => s
    }.get
    val QSelect(sel) = info.query: @unchecked
    val FromSingle(FromSelect(innerSel, _)) = sel.from.get: @unchecked
    assert(emission(sub, innerSel.proj) ==
      List("id" -> ENav("users", EName("id"))))
  }

  test("deep nav chain with arithmetic pushdown (nested.t:44-90)") {
    val info = analyze(
      """select
        |  x.y.users.id, x.y.id, x.id,
        |  x.(id + y.id + y.users.id),
        |  x.y.users.created_at,
        |  stats.count(1), stats.max(id),
        |from (
        |  select y.id as id, ...
        |  from (select users.id as id, ... from users) as y
        |) as x
        |join (select id, ... from users group by id) as stats
        |on x.id = stats.id""".stripMargin)
    assert(topEmission(info).map(_._1) ==
      List("id", "_1", "_2", "_3", "created_at", "_5", "_6"))
    // x's emission: id, _1 (arith), _2 (created_at chain)
    val x = info.scope.scopes.collectFirst {
      case ("x", SElem(s, _)) => s
    }.get
    val arith = x.fields("_1")
    assert(arith.expr == EApp("+", List(
      EApp("+", List(ENav("y", EName("id")), ENav("y", EName("id")))),
      ENav("y", EName("id")))))
    // stats gained generated agg fields _1/_2 (remote aggregation)
    val stats = info.scope.scopes.collectFirst {
      case ("stats", SElem(s, _)) => s
    }.get
    assert(stats.fields("_1").expr == EApp("count", List(ELit(LitInt(1)))))
    assert(stats.fields("_2").expr ==
      EApp("max", List(ENav("users", EName("id")))))
  }

  // ---- optional_fields.t ----

  test("lazy fields pruned unless referenced (optional_fields.t:4-31)") {
    val info = analyze(
      """select one, three, five
        |from (
        |  select with 1 as one, with 2 as two, with 3 as three,
        |         with 4 as four, with 5 as five, with 6 as six,
        |) as q""".stripMargin)
    val q = info.scope.scopes.collectFirst {
      case ("q", SElem(s, _)) => s
    }.get
    assert(q.fields.values.filter(_.isUsed).map(_.name).toSet ==
      Set("one", "three", "five"))
    assert(info.row.map(_._1) == List("one", "three", "five"))
  }

  test("same-scope lazy use copies the expression (optional_fields.t:87-96)") {
    val info = analyze("select with 1 as x, x+x from users")
    assert(topEmission(info) == List(
      "_1" -> EApp("+", List(ELit(LitInt(1)), ELit(LitInt(1))))))
  }

  test("transitive lazy pruning across scopes (optional_fields.t:33-85)") {
    val q1 = analyze(
      """select q.id
        |from (
        |  select id, with x + x as x,
        |  from (select id, with id as x from users) as u
        |) as q""".stripMargin)
    val q = q1.scope.scopes.collectFirst {
      case ("q", SElem(s, _)) => s }.get
    val u = q.scopes.collectFirst {
      case ("u", SElem(s, _)) => s }.get
    assert(!q.fields("x").isUsed && !u.fields("x").isUsed)

    val q2 = analyze(
      """select q.id, x
        |from (
        |  select id, with x + x as x,
        |  from (select id, with id as x from users) as u
        |) as q""".stripMargin)
    val qq = q2.scope.scopes.collectFirst {
      case ("q", SElem(s, _)) => s }.get
    val uu = qq.scopes.collectFirst {
      case ("u", SElem(s, _)) => s }.get
    assert(qq.fields("x").isUsed && uu.fields("x").isUsed)
  }

  // ---- compose.t ----

  test("named query inlining with per-use pruning (compose.t:3-36)") {
    val info = analyze(
      """select users.id, stats.max(id), stats.count,
        |from users
        |join user_stats as stats on users.id = stats.user_id
        |join user_stats as stats2 on users.id = stats2.user_id""".stripMargin)
    assert(topEmission(info).map(_._1) == List("id", "_1", "count"))
    val stats = info.scope.scopes.collectFirst {
      case ("stats", SElem(s, _)) => s }.get
    val stats2 = info.scope.scopes.collectFirst {
      case ("stats2", SElem(s, _)) => s }.get
    // stats: count used + generated _2 = max(users.id); stats2: count unused
    assert(stats.fields("count").isUsed)
    assert(stats.fields("_2").expr ==
      EApp("max", List(ENav("users", EName("id")))))
    assert(!stats2.fields("count").isUsed)
    assert(info.row == List("id" -> nonNull(INT), "_1" -> nonNull(INT),
      "count" -> nonNull(INT)))
  }

  // ---- fieldset.t ----

  test("fieldset splice resolves against caller scope") {
    val info = analyze("select ...users_fields(users) from users")
    assert(info.row == List("user_id" -> nonNull(INT),
      "user_name" -> nullT(STRING)))
  }

  test("withscope: unqualified names resolve through scope aliases (with-scope.t:49-73)") {
    val info = analyze(
      """select withscope x.y.z as u, name
        |from (select ... from (select ... from (select ... from users) as z) as y) as x""".stripMargin)
    assert(info.row == List("name" -> nullT(STRING)))
    // the name was pushed down the whole chain as generated _0 fields
    assert(topEmission(info) == List("name" -> ENav("x", EName("_0"))))
  }

  test("lazy fieldset fields usable later; clashing explicit name goes positional (fieldset.t:30-43)") {
    val info = analyze(
      "select with ...users_fields(users), user_id from users")
    // user_id is taken by the lazy fieldset field, so the explicit
    // field is auto-named _2; its expr is the same-scope copy users.id
    assert(info.row == List("_2" -> nonNull(INT)))
    assert(topEmission(info) == List("_2" -> ENav("users", EName("id"))))
    assert(!info.scope.fields("user_id").isUsed)
  }

  test("fieldset with table alias arg (fieldset.t:46-56)") {
    val info = analyze(
      "select with ...users_fields(u), user_id from users as u")
    assert(topEmission(info) == List("_2" -> ENav("u", EName("id"))))
  }

  test("fieldset with nested scope path arg (fieldset.t:58-79)") {
    val info = analyze(
      """select with ...users_fields(x.y.users), user_id
        |from (select ... from (select ... from users) as y) as x""".stripMargin)
    assert(info.row.map(_._1) == List("_2"))
    assert(topEmission(info) == List("_2" -> ENav("x", EName("_0"))))
  }

  test("fieldset arity error (fieldset.t:81-87)") {
    assert(err("select ...users_fields() from users")
      == "fieldset ...users_fields expects 1 arguments but 0 provided")
  }

  // ---- expr-in.t / expr-exists.t ----

  test("IN subquery arity and typing") {
    assert(row("select id in (select user_id from profiles) as b from users")
      == List("b" -> "BOOL NOT NULL"))
    assert(err("select (id, name) in (select user_id from profiles) as b from users")
      .contains("number of expressions (2) doesn't match number of columns (1)"))
    assert(err("select name in (select user_id from profiles) as b from users")
      .contains("expected"))
  }

  test("EXISTS subquery types BOOL NOT NULL") {
    assert(row("select exists(select id from users) as b from users")
      == List("b" -> "BOOL NOT NULL"))
  }

  // ---- MATCH variant params ----

  test("MATCH variant param collects Pty_variant and unifies branch types") {
    val info = analyze(
      """select match ?v with
        |  | some ?x -> ?x + 1
        |  | none -> null:int
        |  end as v""".stripMargin)
    assert(info.row == List("v" -> nullT(INT)))
    val PtyVariant(cases) = info.params("v"): @unchecked
    assert(cases.map(_._1).toSet == Set("some", "none"))
    val someArgs = cases.find(_._1 == "some").get._2
    assert(someArgs == List(PtyTy(nullT(INT))))
  }

  // ---- scalar function registry ----

  test("function registry typing") {
    // coalesce glb: any non-null argument makes the result non-null
    assert(row("select nullif(id, 0) as a, coalesce(name, info) as b, " +
      "toString(id) as c, now() as d from users") ==
      List("a" -> "INT", "b" -> "STRING NOT NULL", "c" -> "STRING NOT NULL",
        "d" -> "DATETIME NOT NULL"))
    assert(err("select frobnicate(id) from users")
      == "no such function frobnicate")
  }

  test("datetime/date literal validation (analyze.ml:601-620)") {
    assert(row("select datetime('2024-01-02T03:04:05') as t, date('2024-01-02') as d")
      == List("t" -> "DATETIME NOT NULL", "d" -> "DATE NOT NULL"))
    assert(err("select datetime('2024-13-99') as t").contains("invalid datetime"))
    assert(err("select date('nope') as d").contains("invalid date"))
  }

  test("comparison nullability tracks operands (analyze.ml:555-558)") {
    assert(row("select id = 1 as a, name = 'x' as b from users") ==
      List("a" -> "BOOL NOT NULL", "b" -> "BOOL"))
  }

  // ---- DML ----

  test("INSERT arity / type / missing-column checks (insert.t)") {
    val env = freshEnv()
    def e(src: String): String =
      intercept[SqlppError](
        analyzeQuery(env, Parser.parseQuery(src))).msg
    // ok (insert.t:5-13); params adopt column types (insert.t:29-34)
    analyzeQuery(env, Parser.parseQuery(
      "insert into profiles(user_id, settings, info) values (1, 's', 'i'), (2, 's2', 'i2')"))
    val withParam = analyzeQuery(env, Parser.parseQuery(
      "insert into profiles(user_id, settings, info) values (?id, 's', 'i')"))
    assert(withParam.params("id") == PtyTy(nonNull(INT)))
    assert(e("insert into profiles(user_id, settings) values (1)")
      .contains("number of columns (2) doesn't match number of expressions (1)"))
    assert(e("insert into profiles(user_id) values (1)")
      .contains("missing required columns: settings, info"))
    assert(e("insert into profiles(user_id, settings, info) values (1, 2, 3)")
      .contains("expected"))
    assert(e("insert into profiles(user_id, nope, info) values (1, 'x', 'y')")
      .contains("no such column in table: nope"))
    // RETURNING sees only the target table (insert.t:46-55)
    assert(e("insert into profiles(user_id, settings, info) select id, 's', 'i' from users returning users.id")
      .contains("no such table/query `users`"))
  }

  test("INSERT RETURNING resolves against target table scope (insert.t:46-55)") {
    val info = analyzeQuery(freshEnv(), Parser.parseQuery(
      "insert into profiles(user_id, settings, info) values (1, 's', 'i') returning user_id, info"))
    assert(info.row == List("user_id" -> nonNull(INT),
      "info" -> nonNull(STRING)))
  }

  test("UPDATE set typing + returning (update.t)") {
    val info = analyzeQuery(freshEnv(), Parser.parseQuery(
      "update users set info = 'x' where id = 1 returning id"))
    assert(info.row == List("id" -> nonNull(INT)))
    assert(err("update users set info = null where id = 1")
      .contains("expected value of type STRING NOT NULL but got NULL"))
    assert(err("update users set nope = 'x'")
      .contains("no such column: nope"))
  }

  test("DELETE where must be bool; name errors (delete.t)") {
    val info = analyzeQuery(freshEnv(), Parser.parseQuery(
      "delete from users where id = 1 returning id"))
    assert(info.row == List("id" -> nonNull(INT)))
    assert(err("delete from users where id + 1").contains("expected"))
    assert(err("delete from users where x = 1")
      .contains("no such column: x"))
    assert(err("delete from x").contains("no such table: x"))
  }

  test("UPDATE FROM: unknown table and grouped-subquery agg check (update.t:40-66)") {
    assert(err("update users set id = u.id from x as u where u.id = users.id")
      .contains("no such table x"))
    // the reference runs Check_agg over the UPDATE's FROM clause
    assert(err("update users set id = u.id from (select ... from users group by name) as u where u.id = users.id")
      .contains("is not in GROUP BY clause"))
    // FROM-source columns are referencable from RETURNING (update.t:55-58)
    val info = analyzeQuery(freshEnv(), Parser.parseQuery(
      "update users set id = u.id from users as u where u.id = users.id returning u.id as u_id, users.id as users_id"))
    assert(info.row == List("u_id" -> nonNull(INT),
      "users_id" -> nonNull(INT)))
  }

  test("uncorrelated EXISTS with inner WHERE elaborates (expr-exists.t)") {
    val info = analyze("select exists(select true from users where id = 1)")
    assert(info.row == List("_0" -> nonNull(BOOL)))
  }

  test("LIMIT/OFFSET type checks (select-limit-offset.t)") {
    // offset without limit is allowed (select-limit-offset.t:11-13)
    analyze("select id from users offset 5")
    assert(err("select id from users limit 'x'").contains("expected"))
    assert(err("select id from users limit null:int").contains("expected"))
  }

  test("param inferred from comparison against column (infer.t param-from-context)") {
    val info = analyze("select id from users where id = ?uid")
    assert(info.params("uid") == PtyTy(nullT(INT)))
  }

  // ---- `:- STY` scope/row ascription (README.md:103-186; documented
  // ---- in the reference but unimplemented there — parser has no
  // ---- token for it. Semantics here: analysis-time scopeSubsumes
  // ---- against the elaborated select's scope.)

  test("ascription: row fields check against the select row") {
    assert(row("select id as user_id from users :- (user_id int not null)")
      == List("user_id" -> "INT NOT NULL"))
    // a declared nullable supertype accepts a non-null field
    analyze("select id as user_id from users :- (user_id int)")
    // wrong core type / wrong nullability / unknown field all error
    assert(err("select id as user_id from users :- (user_id string)")
      .contains("ascription mismatch"))
    assert(err("select name from users :- (name string not null)")
      .contains("ascription mismatch"))
    assert(err("select id from users :- (nope int)")
      .contains("no such column"))
  }

  test("ascription: lazy WITH fields are scope members (README.md:149)") {
    // the with-field is never fetched, yet the ascription sees it
    analyze("select with count(1) as count, id from users group by id" +
      " :- (count INT NOT NULL, id int not null)")
  }

  test("ascription: `from NAME` resolves scopes through WITHSCOPE aliases (README.md:113-127)") {
    // README's named-scope-binding example over the test schema
    analyze(
      """select withscope u.users as users, u.name as name
        |from (select name, ... from users) as u
        |:- (from users)""".stripMargin)
    // two scopes re-exported through a nested subselect
    analyze(
      """select withscope q.users as users, withscope q.profiles as profiles, q.user_id as uid
        |from (
        |  select withscope u.users as users, profiles.user_id as user_id, ...
        |  from (select ... from users) as u
        |  join profiles on u.users.id = profiles.user_id
        |) as q
        |:- (from users, from profiles)""".stripMargin)
    // asserting a scope that is not bound errors
    assert(err("select id from users :- (from profiles)")
      .contains("no such scope"))
  }

  test("ascription: every inferred row self-ascribes; any core-type perturbation fails") {
    val queries = List(
      "select id, name from users",
      "select id as user_id, created_at from users where id = 1",
      "select u.id as uid, p.settings as st " +
        "from users as u join profiles as p on u.id = p.user_id",
      "select name, info from users order by id limit 3",
      "select id, count(1) as cnt from users group by id")
    queries.foreach { q =>
      val info = analyze(q)
      val asc = info.row.map { case (n, t) => s"$n ${t.show}" }
        .mkString("(", ", ", ")")
      analyze(s"$q :- $asc") // the inferred row always self-ascribes
      info.row.indices.foreach { i =>
        val bad = info.row.zipWithIndex.map { case ((n2, t2), j) =>
          val shown =
            if (i == j) Ty(if (t2.core == STRING) INT else STRING,
              t2.nullable).show
            else t2.show
          s"$n2 $shown"
        }.mkString("(", ", ", ")")
        assert(err(s"$q :- $bad").contains("ascription mismatch"),
          s"perturbing field $i of: $q")
      }
    }
  }

  test("ascription: structural `from (...) as n` checks the named scope's row (README.md:180-186)") {
    analyze(
      """select u.id as id
        |from users as u
        |:- (from (id int not null, name string) as u)""".stripMargin)
    assert(err(
      """select u.id as id
        |from users as u
        |:- (from (id string) as u)""".stripMargin)
      .contains("ascription mismatch"))
  }
}
