package graft.frontend

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import Syntax._

/** Property tests (SURVEY §5c — an addition over the reference, which
  * has none): printer/parser round-trip over random expression ASTs
  * and lexer totality over printable input.
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sampling driver (scalatestplus is not in the
    * offline cache; raw ScalaCheck generators suffice).
    */
  def forSamples[A](gen: Gen[A], n: Int = 300)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  val genName: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(4, Gen.alphaNumChar)
  } yield (h :: t).mkString

  // keyword collisions would change the token stream
  val safeName: Gen[String] = genName.retryUntil(n =>
    !Set("select", "from", "where", "group", "order", "limit", "offset",
      "and", "or", "not", "null", "in", "exists", "match", "with", "end",
      "as", "on", "by", "is", "true", "false", "asc", "desc", "left",
      "join", "having", "set", "into", "values", "update", "delete",
      "insert", "create", "table", "query", "fieldset", "returning",
      "expr", "key", "primary", "default", "ignore", "replace",
      "conflict", "autoincrement", "withscope").contains(n.toLowerCase))

  def genExpr(depth: Int): Gen[Expr] =
    if (depth <= 0)
      Gen.oneOf(
        Gen.chooseNum(0L, 999999L).map(n => ELit(LitInt(n))),
        Gen.oneOf(true, false).map(b => ELit(LitBool(b))),
        Gen.alphaNumStr.map(s => ELit(LitString(s.take(8)))),
        safeName.map(EName(_)),
        safeName.map(EParam(_)))
    else {
      val sub = genExpr(depth - 1)
      Gen.oneOf(
        sub,
        for {
          op <- Gen.oneOf("+", "-", "*", "/", "=", "!=", ">", "<", ">=",
            "<=", "AND", "OR")
          x <- sub; y <- sub
        } yield EApp(op, List(x, y)),
        sub.map(x => EApp("NOT", List(x))),
        sub.map(x => EApp("-", List(x))),
        sub.map(x => EApp("IS NULL", List(x))),
        sub.map(x => EApp("IS NOT NULL", List(x))),
        for { x <- sub; y <- sub } yield EApp("nullif", List(x, y)),
        for { xs <- Gen.listOfN(2, sub) } yield EApp("coalesce", xs),
        for { n <- safeName; x <- sub } yield ENav(n, x).ensureNavable,
        sub.map(x => EAscribe(x, TyVal(Ty(TyName("INT"), nullable = true)))))
    }

  implicit class NavOps(e: ENav) {
    // navigation to a non-simple expr is fine for the printer (it
    // parenthesizes); keep as-is
    def ensureNavable: Expr = e
  }

  test("printer/parser round-trip is the identity on expression ASTs") {
    forSamples(genExpr(3), 500) { e =>
      val printed = Printer.expr(e)
      val reparsed = try Parser.parseExpr(printed) catch {
        case err: SqlppError =>
          fail(s"parse failed on: $printed\n  ast: $e\n  err: ${err.msg}")
      }
      assert(reparsed == e, s"printed: $printed")
    }
  }

  test("lexer is total on printable ascii (errors are SqlppError, not crashes)") {
    forSamples(Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)) {
      s =>
        try { Lexer.tokenize(s); () }
        catch { case _: SqlppError => () }
    }
  }

  test("type lattice: glb is idempotent and subsumption-consistent") {
    val tys = for {
      core <- Gen.oneOf[TyCore](TyName("INT"), TyName("FLOAT"),
        TyName("STRING"), TyName("BOOL"), NUMERIC)
      n <- Gen.oneOf(true, false)
    } yield Ty(core, n)
    forSamples(tys) { t =>
      assert(tyGlb(t, t) == t)
      assert(subsumes(t, t) == t)
      assert(tyLub(t, t) == t)
    }
    forSamples(Gen.zip(tys, tys)) { case (a, b) =>
      // glb (when defined) is subsumed by both arguments
      val g = try Some(tyGlb(a, b)) catch { case _: SqlppError => None }
      g.foreach { x =>
        assert(subsumes(x, a.asNullable) == x)
        assert(subsumes(x, b.asNullable) == x)
      }
    }
  }
}
