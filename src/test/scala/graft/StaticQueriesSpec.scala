package graft

import org.scalatest.funsuite.AnyFunSuite

/** The build-gate analogue of the reference PPX's compile-time
  * rejection: `sbt validateQueries` fails the build when a registered
  * static query is ill-typed; these specs pin both directions without
  * needing a SparkSession.
  */
class StaticQueriesSpec extends AnyFunSuite {

  test("every registered static query analyzes cleanly") {
    val failures = StaticQueries.validate(quiet = true)
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("generated typed-row source is in sync with the registry") {
    val want = StaticQueries.generatedRowsSource()
    val path = java.nio.file.Paths.get(
      "src/main/scala/graft/generated/Rows.scala")
    val have = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    assert(have == want,
      "generated/Rows.scala drifted from StaticQueries.registry — run `sbt validateQueries`")
  }

  test("an ill-typed registered query would fail the build") {
    // same path the sbt task takes, with a poisoned registry entry:
    // comparing FLOAT to INT literal is a dialect type error
    val env = Catalog.env()
    val bad = Map(
      "bad_type" -> "select c_name from customer where c_acctbal > 5",
      "bad_name" -> "select no_such_col from customer",
      "bad_agg" -> "select c_name, count(1) as n from customer")
    val failures = bad.flatMap { case (n, q) =>
      try {
        graft.frontend.Analyzer.analyzeQuery(env,
          graft.frontend.Parser.parseQuery(q))
        None
      } catch {
        case e: graft.frontend.Syntax.SqlppError => Some(n -> e.msg)
      }
    }
    assert(failures.keySet == bad.keySet,
      s"expected all to fail, got: $failures")
  }
}
