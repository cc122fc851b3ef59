package graft.frontend
import org.scalatest.funsuite.AnyFunSuite
class ReportSpec extends AnyFunSuite {
  test("parse errors carry line/column and a snippet") {
    val err = intercept[Syntax.SqlppError](Parser.parseQuery(
      "select a,\nfrom t wher x = 1"))
    assert(err.msg.contains("line 2"), err.msg)
    assert(err.msg.contains("⮬"), err.msg)
    assert(err.msg.contains("from t wher x = 1"), err.msg)
  }
  test("error column points at the offending token") {
    val err = intercept[Syntax.SqlppError](Parser.parseExpr("a + + b"))
    assert(err.msg.contains("line 1, character 5"), err.msg)
  }
}
