package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench honesty: a broken query must surface under "errors" with its
  * exception text — never as a (fast) timing in "queries". */
class BenchJsonSpec extends AnyFunSuite {

  test("failed query lands in errors, not in queries/rows") {
    val json = Bench.renderJson(Seq(
      ("good_query", 1.25, Right(42L)),
      ("broken_query", 0.01, Left("AnalysisException: column \"nope\" missing"))),
      "/tmp/sf")
    assert(json.contains(""""queries":{"good_query":1.25}"""))
    assert(json.contains(""""rows":{"good_query":42}"""))
    assert(json.contains(""""errors":{"broken_query":"AnalysisException"""))
    assert(!json.contains(""""broken_query":0.01"""),
      "a broken query must never be reported as a timing")
    // quotes in the exception text are escaped -> the line stays valid JSON
    assert(json.contains("""column \"nope\" missing"""))
  }

  test("control characters in exception text are flattened to spaces") {
    // \b, \f, NUL would pass a naive \n\r\t-only filter and break the
    // driver's JSON parse of the errors map
    val json = Bench.renderJson(Seq(
      ("q", 0.5, Left("bad\b\f\u0000\u001ftext\nline2"))), "/tmp/sf")
    assert(json.contains(""""errors":{"q":"bad    text line2"}"""))
    assert(!json.exists(c => c < ' '), "emitted line must contain no raw control chars")
  }

  test("total sums only successful queries") {
    val json = Bench.renderJson(Seq(
      ("a", 2.0, Right(1L)), ("b", 100.0, Left("boom")), ("c", 3.0, Right(2L))),
      "/tmp/sf")
    assert(json.contains(""""value":5.0"""))
  }
}
