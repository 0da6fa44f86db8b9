package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Authoring-convention lint over the FENCED oracle SQL (`SparkEntry
 * .oracleSql`, i.e. `materializeCtes`' output). The fence regex at
 * SparkEntry.materializeCtes is safe only under two conventions this
 * spec machine-checks — previously they held by review alone:
 *
 *  1. recursive CTE members carry a COLUMN LIST (`reach(src,dst) AS (`)
 *     so the fence regex cannot match them — if one ever loses its list,
 *     `MATERIALIZED` gets injected into a self-referencing member and
 *     DuckDB rejects the whole oracle;
 *  2. every plain CTE body opens with uppercase `SELECT` one space after
 *     `AS` — anything else (lowercase `select`, double space, newline)
 *     silently dodges the fence and reintroduces the exponential CTE
 *     re-evaluation that zeroed the r9 correctness artifact to `{}`.
 *
 * The lint classifies every `name [cols] AS [MATERIALIZED] (` site in
 * every oracle and fails on the two silent shapes:
 *   - fenced body that references its own name (convention 1 broke);
 *   - unfenced, column-list-free body that is not a named-window clause
 *     (convention 2 broke — the fence was dodged).
 * Unfenced column-listed members must self-reference (truly recursive);
 * a non-recursive member hiding behind a column list would re-evaluate
 * per reference site, so that fails too.
 */
class OracleLintSpec extends AnyFunSuite {

  /** `name` or `name(col, …)` followed by `AS [MATERIALIZED] (` — any
    * spacing/case, deliberately LOOSER than the production fence regex so
    * sites the fence silently skipped still get classified here. */
  private val site =
    """(?is)\b(\w+)\s*(\([^()]*\))?\s+AS\s+(MATERIALIZED\s+)?\(""".r

  /** Body of the group opened at `open` (index of '('), with
    * single-quoted SQL literals skipped so parens inside regex/string
    * literals (y-family tokenizers) can't unbalance the scan. */
  private def balancedBody(sql: String, open: Int): String = {
    var i = open; var depth = 0; var inStr = false
    val start = open + 1
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return sql.substring(start, i)
        case _ => ()
      }
      i += 1
    }
    sql.substring(start) // unbalanced — caller's assertion message will show it
  }

  /** The name used in TABLE position (`FROM name` / `JOIN name`) — a
    * column or alias coincidentally named like the CTE (x6's `nn` norm
    * column, y15's `tf` alias) is not a recursive reference. */
  private def selfRefs(body: String, name: String): Boolean =
    ("""(?i)\b(?:FROM|JOIN)\s+""" + java.util.regex.Pattern.quote(name) + """\b""").r
      .findFirstIn(body).isDefined

  private def isWindowSpec(body: String): Boolean = {
    val t = body.trim.toUpperCase
    t.startsWith("PARTITION BY") || t.startsWith("ORDER BY") ||
      t.startsWith("ROWS") || t.startsWith("RANGE")
  }

  private def problemsIn(qname: String, sql: String): Seq[String] = {
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    for (m <- site.findAllMatchIn(sql)) {
      val cteName = m.group(1)
      val hasColList = m.group(2) != null
      val fenced = m.group(3) != null
      val body = balancedBody(sql, m.end - 1)
      if (fenced && selfRefs(body, cteName))
        problems += s"$qname: MATERIALIZED injected into self-referencing member '$cteName' — DuckDB will reject; give it a column list"
      else if (!fenced && hasColList && !selfRefs(body, cteName))
        problems += s"$qname: column-listed member '$cteName' is not recursive but dodged the fence — it re-evaluates per reference; drop the column list"
      else if (!fenced && !hasColList && !isWindowSpec(body))
        problems += s"$qname: '$cteName AS (' dodged the fence (body opens '${body.trim.take(30)}…') — author CTE bodies as 'name AS (SELECT' exactly"
    }
    // recursive oracles must keep at least one column-listed member —
    // a rewrite that drops recursion markers entirely should be loud
    if (sql.toUpperCase.contains("WITH RECURSIVE") &&
        !site.findAllMatchIn(sql).exists(_.group(2) != null))
      problems += s"$qname: WITH RECURSIVE but no column-listed member found"
    problems.toSeq
  }

  test("every oracle CTE is fenced, window, or genuinely recursive with a column list") {
    val problems = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .flatMap { case (q, sql) => problemsIn(q, sql) }
    assert(problems.isEmpty, problems.mkString("\n"))
  }

  test("the lint itself catches each convention break (mutation check)") {
    // 1. recursive member that lost its column list → the fence regex
    //    would inject MATERIALIZED into it → must be flagged
    val brokenRecursive =
      """WITH RECURSIVE walk AS MATERIALIZED (SELECT 1 AS n UNION ALL
        |  SELECT n + 1 FROM walk WHERE n < 5) SELECT * FROM walk""".stripMargin
    assert(problemsIn("t", brokenRecursive).exists(_.contains("injected")),
      "lint must flag MATERIALIZED on a self-referencing member")
    // 2. CTE body dodging the fence (lowercase select / extra space) →
    //    exponential re-evaluation risk → must be flagged
    val dodgedFence =
      "WITH heavy AS (select x FROM t) SELECT * FROM heavy JOIN heavy h2 USING (x)"
    assert(problemsIn("t", dodgedFence).exists(_.contains("dodged")),
      "lint must flag an unfenced plain CTE")
    // 3. non-recursive member hiding behind a column list → silently
    //    unfenced → must be flagged
    val hidden =
      "WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM r WHERE n<3), " +
        "heavy(x) AS (SELECT n FROM r) SELECT * FROM heavy"
    assert(problemsIn("t", hidden).exists(_.contains("not recursive")),
      "lint must flag a column-listed non-recursive member")
    // 4. control: a well-formed fenced oracle with a window clause and a
    //    real recursive member produces no findings
    val good =
      """WITH RECURSIVE reach(src, dst) AS (SELECT s, d FROM e UNION ALL
        |  SELECT r.src, e.d FROM reach r JOIN e ON e.s = r.dst),
        |agg AS MATERIALIZED (SELECT src, count(*) AS c FROM reach GROUP BY src)
        |SELECT src, c, rank() OVER w AS rk FROM agg
        |WINDOW w AS (PARTITION BY src ORDER BY c)""".stripMargin
    assert(problemsIn("t", good).isEmpty, problemsIn("t", good).mkString("\n"))
  }

  test("the fence engaged on every oracle that has a plain CTE") {
    // belt-and-braces count check from the ADVICE: per oracle, every
    // ' AS (' site is either MATERIALIZED, a window spec, or recursive —
    // so the count of fence-eligible sites must equal the fenced count
    for ((qname, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)) {
      val sites = site.findAllMatchIn(sql).toSeq
      val fenceEligible = sites.count { m =>
        m.group(2) == null && !isWindowSpec(balancedBody(sql, m.end - 1))
      }
      val fenced = sites.count(_.group(3) != null)
      assert(fenceEligible == fenced,
        s"$qname: $fenceEligible fence-eligible CTE sites but only $fenced fenced")
    }
  }
}
