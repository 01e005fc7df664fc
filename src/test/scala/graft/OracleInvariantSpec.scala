package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical checks on the declared-query/oracle surface that no
  * Spark session is needed for.
  */
class OracleInvariantSpec extends AnyFunSuite {

  test("every declared query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o, s"queries without oracle: ${q -- o}; oracles without query: ${o -- q}")
  }

  test("every ', 6) AS ' in the raw oracle SQL closes a round() call") {
    // SparkEntry.normNegZero textually rewrites ', 6) AS ' to
    // ', 6) + 0 AS ' (signed-zero normalization). That is only sound if
    // every such site is the closing of round(..., 6) — e.g. a future
    // `substr(text, 1, 6) AS p` would be silently turned into
    // arithmetic. Walk back from each site balancing parentheses and
    // require the call being closed to be round(.
    val marker = ", 6) AS "
    SparkEntry.rawOracleSql.foreach { case (name, sql) =>
      var from = sql.indexOf(marker)
      while (from >= 0) {
        val closeIdx = sql.indexOf(')', from) // the ')' inside the marker
        var depth = 0
        var i = closeIdx
        var open = -1
        while (open < 0 && i >= 0) {
          sql.charAt(i) match {
            case ')' => depth += 1
            case '(' =>
              depth -= 1
              if (depth == 0) open = i
            case _ => ()
          }
          i -= 1
        }
        assert(open > 0, s"$name: unbalanced parens before offset $from")
        val callee = sql.substring(math.max(0, open - 16), open)
        assert(callee.endsWith("round"),
          s"$name: ', 6) AS ' at offset $from closes `...$callee(` — not round(); " +
            "normNegZero would corrupt this expression")
        from = sql.indexOf(marker, from + 1)
      }
    }
  }
}
