package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical checks on the declared-query/oracle surface that no
  * Spark session is needed for.
  */
class OracleInvariantSpec extends AnyFunSuite {

  /** Queries DELIBERATELY without a SQL oracle — each must have a
    * reason a DuckDB mirror cannot exist and a spec that carries its
    * correctness instead. Additions to this set are a design decision,
    * not a convenience: the default contract is oracle-per-query.
    */
  private val oracleless: Map[String, String] = Map.empty
  // Round 10 emptied the set: the OPQ family (the only members) became
  // hash-checkable once Verify started dumping the trained rotation as
  // a parquet fixture ({OPQROT}) that the oracle applies as a matmul —
  // the eigensolve still has no SQL spelling, but everything downstream
  // of its OUTPUT is replayed from scratch in DuckDB, and OpqSpec keeps
  // pinning the rotation math itself (orthogonality, reconstruction,
  // allocation, distance preservation, recall >= plain PQ).

  test("every declared query has an oracle (or a documented spec) and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(oracleless.keySet.subsetOf(q),
      s"oracleless allowlist names unknown queries: ${oracleless.keySet -- q}")
    assert(o.intersect(oracleless.keySet).isEmpty,
      s"allowlisted as oracle-less but an oracle exists: ${o.intersect(oracleless.keySet)}")
    assert(q -- oracleless.keySet == o,
      s"queries without oracle: ${q -- o -- oracleless.keySet}; oracles without query: ${o -- q}")
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
