package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench stdout handshake: the driver parses only the last
  * ~2,000 captured characters of bench stdout (BENCH_r08's lesson —
  * the full line reached stdout but its `{"metric"` opener fell
  * outside the tail and `parsed` stayed null). The compact line must
  * therefore stay inside that window no matter how the declared query
  * inventory grows; this spec rebuilds it from the REAL query names
  * with worst-case numeric widths so a silently-fattening line fails
  * a test instead of a round.
  */
class BenchLineSpec extends AnyFunSuite {

  test("compact stdout line stays under the driver's 2000-char tail window") {
    // Worst case: every query failed (negated wall, widest sign+digits)
    // at a 4-digit wall with full 3dp precision, and a deep absolute
    // out path -- Bench.main takes the path from SPARK_GRAFT_BENCH_OUT,
    // so a long runtime path must not eat the margin unchecked (a
    // ~120-char path bounds any plausible driver temp dir).
    val chosen = SparkEntry.queries.keys.toSeq.map(n => n -> -9999.999)
    val longOut = "/" + Seq.fill(11)("driver-scratch").mkString("/") +
      "/bench_out.json"
    assert(longOut.length >= 120)
    val line = Bench.compactLine(
      chosen,
      total = 999999.999,
      rawTotal = 999999.999,
      sf = "/root/testdata/sf0.1",
      nFailed = chosen.size,
      stealTotal = 99999999L,
      out = longOut,
      cpus = 32)
    // 100-char margin below the hard 2000 so drift is caught early.
    assert(line.length < 1900, s"compact bench line is ${line.length} chars")
    assert(line.startsWith("""{"metric":"total""""))
  }
}
