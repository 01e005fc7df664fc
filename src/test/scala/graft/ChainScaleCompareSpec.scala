package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins each ChainScaleCompare gate on synthetic records — the
  * chain-build sibling of [[BenchCompareSpec]] (r18 verdict #4's
  * adjudication half).
  */
class ChainScaleCompareSpec extends AnyFunSuite {

  private def stage(
      cpu: Map[Int, Double], alphas: Map[String, Double]) =
    ChainScaleCompare.Stage(cpu, alphas)

  private val lin = Map("1->10" -> 1.0, "10->100" -> 1.0)

  test("flat records produce the CLEAN verdict") {
    val a = Map("c.s" -> stage(Map(1 -> 1.0, 10 -> 10.0, 100 -> 100.0), lin))
    val b = Map("c.s" -> stage(Map(1 -> 1.1, 10 -> 10.5, 100 -> 104.0), lin))
    val r = ChainScaleCompare.compare(a, b)
    assert(r.contains("verdict: CLEAN"), r)
  }

  test("top-tier cpu regression flags REGRESSED above both gates only") {
    val a = Map("c.s" -> stage(Map(100 -> 100.0), lin))
    val b = Map("c.s" -> stage(Map(100 -> 160.0), lin))
    assert(ChainScaleCompare.compare(a, b).contains("REGRESSED 1.60x"))
    // 2x but only 4 cpu-s absolute: below the 5 cpu-s gate
    val c = Map("c.s" -> stage(Map(100 -> 4.0), lin))
    val d = Map("c.s" -> stage(Map(100 -> 8.0), lin))
    assert(ChainScaleCompare.compare(c, d).contains("verdict: CLEAN"))
  }

  test("alpha rising past the band flags ALPHA-UP on the decade that moved") {
    val a = Map("c.s" -> stage(Map(100 -> 100.0), lin))
    val b = Map("c.s" -> stage(Map(100 -> 101.0),
      Map("1->10" -> 1.05, "10->100" -> 1.22)))
    val r = ChainScaleCompare.compare(a, b)
    assert(r.contains("ALPHA-UP 10->100 +0.22"), r)
    assert(!r.contains("ALPHA-UP 1->10"), r)
  }

  test("worst new decade past 1.3 flags SUPER-LINEAR even when old agreed") {
    val hot = Map("1->10" -> 1.35, "10->100" -> 1.35)
    val a = Map("c.s" -> stage(Map(100 -> 100.0), hot))
    val b = Map("c.s" -> stage(Map(100 -> 100.0), hot))
    assert(ChainScaleCompare.compare(a, b).contains("SUPER-LINEAR 1.35"))
  }

  test("shuffle-write growth past both gates flags BYTES-UP; noise-band growth does not") {
    val a = Map("c.s" -> ChainScaleCompare.Stage(
      Map(100 -> 100.0), lin, Map(100 -> 1000.0)))
    val b = Map("c.s" -> ChainScaleCompare.Stage(
      Map(100 -> 101.0), lin, Map(100 -> 1400.0)))
    assert(ChainScaleCompare.compare(a, b).contains("BYTES-UP 1.40x (1000 -> 1400 MB)"))
    // 2x but only 80 MB absolute: below the 100 MB gate
    val c = Map("c.s" -> ChainScaleCompare.Stage(
      Map(100 -> 100.0), lin, Map(100 -> 80.0)))
    val d = Map("c.s" -> ChainScaleCompare.Stage(
      Map(100 -> 100.0), lin, Map(100 -> 160.0)))
    assert(ChainScaleCompare.compare(c, d).contains("verdict: CLEAN"))
    // records without the field (pre-r19 artifacts) never flag
    val e = Map("c.s" -> ChainScaleCompare.Stage(Map(100 -> 100.0), lin))
    assert(ChainScaleCompare.compare(e, b).contains("verdict: CLEAN"))
  }

  test("disjoint tier sets flag NO SHARED TIER instead of a fake 0.0 CLEAN row") {
    val a = Map("c.s" -> stage(Map(1 -> 1.0, 10 -> 10.0), lin))
    val b = Map("c.s" -> stage(Map(100 -> 100.0), lin))
    val r = ChainScaleCompare.compare(a, b)
    assert(r.contains("NO SHARED TIER"), r)
    assert(r.contains("old 1/10x vs new 100x"), r)
    assert(!r.contains("cpu@0x"), r)
    assert(r.contains("1 stage(s) flagged"), r)
  }

  test("stage churn is reported, never crashed on") {
    val a = Map("old.only" -> stage(Map(100 -> 1.0), lin))
    val b = Map("new.only" -> stage(Map(100 -> 1.0), lin))
    val r = ChainScaleCompare.compare(a, b)
    assert(r.contains("new.only") && r.contains("NEW STAGE"))
    assert(r.contains("old.only") && r.contains("DROPPED"))
  }

  test("the committed artifact loads and adjudicates against itself CLEAN") {
    val s = ChainScaleCompare.load("chainscale_out.json")
    assert(s.contains("knn.working_list") && s.size >= 14)
    val knn = s("knn.working_list")
    assert(knn.tiers.keySet == Set(1, 10, 100))
    // self-compare is by construction flag-free UNLESS a committed
    // stage is already super-linear — which is itself worth failing on
    val r = ChainScaleCompare.compare(s, s)
    assert(r.contains("verdict: CLEAN"), r)
  }
}
