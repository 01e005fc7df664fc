package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins each BenchCompare attribution rule on synthetic records — the
  * mechanical replacement for the prose adjudication the builder and
  * judge re-derived every round (r17 verdict #3).
  */
class BenchCompareSpec extends AnyFunSuite {

  private def rec(
      walls: Map[String, Double],
      gc: Map[String, Long] = Map.empty,
      steal: Map[String, Long] = Map.empty,
      task: Map[String, Long] = Map.empty,
      chain: Map[String, Long] = Map.empty) =
    BenchCompare.Rec(
      walls.values.sum, walls, gc, steal, task, chain, 0L, "4")

  test("flat runs produce the flat verdict and no flagged rows") {
    val a = rec(Map("q1" -> 1.0, "q2" -> 2.0), task = Map("q1" -> 4000L, "q2" -> 8000L))
    val b = rec(Map("q1" -> 1.1, "q2" -> 2.1), task = Map("q1" -> 4100L, "q2" -> 8200L))
    val r = BenchCompare.compare(a, b)
    assert(r.contains("no per-query regressions"))
    assert(r.contains("VERDICT: flat"))
  }

  test("sub-threshold ratio or sub-0.5s delta never flags") {
    // 1.4x on a big query; 3x on a 0.1s query — both below the gate
    val a = rec(Map("big" -> 10.0, "tiny" -> 0.1))
    val b = rec(Map("big" -> 14.0, "tiny" -> 0.3))
    assert(BenchCompare.compare(a, b).contains("no per-query regressions"))
  }

  test("wall inflation with a flat task-sum attributes to the window") {
    val a = rec(Map("q" -> 1.0), task = Map("q" -> 4000L))
    val b = rec(Map("q" -> 3.0), task = Map("q" -> 4200L))
    val r = BenchCompare.compare(a, b)
    assert(r.contains("WINDOW (task-sum flat"))
    assert(r.contains("regressions attribute to the window"))
  }

  test("chain-build delta covering the wall delta attributes to chain movement") {
    val a = rec(Map("q" -> 1.0), task = Map("q" -> 4000L), chain = Map("q" -> 0L))
    val b = rec(Map("q" -> 3.0), task = Map("q" -> 12000L), chain = Map("q" -> 1900L))
    val r = BenchCompare.compare(a, b)
    assert(r.contains("WINDOW (chain build moved here)"))
  }

  test("task-sum rising with flat steal/gc is the one PLAN-SUSPECT case") {
    val a = rec(Map("q" -> 1.0), task = Map("q" -> 4000L))
    val b = rec(Map("q" -> 3.0), task = Map("q" -> 12000L))
    val r = BenchCompare.compare(a, b)
    assert(r.contains("PLAN-SUSPECT"))
    assert(r.contains("VERDICT: 1 plan-suspect row(s)"))
  }

  test("steal rising alongside the task-sum attributes to hypervisor starvation") {
    val a = rec(Map("q" -> 1.0), task = Map("q" -> 4000L), steal = Map("q" -> 100L))
    val b = rec(Map("q" -> 3.0), task = Map("q" -> 12000L), steal = Map("q" -> 9000L))
    val r = BenchCompare.compare(a, b)
    assert(r.contains("WINDOW (steal rose"))
  }

  test("queries present on only one side are listed, not compared") {
    val a = rec(Map("gone" -> 1.0, "q" -> 1.0))
    val b = rec(Map("fresh" -> 1.0, "q" -> 1.0))
    val r = BenchCompare.compare(a, b)
    assert(r.contains("only in old: gone") && r.contains("only in new: fresh"))
    assert(r.contains("common 1 queries"))
  }
}
