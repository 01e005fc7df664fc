package graft.tools

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Mechanical bench adjudication (r17 verdict #3): given two
  * `bench_out.json` records (old, new), print every query whose
  * noise-adjusted wall regressed >1.5x (and >0.5 s absolute — sub-ms
  * jitter must not page anyone), with the gc / steal / task /
  * chain-build side-channel deltas that attribute it, and a verdict
  * line per row plus an overall call: WINDOW (host contention) vs
  * PLAN-SUSPECT (the engine's own regression). This replaces the
  * hand-derivation the builder and judge each re-did every round —
  * the round-17 case (driver +11%, five >1.5x rows, all adjudicated
  * window by steal/task reasoning in prose) is exactly what this
  * prints now.
  *
  * Attribution rules, in precedence order (Bench.scala documents the
  * same witnesses):
  *  1. chain-build delta covers most of the wall delta -> the
  *     one-time session-staged build moved onto this query (an
  *     ordering artifact, not a regression).
  *  2. task-sum flat (<=1.3x) while wall inflated -> the task threads
  *     were idle-starved: scheduler/steal window.
  *  3. gc delta covers most of the wall delta -> GC pressure (look at
  *     heap, not plans).
  *  4. task-sum rose with the wall -> either hypervisor starvation of
  *     running threads (steal rising says so) or a real plan change;
  *     flagged PLAN-SUSPECT when steal is flat — the only rows a
  *     human needs to read.
  */
object BenchCompare {

  private[tools] final case class Rec(
      total: Double,
      walls: Map[String, Double],
      gc: Map[String, Long],
      steal: Map[String, Long],
      task: Map[String, Long],
      chain: Map[String, Long],
      stealTotal: Long,
      cpus: String)

  private def longMap(n: JsonNode, field: String): Map[String, Long] = {
    val m = n.path("meta").path(field)
    if (m.isMissingNode) Map.empty
    else m.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
  }

  private def load(path: String): Rec = {
    val n = new ObjectMapper().readTree(new java.io.File(path))
    val walls = n.path("queries").properties().asScala
      .map(e => e.getKey -> math.abs(e.getValue.asDouble())).toMap
    Rec(
      n.path("value").asDouble(),
      walls,
      longMap(n, "gc_ms"),
      longMap(n, "steal_ms"),
      longMap(n, "task_ms"),
      longMap(n, "chain_build_ms"),
      n.path("meta").path("steal_ms_total").asLong(),
      n.path("meta").path("bench_cpus").asText("?"))
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 2,
      "usage: BenchCompare <old bench_out.json> <new bench_out.json>")
    println(compare(load(args(0)), load(args(1))))
  }

  /** The full adjudication report — pure so BenchCompareSpec can pin
    * each attribution rule on synthetic records.
    */
  private[tools] def compare(a: Rec, b: Rec): String = {
    val out = new StringBuilder
    def println(s: String): Unit = out.append(s).append('\n')
    val common = a.walls.keySet intersect b.walls.keySet
    val commonA = common.toSeq.map(a.walls).sum
    val commonB = common.toSeq.map(b.walls).sum
    println(f"old: total ${a.total}%.1f s  (steal ${a.stealTotal} ms, cpus ${a.cpus})")
    println(f"new: total ${b.total}%.1f s  (steal ${b.stealTotal} ms, cpus ${b.cpus})")
    println(f"common ${common.size} queries: ${commonA}%.1f -> ${commonB}%.1f s " +
      f"(${(commonB / math.max(commonA, 1e-9) - 1) * 100}%+.1f%%)")
    (a.walls.keySet diff b.walls.keySet).toSeq.sorted
      .foreach(q => println(s"  only in old: $q"))
    (b.walls.keySet diff a.walls.keySet).toSeq.sorted
      .foreach(q => println(s"  only in new: $q"))

    var window = 0
    var planSuspect = 0
    val flagged = common.toSeq
      .map(q => (q, a.walls(q), b.walls(q)))
      .filter { case (_, wa, wb) =>
        wb / math.max(wa, 1e-9) > 1.5 && wb - wa > 0.5 }
      .sortBy { case (_, wa, wb) => -(wb - wa) }
    if (flagged.isEmpty) println("\nno per-query regressions >1.5x (and >0.5s)")
    else println(f"\n${flagged.size} quer${if (flagged.size == 1) "y" else "ies"} regressed >1.5x:")
    flagged.foreach { case (q, wa, wb) =>
      val dWallMs = (wb - wa) * 1000.0
      val dGc = b.gc.getOrElse(q, 0L) - a.gc.getOrElse(q, 0L)
      val dSteal = b.steal.getOrElse(q, 0L) - a.steal.getOrElse(q, 0L)
      val ta = a.task.getOrElse(q, 0L); val tb = b.task.getOrElse(q, 0L)
      val dChain = b.chain.getOrElse(q, 0L) - a.chain.getOrElse(q, 0L)
      val taskRatio = tb.toDouble / math.max(ta.toDouble, 1.0)
      val verdict =
        if (dChain > 0.7 * dWallMs) { window += 1; "WINDOW (chain build moved here)" }
        else if (taskRatio <= 1.3) { window += 1; "WINDOW (task-sum flat; threads starved idle)" }
        else if (dGc > 0.5 * dWallMs) { window += 1; "WINDOW (GC pressure)" }
        else if (dSteal > 1000) { window += 1; "WINDOW (steal rose with task-sum: hypervisor starvation)" }
        else { planSuspect += 1; "PLAN-SUSPECT (task-sum rose, steal/gc flat) <- read this one" }
      println(f"  $q%-34s ${wa}%6.2f -> ${wb}%6.2f s (${wb / math.max(wa, 1e-9)}%4.2fx)  " +
        f"task ${ta}%d->${tb}%d ms (${taskRatio}%4.2fx)  gc +${dGc}%d  steal +${dSteal}%d  " +
        f"chain +${dChain}%d  :: $verdict")
    }
    val call =
      if (planSuspect > 0)
        s"VERDICT: $planSuspect plan-suspect row(s) -- bisect with PerfProbe before accepting"
      else if (flagged.nonEmpty)
        s"VERDICT: all ${flagged.size} regressions attribute to the window -- " +
          "per-query cost is flat; not an engine regression"
      else
        "VERDICT: flat -- no adjudication needed"
    println("" + call)
    out.toString
  }
}
