package graft.tools

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Mechanical chain-BUILD adjudication (r18 verdict #4, the
  * [[BenchCompare]] stance applied to the ChainScale artifact): given
  * two `chainscale_out.json` records (old, new), print per stage the
  * top-tier cpu ratio and the per-decade cpu-alpha deltas, flagging
  *  - REGRESSED: top-tier cpu grew >1.5× (and >5 cpu-s absolute —
  *    sub-resolution stages must not page anyone),
  *  - ALPHA-UP: any shared decade's cpu alpha rose >0.15 (the
  *    run-to-run band ChainScale's local[4] discipline holds on this
  *    host is ~±0.1),
  *  - SUPER-LINEAR: the new record's worst decade exceeds 1.3 (the
  *    same gate ChainScale itself prints),
  *  - BYTES-UP: top-tier shuffle-write grew >1.3× (and >100 MB
  *    absolute) — the least noisy gate of the four: row counts are
  *    deterministic, so shuffle bytes barely move run to run while
  *    every timing clock swings with the host (r19: this witness is
  *    what caught the prefilter's redundant candidate exchange).
  * cpu-time is the graded timing clock for the same reason it is in
  * ChainScale: wall saturates on small fixtures and task-runtime
  * counts time-sliced waiting on this oversubscribed host.
  *
  * Usage: runMain graft.tools.ChainScaleCompare old.json new.json
  */
object ChainScaleCompare {

  private[tools] final case class Stage(
      tiers: Map[Int, Double],          // scale -> cpu_s
      alphas: Map[String, Double],      // "10->100" -> cpu alpha
      shuf: Map[Int, Double] = Map.empty) // scale -> shuffle-write MB

  private[tools] def load(path: String): Map[String, Stage] = {
    val n = new ObjectMapper().readTree(new java.io.File(path))
    n.path("stages").properties().asScala.map { e =>
      val tierNodes = e.getValue.path("tiers").elements().asScala.toSeq
      val tiers = tierNodes.map(t =>
        t.path("scale").asInt() -> t.path("cpu_s").asDouble()).toMap
      val shuf = tierNodes.collect {
        case t if t.has("shuffle_write_mb") =>
          t.path("scale").asInt() -> t.path("shuffle_write_mb").asDouble()
      }.toMap
      val alphas = e.getValue.path("cpu_alpha").properties().asScala.collect {
        case a if !a.getValue.isNull => a.getKey -> a.getValue.asDouble()
      }.toMap
      e.getKey -> Stage(tiers, alphas, shuf)
    }.toMap
  }

  /** The adjudication text — separated from main() so the gates are
    * unit-pinned on synthetic records (ChainScaleCompareSpec), the
    * [[BenchCompare.compare]] stance.
    */
  private[tools] def compare(
      oldS: Map[String, Stage], newS: Map[String, Stage]): String = {
    val sb = new StringBuilder
    var flagged = 0
    (oldS.keySet ++ newS.keySet).toSeq.sorted.foreach { name =>
      (oldS.get(name), newS.get(name)) match {
        case (None, Some(_)) =>
          sb ++= f"[chaincompare] $name%-26s NEW STAGE%n"
        case (Some(_), None) =>
          sb ++= f"[chaincompare] $name%-26s DROPPED%n"
        case (Some(o), Some(n))
            if (o.tiers.keySet intersect n.tiers.keySet).isEmpty =>
          // No tier both records measured (scales changed between
          // runs): say so explicitly instead of comparing two 0.0
          // defaults that silently read as CLEAN (r19 ADVICE). Counts
          // as flagged — an incomparable stage is not an adjudicated
          // one.
          flagged += 1
          sb ++= f"[chaincompare] $name%-26s NO SHARED TIER " +
            s"(old ${o.tiers.keySet.toSeq.sorted.mkString("/")}x vs " +
            s"new ${n.tiers.keySet.toSeq.sorted.mkString("/")}x) — rerun at matching scales\n"
        case (Some(o), Some(n)) =>
          val topScale = (o.tiers.keySet intersect n.tiers.keySet)
            .maxOption.getOrElse(0)
          val oc = o.tiers.getOrElse(topScale, 0.0)
          val nc = n.tiers.getOrElse(topScale, 0.0)
          val ratio = nc / math.max(oc, 1e-9)
          val alphaFlags = (o.alphas.keySet intersect n.alphas.keySet)
            .toSeq.sorted.flatMap { d =>
              val da = n.alphas(d) - o.alphas(d)
              if (da > 0.15) Some(f"ALPHA-UP $d +$da%.2f") else None
            }
          val worstNew = n.alphas.values.maxOption.getOrElse(Double.NaN)
          val shufScale = (o.shuf.keySet intersect n.shuf.keySet)
            .maxOption.getOrElse(0)
          val os = o.shuf.getOrElse(shufScale, 0.0)
          val ns = n.shuf.getOrElse(shufScale, 0.0)
          val bytesUp = shufScale > 0 && ns / math.max(os, 1e-9) > 1.3 &&
            ns - os > 100.0
          val flags = Seq(
            if (ratio > 1.5 && nc - oc > 5.0) Seq(f"REGRESSED $ratio%.2fx") else Nil,
            alphaFlags,
            if (worstNew > 1.3) Seq(f"SUPER-LINEAR $worstNew%.2f") else Nil,
            if (bytesUp)
              Seq(f"BYTES-UP ${ns / math.max(os, 1e-9)}%.2fx ($os%.0f -> $ns%.0f MB)")
            else Nil).flatten
          if (flags.nonEmpty) flagged += 1
          val alphaStr = n.alphas.toSeq.sorted
            .map { case (d, a) =>
              f"$d $a%.2f (${o.alphas.get(d).map(x => f"$x%.2f").getOrElse("n/a")})" }
            .mkString("  ")
          sb ++= f"[chaincompare] $name%-26s cpu@${topScale}x $oc%8.1f -> $nc%8.1f s " +
            f"($ratio%.2fx)  alpha: $alphaStr" +
            (if (flags.nonEmpty) s"  <-- ${flags.mkString("; ")}" else "") + "\n"
      }
    }
    sb ++= (if (flagged == 0)
      "[chaincompare] verdict: CLEAN — no stage regressed, no alpha rose past the band"
    else
      s"[chaincompare] verdict: $flagged stage(s) flagged — read the rows above")
    sb.toString
  }

  private def describe(node: JsonNode): String =
    s"${node.path("sf_dir").asText()} scales=${node.path("scales")} cpus=${node.path("cpus").asInt()}"

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ChainScaleCompare <old.json> <new.json>")
    val om = new ObjectMapper()
    val (o, n) = (om.readTree(new java.io.File(args(0))),
      om.readTree(new java.io.File(args(1))))
    println(s"[chaincompare] old: ${describe(o)}")
    println(s"[chaincompare] new: ${describe(n)}")
    // Task-CPU sums inflate with concurrent task count on an
    // oversubscribed host (identical code reads 1.5-10x "slower" at
    // local[32] vs local[4] — measured r20), so cross-thread-count
    // records are NOT comparable: say so loudly instead of letting
    // every row read REGRESSED.
    if (o.path("cpus").asInt() != n.path("cpus").asInt())
      println(s"[chaincompare] CONFIG MISMATCH: cpus ${o.path("cpus").asInt()} vs " +
        s"${n.path("cpus").asInt()} — cpu ratios below are thread-count artifacts; " +
        "rerun the new record at the old record's SPARK_GRAFT_CPUS before adjudicating")
    println(compare(load(args(0)), load(args(1))))
  }
}
