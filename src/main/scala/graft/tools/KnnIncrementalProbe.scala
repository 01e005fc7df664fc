package graft.tools

import graft.pipeline.Similarity

/** A/B: NN-descent working-list build WITH round-20 new-flag rounds
  * (from round 2 on, the neighbor-of-neighbor join generates only
  * pairs with ≥1 edge new vs the previous round's g) vs WITHOUT
  * (`incremental = false` — the shipped default, full g⋈g every
  * round). The r19 prefilter cut bytes-per-candidate; this probe
  * measured whether cutting candidate COUNT bends the knn cpu-alpha
  * further. It does NOT at the shipped iters=3 — the verdict this
  * instrument produced (see Similarity.knnWorkingList): the first
  * two-sided spelling read +22% cpu / 7.1 vs 6.4 GB shuffle at 100×
  * in both pairs (new-new pairs generated twice) — decisively
  * negative; the corrected disjoint spelling read +17% / −11% across
  * two pairs (break-even within host noise) at +2% on the
  * deterministic byte witness, because KnnChurnProbe's measured
  * 0.45-0.6 round churn leaves only ~15-30% of volume skippable and
  * a post-prefilter candidate row is too cheap for that cut to repay
  * the anti/semi joins and per-round checkpoint. Kept so the
  * conclusion is re-measurable if the regime changes (iters≫3).
  *
  * Interleaved ×2 per scale in one JVM (host-noise stance); wall +
  * task-CPU + shuffle-write.
  * Usage: runMain graft.tools.KnnIncrementalProbe [sfDir] [scalesCsv]
  */
object KnnIncrementalProbe {
  def main(args: Array[String]): Unit =
    AbProbe.run("newflag", "10,100", args, Seq(
      "on" -> ((_, fx) =>
        Similarity.knnWorkingList(fx, incremental = true).count()),
      "off" -> ((_, fx) =>
        Similarity.knnWorkingList(fx, incremental = false).count())))
}
