package graft.tools

import graft.pipeline.Similarity

/** A/B: NN-descent exact pass with the round-20 FLOAT-JOIN broadcast
  * gate (pool ⋈ us / pool ⋈ vs forced BroadcastHashJoin while the
  * vector frame fits the 6M-row ≈ 1.6 GB budget) vs without
  * (`floatBcastRows = 0` — the r19 plan, where the same joins fall
  * into shuffle+sort once the corpus passes Spark's 10 MB auto
  * threshold ≈ 40k vectors). The r18/r19 chain instruments diagnosed
  * exactly this threshold crossing as the residual behind the knn
  * cpu-alpha (1.20 on the 10→100× decade); join strategy never
  * changes the ranked output, so the gate is a pure plan decision.
  *
  * Interleaved ×2 per scale in one JVM (host-noise stance); wall +
  * task-CPU + shuffle-write (the byte witness is the deterministic
  * discriminator on this host).
  * Usage: runMain graft.tools.KnnFloatBcastProbe [sfDir] [scalesCsv]
  */
object KnnFloatBcastProbe {
  def main(args: Array[String]): Unit =
    AbProbe.run("floatbcast", "10,100", args, Seq(
      "on" -> ((_, fx) =>
        Similarity.knnWorkingList(fx, floatBcastRows = 6000000L).count()),
      "off" -> ((_, fx) =>
        Similarity.knnWorkingList(fx, floatBcastRows = 0L).count())))
}
