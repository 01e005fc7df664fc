package graft.tools

import graft.pipeline.Similarity

/** A/B: NN-descent working-list build WITH the round-19 binary
  * prefilter (candK=8·searchK, the shipped default) vs WITHOUT
  * (candK=Int.MaxValue — the exact r18 plan, no hamming pass).
  * The prefilter routes the ~n·(2·searchK)² candidate rows through
  * two 8-byte-fingerprint BROADCAST joins + an integer top-candK,
  * so the exact float scoring touches searchK+candK rows per node
  * instead of ~(2·searchK)² — the bytes-per-candidate-row lever the
  * r18 SMJ/shuffled-hash NEGATIVE pointed at.
  *
  * Interleaved ×2 per scale (host-noise stance); wall + task-CPU +
  * shuffle-write (via the shared [[AbProbe]] harness).
  * Usage: runMain graft.tools.KnnPrefilterProbe [sfDir] [scalesCsv]
  */
object KnnPrefilterProbe {
  def main(args: Array[String]): Unit =
    AbProbe.run("prefilter", "10,100", args, Seq(
      "on" -> ((_, fx) => Similarity.knnWorkingList(fx, candK = 0).count()),
      "off" -> ((_, fx) =>
        Similarity.knnWorkingList(fx, candK = Int.MaxValue).count())))
}
