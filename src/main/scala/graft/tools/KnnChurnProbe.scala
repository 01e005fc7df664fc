package graft.tools

import graft.pipeline.Similarity
import graft.sources.Sessions

/** Measures the per-round working-list CHURN of the NN-descent — the
  * quantity that decides whether new-flag rounds can pay at the
  * shipped iters=3: the fraction of (u, v) edges in round r's list
  * that were not in round r−1's. Candidate volume under a
  * disjoint new-flag join is 1 − (1 − c)² of the full join (both
  * edges old ⇔ pair skippable), so c ≈ 0.9 leaves nothing to cut
  * while c ≈ 0.3 halves the round.
  *
  * PROXY CAVEAT: this diffs the rank≤searchK WORKING LISTS across
  * iteration counts (each rebuilt from scratch — rounds 1..r−1 are
  * recomputed per point, ~2× total work for the 3-point curve); the
  * in-loop skip actually keys on g = forward ∪ capped-REVERSE edges,
  * whose churn the reverse cap can move independently (hub in-edges
  * entering/leaving a node's top-searchK). List churn bounds the
  * decision well enough for the order-of-magnitude question the
  * probe answers (is the skippable share ~70% or ~20%?), and the
  * definitive word is KnnIncrementalProbe's end-to-end cpu/byte A/B
  * anyway.
  *
  * Usage: runMain graft.tools.KnnChurnProbe [sfDir] [scalesCsv]
  */
object KnnChurnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("1,10")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb1.count()
    scales.foreach { n =>
      val fx = (if (n == 1) emb1 else Amplify.embDecor(emb1, n)).localCheckpoint(true)
      val total = fx.count()
      val lists = (1 to 3).map(it =>
        Similarity.knnWorkingList(fx, iters = it)
          .select("u", "v").localCheckpoint(true))
      lists.sliding(2).zipWithIndex.foreach { case (Seq(a, b), i) =>
        val nb = b.count()
        val fresh = b.join(a, Seq("u", "v"), "left_anti").count()
        val c = fresh.toDouble / nb
        println(f"[churn] ${n}x n=$total%7d round${i + 2} list-churn = $c%.3f" +
          f"  ($fresh%,d of $nb%,d edges new)  cut-if-disjoint = ${1 - (1 - c) * (1 - c)}%.3f of full")
      }
      graft.pipeline.CheckpointUtil.checkpointRdd(fx).foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
