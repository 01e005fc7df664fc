package graft.tools

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity
import graft.sources.Sessions

/** Recall-vs-nProbe sweep for the trained IVF index — the measurement
  * that justifies (or indicts) the default probe count: recall@5
  * averaged over the query set for nProbe 1..4, against the
  * brute-force ground truth, plus the candidate volume each probe
  * level scans (the cost side of the trade).
  *
  * Usage: runMain graft.tools.RecallSweep [sfDir] [knn|walk]
  * (second arg `knn` runs ONLY the NN-descent graph sweep; `walk`
  * runs ONLY the graph-serving walk sweep over degree/hops/beam)
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // NN-descent kNN-graph sweep: recall of the descent graph vs the
    // brute-force top-4 graph, across working-list width (searchK)
    // and round count — the tuning table behind knnGraph's defaults
    // and the pinned floor in PipelineSpec.
    val knnOnly = args.lift(1).contains("knn")
    if (knnOnly) {
      val ec = e.localCheckpoint(true)
      val a = ec.select(col("vec_id").as("u"), col("embedding").as("ea"))
      val b = ec.select(col("vec_id").as("v"), col("embedding").as("eb"))
      val cosc = graft.functions.dotF(col("ea"), col("eb")) /
        (sqrt(graft.functions.dotF(col("ea"), col("ea"))) *
          sqrt(graft.functions.dotF(col("eb"), col("eb"))))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("u").orderBy(col("cos").desc, col("v").asc)
      val exactSet = a.crossJoin(b).where(col("u") =!= col("v"))
        .select(col("u"), col("v"), cosc.as("cos"))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= 4)
        .select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (sk <- Seq(8, 12, 16, 24); it <- Seq(1, 2, 3)) {
        val t0 = System.nanoTime()
        val got = Similarity.knnGraph(ec, k = 4, iters = it, searchK = sk)
          .collect()
          .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        val rec = got.intersect(exactSet).size.toDouble / exactSet.size
        println(f"[sweep] knn searchK=$sk%2d iters=$it  recall@4 = $rec%.3f   wall $dt%5.2f s")
      }
      // Binary-prefilter width sweep (round 19): the recall price of
      // scoring descent candidates against the 8-byte sign
      // fingerprints and keeping only the candK hamming-strongest per
      // node before the exact pass. MaxValue = prefilter off (every
      // candidate exact-scored, the r18 behavior).
      for (ck <- Seq(48, 64, 96, 128, 160, 192, Int.MaxValue)) {
        val t0 = System.nanoTime()
        val got = Similarity.knnGraph(ec, k = 4, iters = 3, searchK = 16, candK = ck)
          .collect()
          .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        val rec = got.intersect(exactSet).size.toDouble / exactSet.size
        val ckS = if (ck == Int.MaxValue) "off" else ck.toString
        println(f"[sweep] knn candK=$ckS%4s searchK=16 iters=3  recall@4 = $rec%.3f   wall $dt%5.2f s")
      }
      // New-flag rounds (round 20): the recall price of joining only
      // candidate pairs with >=1 new edge from round 2 on, vs the
      // full g⋈g every round, at the shipped defaults.
      for (inc <- Seq(true, false)) {
        val t0 = System.nanoTime()
        val got = Similarity.knnGraph(ec, k = 4, incremental = inc)
          .collect()
          .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        val rec = got.intersect(exactSet).size.toDouble / exactSet.size
        println(f"[sweep] knn newflag=${if (inc) " on" else "off"}  searchK=16 iters=3" +
          f"  recall@4 = $rec%.3f   wall $dt%5.2f s")
      }
      spark.stop()
      return
    }
    // Graph-serving walk sweep: recall of the greedy beam walk vs
    // brute force for the 8-query frame, across serving-graph degree
    // (the prefix width of the working list), hops, and beam — the
    // measurement behind graphSearch's degree-16/hops-5/beam-16
    // defaults and the "serve on the WIDE list" rule.
    if (args.lift(1).contains("walk")) {
      val ec = e.localCheckpoint(true)
      val wl = Similarity.knnWorkingList(ec).localCheckpoint(true)
      val exactSet = Similarity.topK(ec, numQueries = 8, k = 4).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
      for (deg <- Seq(4, 8, 16); (hops, beam) <- Seq((4, 8), (5, 16), (6, 24))) {
        val t0 = System.nanoTime()
        val got = Similarity.graphSearch(
            ec, Similarity.graphPrefix(wl, deg), beam = beam, hops = hops)
          .collect()
          .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        val rec = got.intersect(exactSet).size.toDouble / exactSet.size
        println(f"[sweep] walk degree=$deg%2d hops=$hops beam=$beam%2d  recall@4 = $rec%.3f   wall $dt%5.2f s")
      }
      spark.stop()
      return
    }
    val exact = Similarity.topK(e).localCheckpoint(true)
    val cents = Similarity.kmeansCentroids(e).localCheckpoint(true)
    val sizes = Similarity.cellSizes(e, cents)
      .collect().map(r => r.getAs[Int]("cid") -> r.getAs[Long]("n_vecs")).toMap
    println(s"[sweep] cell sizes: ${sizes.toSeq.sortBy(_._1).mkString(", ")}")
    (1 to 4).foreach { p =>
      val t0 = System.nanoTime()
      val rec = Similarity.recallAtK(
        exact,
        Seq("ivft" -> Similarity.topKIvfTrained(e, cents, nProbe = p)))
        .agg(avg(col("ivft_recall"))).head().getDouble(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[sweep] nProbe=$p  avg recall@5 = $rec%.3f   wall $dt%5.2f s")
    }
    // Sample-trained centroids at 1/2, 1/4, 1/8 of the corpus vs the
    // full-trained row above — the "can I train on a sample" parity
    // table (at 100 TB the sample is the only viable training input;
    // this quantifies what the fixture-scale corpus pays for it).
    Seq(2, 4, 8).foreach { mod =>
      val t0 = System.nanoTime()
      val sc = Similarity.kmeansCentroidsSampled(e, sampleMod = mod)
      val rec = Similarity.recallAtK(
        exact,
        Seq("ivfs" -> Similarity.topKIvfTrained(e, sc)))
        .agg(avg(col("ivfs_recall"))).head().getDouble(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[sweep] sampled 1/$mod  avg recall@5 = $rec%.3f   wall $dt%5.2f s")
    }
    // PQ side of the trade: recall@5 vs (m, ksub) — compression is
    // 4·64/m bytes -> m codes; larger m (finer subspaces) and larger
    // ksub (finer cells) both raise recall and shrink the saving.
    Seq((4, 16), (8, 16), (8, 64), (16, 64)).foreach { case (m, ksub) =>
      val t0 = System.nanoTime()
      val books = Similarity.pqCodebooks(e, m = m, ksub = ksub)
      val rec = Similarity.recallAtK(
        exact,
        Seq("pq" -> Similarity.topKPq(e, books, m = m)))
        .agg(avg(col("pq_recall"))).head().getDouble(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[sweep] pq m=$m%2d ksub=$ksub%3d (${256 / m}%3dx compression)  avg recall@5 = $rec%.3f   wall $dt%5.2f s")
    }
    // OPQ at the same (m, ksub) grid: the rotation is trained once per
    // m (the allocation depends on the subspace count), then the
    // unmodified PQ chain runs in the rotated basis. On isotropic
    // embeddings the delta vs plain PQ should read ~0 — which is the
    // honest calibration this sweep exists to document; a positive
    // delta appears exactly when the data has correlated/anisotropic
    // structure (OpqSpec's fixture shows +0.3).
    val rotByM = scala.collection.mutable.Map.empty[Int, org.apache.spark.sql.DataFrame]
    Seq((4, 16), (8, 16), (8, 64), (16, 64)).foreach { case (m, ksub) =>
      val t0 = System.nanoTime()
      val rot = rotByM.getOrElseUpdate(
        m, graft.pipeline.Opq.rotate(e, graft.pipeline.Opq.trainRotation(e, m = m)))
      val books = Similarity.pqCodebooks(rot, m = m, ksub = ksub)
      val rec = Similarity.recallAtK(
        exact,
        Seq("opq" -> Similarity.topKPq(rot, books, m = m)))
        .agg(avg(col("opq_recall"))).head().getDouble(0)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[sweep] opq m=$m%2d ksub=$ksub%3d (${256 / m}%3dx compression)  avg recall@5 = $rec%.3f   wall $dt%5.2f s")
    }
    spark.stop()
  }
}
