package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{CheckpointUtil, Dedup}
import graft.sources.Sessions

/** Round-22 A/B for the connected-components kernel that every cluster
  * consumer folds (LSH labels, winnow labels, image/audio/video CC,
  * knn-edge CC — 8 call sites).
  *
  * Variants, all output-identical (min-label fixpoint is
  * schedule-independent; the probe verifies row-level equality):
  *
  *  A. shipped `Dedup.clusters` — per round: eager localCheckpoint of
  *     the jumped labels (job 1) + label-sum convergence witness
  *     (job 2); init pays distinct + eager checkpoint + sum.
  *  B. folded + fused — round 1 is algebraically the neighborhood min
  *     (pointer jump through identity labels is the identity), so the
  *     init computes it directly as one groupBy; per round the labels
  *     checkpoint LAZILY and the label-sum action materializes the
  *     checkpoint in the SAME job — one job per round instead of two.
  *  C. large-star/small-star (Kiveris et al., MR CC) — the r21
  *     "deferred to round 22 with a dedicated A/B" algorithm: edge-set
  *     rewriting rounds (each 2 groupBys over the edge list) until the
  *     edge set stabilizes into stars.
  *
  * Interleaved 2x per variant per edge family (host-noise dodging),
  * wall + rounds + task-time printed per run.
  */
object CcProbe {

  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(b.getCollectionTime, 0L)).sum
  }

  /** Variant B: folded round-1 init + lazy-checkpoint/sum fusion. */
  def clustersB(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum(col("cluster_id")), lit(0L))).head().getLong(0)
    var labels = sym.groupBy(col("src"))
      .agg(min(col("dst")).as("_m"))
      .select(col("src").as("doc_id"),
        least(col("src"), col("_m")).as("cluster_id"))
      .localCheckpoint(false)
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels, col("dst") === col("doc_id"))
        .groupBy(col("src"))
        .agg(min(col("cluster_id")).as("nbr_min"))
      val viaNbr = labels
        .join(nbrMin, col("doc_id") === col("src"), "left")
        .select(
          col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
      val jumped = viaNbr.as("a")
        .join(labels.select(col("doc_id").as("p_id"), col("cluster_id").as("p_cl")),
          col("a.cluster_id") === col("p_id"), "left")
        .select(
          col("a.doc_id").as("doc_id"),
          least(col("a.cluster_id"), coalesce(col("p_cl"), col("a.cluster_id")))
            .as("cluster_id"))
        .localCheckpoint(false)
      val sumNow = labelSum(jumped)
      CheckpointUtil.checkpointRdd(labels).foreach(_.unpersist(false))
      labels = jumped
      converged = sumNow == prevSum
      prevSum = sumNow
      iter += 1
    }
    CheckpointUtil.checkpointRdd(sym).foreach(_.unpersist(false))
    if (!converged)
      throw new IllegalStateException(s"variant B did not converge in $maxIter")
    println(s"[cc]   variant B rounds=$iter")
    labels.select(
      col("doc_id"),
      col("cluster_id"),
      (col("cluster_id") === col("doc_id")).as("is_canonical"))
  }

  /** Variant C: alternating large-star / small-star edge rewriting.
    * Each round: large-star connects every strictly-larger neighbor of
    * u to min(N(u) ∪ u); small-star connects every neighbor <= u (and
    * u) to that min. Terminates when the edge set's (sum, count)
    * fingerprint stabilizes; final edges are (root, member) stars.
    */
  def clustersC(edges: DataFrame, maxIter: Int = 40): DataFrame = {
    def canon(df: DataFrame): DataFrame =
      df.where(col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .distinct()
    var e = canon(
      edges.select(col("doc_a").as("u"), col("doc_b").as("v")))
      .localCheckpoint(true)
    def fingerprint(df: DataFrame): (Long, Long) = {
      val r = df.agg(
        coalesce(sum(col("u") + col("v")), lit(0L)),
        count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    var prev = (-1L, -1L)
    var iter = 0
    var fp = fingerprint(e)
    while (fp != prev && iter < maxIter) {
      prev = fp
      // large-star: per node u over BOTH directions, attach larger
      // neighbors to m = min(N(u) ∪ {u})
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val ls = sym.groupBy("u")
        .agg(least(min(col("v")), col("u")).as("m"),
          collect_list(col("v")).as("ns"))
        .select(col("u"), col("m"), explode(col("ns")).as("v"))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      val afterLs = canon(ls.union(e)).localCheckpoint(true)
      // small-star: per node u, attach all neighbors v <= u (and u) to m
      val dir = afterLs.select(col("v").as("u"), col("u").as("v")) // v>u stored; direct edges to smaller
      val ssG = dir.groupBy("u")
        .agg(least(min(col("v")), col("u")).as("m"),
          collect_list(col("v")).as("ns"))
      // connect each smaller neighbor AND u itself to m (omitting u
      // collapses stars to self-loops and the edge set to empty)
      val ss = ssG
        .select(col("u"), col("m"), explode(col("ns")).as("v"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(ssG.select(col("u"), col("m").as("v")))
      val afterSs = canon(ss).localCheckpoint(true)
      CheckpointUtil.checkpointRdd(e).foreach(_.unpersist(false))
      CheckpointUtil.checkpointRdd(afterLs).foreach(_.unpersist(false))
      e = afterSs
      fp = fingerprint(e)
      iter += 1
    }
    println(s"[cc]   variant C rounds=$iter")
    // stars: u = root, v = member; roots label themselves
    val members = e.select(col("v").as("doc_id"), col("u").as("cluster_id"))
    val roots = e.select(col("u").as("doc_id")).distinct()
      .join(members.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
    members.union(roots)
      .select(col("doc_id"), col("cluster_id"),
        (col("cluster_id") === col("doc_id")).as("is_canonical"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) taskTime.addAndGet(te.taskMetrics.executorRunTime)
    })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    // The real edge families the declared queries cluster.
    import graft.pipeline.{AHashChain, Multimodal, VideoChain}
    val families: Seq[(String, DataFrame)] = Seq(
      "video" -> VideoChain.dupPairs(spark, sfDir, docs)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b")),
      "audio" -> AHashChain.audioPairs(spark, sfDir, docs)
        .select(col("doc_a"), col("doc_b")),
      "image" -> Multimodal.aHashPairs(
        AHashChain.imageHashes(spark, sfDir, docs), maxHamming = 3)
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint(true),
      "winnow" -> graft.pipeline.DedupChain.winnowPairs(spark, sfDir, docs)
        .select("doc_a", "doc_b"),
      "lsh" -> graft.pipeline.DedupChain.jaccardPairs(spark, sfDir, docs)
        .where(col("jaccard") >= 0.5).select("doc_a", "doc_b")
        .localCheckpoint(true))

    def hashOf(df: DataFrame): Long =
      df.agg(coalesce(sum(xxhash64(col("doc_id"), col("cluster_id"),
        col("is_canonical"))), lit(0L))).head().getLong(0)

    families.foreach { case (fam, edges) =>
      val variants: Seq[(String, DataFrame => DataFrame)] = Seq(
        "A(shipped)" -> (e => Dedup.clusters(e)),
        "B(fused)  " -> (e => clustersB(e)),
        "C(ls/ss)  " -> (e => clustersC(e)))
      var ref = 0L
      (1 to 2).foreach { rep =>
        variants.foreach { case (vn, f) =>
          val gc0 = gcMillis(); val tt0 = taskTime.get()
          val t0 = System.nanoTime()
          val out = f(edges)
          val h = hashOf(out)
          val n = out.count()
          val dt = (System.nanoTime() - t0) / 1e9
          if (ref == 0L) ref = h
          val eq = if (h == ref) "EQ" else "MISMATCH"
          println(f"[cc] $fam%-7s $vn rep$rep ${dt}%7.2f s  gc=${gcMillis() - gc0}%5d ms  task=${(taskTime.get() - tt0) / 1e3}%7.1f s  n=$n%7d  $eq")
          spark.catalog.clearCache()
        }
      }
    }
    spark.stop()
  }
}
