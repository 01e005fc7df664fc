package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Opq, Similarity}
import graft.sources.Sessions

/** Round-18 diagnosis probe for the two SUPER-LINEAR chain builds
  * ChainScale surfaced (cpu alpha ~1.5 sustained on opq.books /
  * opq.centroids; ~1.4 on knn.working_list, vs ~1.0 for the same
  * trainers on raw inputs):
  *
  *   A. opq: pqCodebooks/kmeansCentroids over the UN-staged rotated
  *      corpus (the OpqChain "rotate is map-only, cheaper to
  *      recompute" stance) vs over a localCheckpoint-staged rotated
  *      frame vs the raw-input control. If staging restores the raw
  *      input's linearity, the recompute stance is wrong at scale:
  *      the rotate expression is re-evaluated once per (row × cent)
  *      JOIN PAIR inside Lloyd, not once per row — a per-row cost
  *      that the optimizer multiplies by the join fan-out.
  *
  *   B. knn: the NN-descent working list at three scales with the
  *      per-stage candidate/row counts printed, to separate "the
  *      (2·searchK)² candidate bound saturating as n grows" (small-n
  *      candidate lists are duplicate-heavy, so 1x is artificially
  *      cheap — benign, self-limiting) from genuine quadratic work.
  *
  * A/B variants interleave twice (TfidfProbe stance) so host-noise
  * windows can't masquerade as a plan difference; executor CPU-time
  * deltas are printed next to wall.
  */
object R18ChainProbe {

  private val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("10,30")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) cpuNs.addAndGet(te.taskMetrics.executorCpuTime)
    })

    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb1.count()

    def time(what: String)(f: => Long): Unit = {
      val c0 = cpuNs.get(); val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $what%-34s wall=${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"  cpu=${(cpuNs.get() - c0) / 1e9}%9.2f s  ($n rows)")
      spark.catalog.clearCache()
    }

    scales.foreach { n =>
      val fx = (if (n == 1) emb1 else Amplify.embDecor(emb1, n)).localCheckpoint(true)
      fx.count()
      val rot = Opq.trainRotation(fx)

      // force VALUES, not cardinality: a bare count() lets Catalyst
      // eliminate the whole upstream via distinct-key join elimination
      // (measured: pqCodebooks(..).count() reads 0.03 s cpu — nothing
      // ran), which is exactly the trap the first cut of this probe
      // fell into.
      def force(df: DataFrame): Long =
        df.agg(sum(crc32(to_json(struct(df.columns.map(col): _*))))).head().getLong(0)

      def rawBooks(): Long = force(Similarity.pqCodebooks(fx))
      def unstagedBooks(): Long = force(Similarity.pqCodebooks(Opq.rotate(fx, rot)))
      def stagedBooks(): Long = {
        val r = Opq.rotate(fx, rot).localCheckpoint(true)
        val m = force(Similarity.pqCodebooks(r))
        graft.pipeline.CheckpointUtil.checkpointRdd(r).foreach(_.unpersist(false))
        m
      }
      // isolation rows: the map pass alone (values forced, no
      // checkpoint), a single-kernel map, and a rotate-free checkpoint
      // — separates kernel-evaluation cost from checkpoint mechanics.
      def rotateAgg(): Long =
        Opq.rotate(fx, rot)
          .agg(sum(element_at(col("embedding"), 1).cast("double"))).head().getDouble(0).toLong
      def rotate1Agg(): Long = {
        import graft.functions.dotFD
        fx.select(dotFD(col("embedding"), lit(rot(0))).as("x"))
          .agg(sum(col("x"))).head().getDouble(0).toLong
      }
      def plainCkpt(): Long = {
        val r = fx.select(col("vec_id"), col("embedding")).localCheckpoint(true)
        val m = r.count()
        graft.pipeline.CheckpointUtil.checkpointRdd(r).foreach(_.unpersist(false))
        m
      }
      def rotateCkpt(): Long = {
        val r = Opq.rotate(fx, rot).localCheckpoint(true)
        val m = r.count()
        graft.pipeline.CheckpointUtil.checkpointRdd(r).foreach(_.unpersist(false))
        m
      }
      (1 to 2).foreach { i =>
        time(s"books raw ${n}x #$i")(rawBooks())
        time(s"books rotate-unstaged ${n}x #$i")(unstagedBooks())
        time(s"books rotate-staged ${n}x #$i")(stagedBooks())
        time(s"rotate map+agg ${n}x #$i")(rotateAgg())
        time(s"rotate 1-kernel ${n}x #$i")(rotate1Agg())
        time(s"plain ckpt ${n}x #$i")(plainCkpt())
        time(s"rotate ckpt ${n}x #$i")(rotateCkpt())
      }
      graft.pipeline.CheckpointUtil.checkpointRdd(fx).foreach(_.unpersist(false))
    }

    // B: NN-descent candidate-volume accounting — is the measured
    // super-linearity the candidate bound saturating, or real
    // quadratic growth past the bound?
    scales.foreach { n =>
      val fx = (if (n == 1) emb1 else Amplify.embDecor(emb1, n)).localCheckpoint(true)
      val rows = fx.count()
      time(s"knn working list ${n}x") {
        Similarity.knnWorkingList(fx).count()
      }
      println(s"[probe] knn fixture rows=$rows bound=${rows * 32L * 32L} (n*(2*searchK)^2)")
      graft.pipeline.CheckpointUtil.checkpointRdd(fx).foreach(_.unpersist(false))
    }

    // B2: the NOISE-FREE discriminator — deterministic candidate-row
    // counts per descent round vs the documented n·(2·searchK)² bound.
    // The working-list scaladoc claims the bound; but the
    // neighbor-of-neighbor join runs on g = edges ∪ reverse(edges),
    // whose per-node degree is 16 + IN-degree, and the in-degree is
    // NOT bounded: hub vectors sit in many top-16 lists (hubness grows
    // with n in high dimensions), so Σ deg² can outgrow 1024·n. If
    // cand/n rises with n here, the bound claim is false regardless of
    // any timing noise.
    scales.foreach { n =>
      val fx = (if (n == 1) emb1 else Amplify.embDecor(emb1, n)).localCheckpoint(true)
      val rows = fx.count()
      // replay the descent's candidate generation round-for-round
      def topkOf(pool: DataFrame): DataFrame = {
        import graft.functions.dotF
        val us = fx.select(col("vec_id").as("uid"), col("embedding").as("ue"),
          sqrt(dotF(col("embedding"), col("embedding"))).as("un"))
        val vsd = fx.select(col("vec_id").as("vid"), col("embedding").as("ve"),
          sqrt(dotF(col("embedding"), col("embedding"))).as("vn"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("u").orderBy(col("cosine").desc, col("v").asc)
        pool.join(us, col("u") === col("uid")).join(vsd, col("v") === col("vid"))
          .select(col("u"), col("v"),
            (dotF(col("ue"), col("ve")) / (col("un") * col("vn"))).as("cosine"))
          .withColumn("rank", row_number().over(w)).where(col("rank") <= 16)
      }
      val nn = rows
      val init = fx.select(col("vec_id").as("u"))
        .select(col("u"), explode(sequence(lit(1), lit(16))).as("j"))
        .select(col("u"), ((col("u") * lit(48271L) + col("j") * lit(1999L)) % lit(nn)).as("v"))
        .where(col("u") =!= col("v")).distinct()
      var nb = topkOf(init).localCheckpoint(true)
      (1 to 3).foreach { r =>
        val edges = nb.select("u", "v")
        val g = edges.unionAll(edges.select(col("v").as("u"), col("u").as("v"))).distinct()
        val cand = g.as("a").join(g.as("b"), col("a.v") === col("b.u"))
          .select(col("a.u").as("u"), col("b.v").as("v"))
          .where(col("u") =!= col("v"))
        val nc = cand.count()
        val maxDeg = g.groupBy("u").count().agg(max("count")).head().getLong(0)
        println(s"[probe] knn ${n}x round $r: cand=$nc cand/n=${nc / rows} " +
          s"bound/n=1024 maxdeg=$maxDeg")
        nb = topkOf(edges.unionAll(cand).distinct()).localCheckpoint(true)
      }
      graft.pipeline.CheckpointUtil.checkpointRdd(fx).foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
