package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.{Chains, DedupChain, IvfChain, KnnChain, OpqChain}
import graft.sources.Sessions

/** Chain-BUILD scaling tier (round 18): the 10x [[ScaleSmoke]] matrix
  * grades chain CONSUMERS; the session-staged builds (DedupChain,
  * KnnChain, OpqChain, IvfChain, BpeChain, PackChain) are the real
  * 100 TB cost centers —
  * a production deployment pays each once per corpus snapshot, and a
  * super-linear build is a scale-killer no marginal-cost bench row
  * can see. This tool measures each build THROUGH THE SAME MEMO PATH
  * the declared queries trigger (ChainBill-billed, localCheckpoint
  * I/O included) at geometric fixture scales (default 1x/10x/100x of
  * the sf0.1 tables — 100x sf0.1 = 500k docs / 200k vectors, the
  * largest tier that comfortably fits the 128 GiB harness), and
  * prints per-decade scaling exponents
  * alpha = log(t_hi/t_lo) / log(n_hi/n_lo).
  *
  * alpha ~ 1.0 is volume-linear; a sustained last-decade alpha > 1.3
  * is flagged SUPER-LINEAR. Exponents are reported on three clocks —
  * wall, executor task-RUNTIME sum, and executor CPU-time sum — and
  * the CPU alpha is the graded number: wall saturates while 32
  * threads absorb a small fixture (a 10x volume rise can read ~1x
  * wall), and the runtime sum counts time-sliced WAITING, which on
  * this oversubscribed host grows with concurrency itself (measured:
  * linear-by-construction dedup stages read task_a ~1.5 while their
  * cpu_a reads ~1.0). executorCpuTime counts on-CPU nanoseconds only,
  * so it is robust to both the steal storms documented in BASELINE.md
  * and the multiplexing inflation.
  *
  * Fixtures are [[Amplify]]'s decorrelated amplifiers (per-copy token
  * suffixes / Rademacher diagonals): the pairwise chains must see ~Nx
  * candidate volume, not the fixture's own N² cross-copy duplication.
  * Fixtures are localCheckpointed and counted before the clock starts
  * so amplification cost never pollutes the build measurement.
  *
  * Stage rows are MARGINAL: within one (chain, scale) sweep the memo
  * keeps earlier stages staged, so `dedup.jaccard` is the candidate
  * join + verify given staged signatures — the same increment a
  * production chain pays. Each chain is released between scales.
  *
  * Usage: runMain graft.tools.ChainScale [sfDir] [scalesCsv] [filter]
  *   e.g. runMain graft.tools.ChainScale /root/testdata/sf0.1 1,10,100 dedup
  */
object ChainScale {

  private val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
  private val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
  private val shufW = new java.util.concurrent.atomic.AtomicLong(0L)

  private final case class Obs(
      scale: Int, wallS: Double, taskS: Double, cpuS: Double, shufMb: Double,
      n: Long)

  private def time(run: () => Long): (Double, Double, Double, Double, Long) = {
    val tt0 = taskMs.get(); val cp0 = cpuNs.get(); val sw0 = shufW.get()
    val t0 = System.nanoTime()
    val n = run()
    ((System.nanoTime() - t0) / 1e9, (taskMs.get() - tt0) / 1e3,
      (cpuNs.get() - cp0) / 1e9, (shufW.get() - sw0) / 1048576.0, n)
  }

  /** Per-decade exponent; NaN (printed "n/a") when the low-tier timing
    * is below clock resolution — a ~0 denominator reads as an Inf/NaN
    * blowup that is measurement noise, not a scaling fact (r18 ADVICE).
    */
  private val AlphaFloorS = 0.05
  private def alpha(lo: Obs, hi: Obs, f: Obs => Double): Double =
    // BOTH tiers floored: a ~0 high tier would read log(0) = -Inf,
    // which the JSON emitter would serialize as a bare -Infinity
    // token — invalid strict JSON that breaks ChainScaleCompare.load
    if (f(lo) < AlphaFloorS || f(hi) < AlphaFloorS) Double.NaN
    else math.log(f(hi) / f(lo)) / math.log(hi.scale.toDouble / lo.scale)

  private def fmtA(a: Double): String = if (a.isNaN) "n/a" else f"$a%.2f"

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scales = args.lift(1).getOrElse("1,10,100")
      .split(",").map(_.trim.toInt).toSeq.sorted
    val only = args.lift(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_SHUFFLE_PARTITIONS (default: = cpus, the historic
    // config every committed artifact was measured under): the
    // constant-bytes-per-partition CONTROL. A single-host tier sweep
    // holds partition count fixed while bytes grow, so past some tier
    // the per-partition sort depth — not the plan — drives the cpu
    // alpha; a real cluster runs the opposite regime (more data ⇒
    // more executors ⇒ more partitions, bytes/partition ~constant).
    // Re-running the top tier with partitions scaled by the tier
    // ratio separates the two: byte-linear + alpha that collapses
    // under the control ⇒ harness artifact, not an engine regression.
    val shufP = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus).toInt
    val spark: SparkSession =
      Sessions.builder(s"local[$cpus]", shufP).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) {
          taskMs.addAndGet(te.taskMetrics.executorRunTime)
          cpuNs.addAndGet(te.taskMetrics.executorCpuTime)
          // shuffle WRITE bytes: the direct witness of the
          // bytes-per-row arguments the chain designs rest on (the
          // r19 descent prefilter shrank exactly this number)
          shufW.addAndGet(te.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
    })

    val docs1 = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    docs1.count(); emb1.count() // warm footers + codegen

    // Staged fixtures per scale, built OUTSIDE the measured window.
    def staged(df: DataFrame): DataFrame = {
      val f = df.localCheckpoint(true); f.count(); f
    }
    def docsAt(n: Int): DataFrame =
      staged(if (n == 1) docs1 else Amplify.docsDistinct(docs1, n))
    def embAt(n: Int): DataFrame =
      staged(if (n == 1) emb1 else Amplify.embDecor(emb1, n))

    def free(df: DataFrame): Unit =
      graft.pipeline.CheckpointUtil.checkpointRdd(df).foreach(_.unpersist(false))

    // One chain = its fixture builder, its ordered MARGINAL stages
    // (each a first-touch memo call at dir key "chainscale:<n>x"),
    // and its release hook.
    final case class Stage(name: String, run: (DataFrame, String) => Long)
    final case class Chain(
        name: String,
        fixture: Int => DataFrame,
        stages: Seq[Stage],
        release: SparkSession => Unit)

    val chains = Seq(
      Chain("dedup", docsAt, Seq(
        Stage("sigs", (d, k) => DedupChain.minhashSigs(spark, k, d).count()),
        Stage("jaccard", (d, k) => DedupChain.jaccardPairs(spark, k, d).count()),
        Stage("cc_labels", (d, k) => DedupChain.clusterLabels(spark, k, d).count()),
        Stage("winnow_pairs", (d, k) => DedupChain.winnowPairs(spark, k, d).count()),
        Stage("token_hashes", (d, k) => DedupChain.tokenHashes(spark, k, d).count()),
        Stage("simhash64", (d, k) => DedupChain.simhashes64(spark, k, d).count())),
        DedupChain.release),
      Chain("knn", embAt, Seq(
        Stage("working_list", (e, k) => KnnChain.workingList(spark, k, e).count())),
        KnnChain.release),
      Chain("opq", embAt, Seq(
        Stage("rotation", (e, k) => { OpqChain.rotation(spark, k, e); 64L }),
        Stage("books", (e, k) => OpqChain.books(spark, k, e).count()),
        Stage("centroids", (e, k) => OpqChain.centroids(spark, k, e).count())),
        OpqChain.release),
      Chain("ivf", embAt, Seq(
        Stage("centroids", (e, k) => IvfChain.centroids(spark, k, e).count()),
        Stage("pq_books", (e, k) => IvfChain.pqBooks(spark, k, e).count())),
        IvfChain.release),
      Chain("bpe", docsAt, Seq(
        Stage("encoded", (d, k) =>
          graft.pipeline.BpeChain.encoded(spark, k, d).count())),
        graft.pipeline.BpeChain.release),
      Chain("pack", docsAt, Seq(
        Stage("windows", (d, k) =>
          graft.pipeline.PackChain.materialized(spark, k, d)._2.count())),
        graft.pipeline.PackChain.release))

    val picked = chains.filter(c => only.forall(c.name.contains))
    val results =
      scala.collection.mutable.LinkedHashMap.empty[(String, String), Vector[Obs]]

    picked.foreach { chain =>
      scales.foreach { n =>
        val fx = chain.fixture(n)
        val key = s"chainscale:${n}x"
        chain.stages.foreach { st =>
          val (wall, task, cpu, shufMb, rows) = time(() => st.run(fx, key))
          results.updateWith((chain.name, st.name))(v =>
            Some(v.getOrElse(Vector.empty) :+ Obs(n, wall, task, cpu, shufMb, rows)))
          println(f"[chainscale] ${chain.name}.${st.name}%-22s ${n}%4dx " +
            f"wall=$wall%8.2f s  task=$task%9.2f s  cpu=$cpu%9.2f s  " +
            f"shufW=$shufMb%8.1f MB  n=$rows%d")
        }
        chain.release(spark)
        free(fx)
        spark.catalog.clearCache()
      }
    }

    // Durable JSON artifact (r18 verdict #4): the exponents used to
    // live only in PLANS.md prose; a committed per-stage record (n,
    // wall/task/cpu per tier, per-decade cpu alphas) makes chain-BUILD
    // regressions diffable round over round the way bench_out.json
    // made query regressions diffable. One line per run.
    // Interpolated strings are JSON-escaped (r19 ADVICE): an sfDir
    // containing a quote or backslash must not yield an artifact
    // ChainScaleCompare.load then chokes on.
    def jstr(s: String): String =
      s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
    val jsonStages = results.map { case ((cn, sn), obs) =>
      def tier(o: Obs) =
        s"""{"scale":${o.scale},"wall_s":${math.rint(o.wallS * 100) / 100},""" +
          s""""task_s":${math.rint(o.taskS * 100) / 100},""" +
          s""""cpu_s":${math.rint(o.cpuS * 100) / 100},""" +
          s""""shuffle_write_mb":${math.rint(o.shufMb * 10) / 10},"n":${o.n}}"""
      val cpuAs = obs.sliding(2).collect { case Vector(lo, hi) =>
        val a = alpha(lo, hi, _.cpuS)
        s""""${lo.scale}->${hi.scale}":""" +
          (if (a.isNaN) "null" else (math.rint(a * 100) / 100).toString)
      }.mkString(",")
      s""""${jstr(s"$cn.$sn")}":{"tiers":[${obs.map(tier).mkString(",")}],""" +
        s""""cpu_alpha":{$cpuAs}}"""
    }.mkString(",")
    val artifact =
      s"""{"sf_dir":"${jstr(sfDir)}","scales":[${scales.mkString(",")}],""" +
        s""""cpus":$cpus,"stages":{$jsonStages}}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_CHAINSCALE_OUT", "chainscale_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), artifact + "\n")
    catch {
      case e: Exception =>
        System.err.println(s"[chainscale] could not write $outPath: ${e.getMessage}")
    }

    println("\n== scaling exponents (cpu alpha is the graded number) ==")
    results.foreach { case ((cn, sn), obs) =>
      val decades = obs.sliding(2).collect { case Vector(lo, hi) =>
        s"${lo.scale}->${hi.scale}x wall_a=${fmtA(alpha(lo, hi, _.wallS))} " +
          s"task_a=${fmtA(alpha(lo, hi, _.taskS))} cpu_a=${fmtA(alpha(lo, hi, _.cpuS))}"
      }.mkString(" | ")
      // Flag on the WORST measurable decade, not just the last: a
      // 1x->10x blowup that flattens at 10x->100x (e.g. a fixed-cost
      // stage crossing the broadcast threshold early) is still worth a
      // look (r18 ADVICE).
      val cpuAlphas = obs.sliding(2).collect {
        case Vector(lo, hi) => alpha(lo, hi, _.cpuS)
      }.toSeq.filterNot(_.isNaN)
      val flag =
        if (cpuAlphas.nonEmpty && cpuAlphas.max > 1.3) "  <-- SUPER-LINEAR"
        else ""
      println(f"[alpha] $cn.$sn%-24s $decades$flag")
    }
    Chains.releaseAll(spark)
    spark.stop()
  }
}
