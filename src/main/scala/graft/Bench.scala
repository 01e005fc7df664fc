package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Total stop-the-world GC milliseconds accumulated by this JVM. */
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(b => math.max(b.getCollectionTime, 0L)).sum
  }

  /** Cumulative hypervisor steal time in ms (USER_HZ=100 jiffies on
    * this kernel), 0 where /proc/stat is unavailable. Steal is the
    * decisive outlier witness on a shared host: a query whose wall
    * time inflates with flat gc_ms and rising steal_ms was starved by
    * the hypervisor, not slowed by a plan change.
    */
  private def stealMillis(): Long =
    try {
      val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).getOrElse("")
      val f = cpu.trim.split("\\s+")
      // cpu user nice system idle iowait irq softirq steal ...
      if (f.length > 8) f(8).toLong * 10 else 0L
    } catch { case _: Exception => 0L }

  private def loadAvg(): Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.sources.Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadStart = loadAvg()
    // Executor-side task-time sum (exact in local mode: one JVM).
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          taskTime.addAndGet(te.taskMetrics.executorRunTime)
    })
    // Warm up the session (parquet footer reads, codegen compiler, shuffle
    // machinery) with a FIXED pipeline that is not in the measured set, so
    // no declared query gets a double-run advantage that shifts with Map
    // ordering.
    val w0 = System.nanoTime()
    graft.indicators.Indicators(graft.sources.Bars.fromEvents(spark, sfDir))
      .sma(Seq("close"), 5).toDF.count()
    val warmupSec = (System.nanoTime() - w0) / 1e9
    // A failed query is reported as the NEGATED elapsed seconds (and on
    // stderr) — a silent catch would make failures look like fast passes.
    // The per-query side channels (gc_ms / steal_ms / task_ms) make
    // outliers attributable (round-5 verdict item #1): wall-time
    // inflation with flat gc and task sums but rising steal is machine
    // contention; inflation with a matching task-sum rise on an
    // unchanged plan is hypervisor starvation of the task threads;
    // only inflation with neither is the engine's own regression.
    val gcQ = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val stealQ = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val taskQ = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val gc0 = gcMillis(); val st0 = stealMillis(); val tt0 = taskTime.get()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      gcQ(name) = gcMillis() - gc0
      stealQ(name) = stealMillis() - st0
      taskQ(name) = taskTime.get() - tt0
      // Query-scoped cache lifecycle: the LSH dedup queries persist
      // their signature frames (load-bearing under broadcast joins,
      // where ReuseExchange can't dedup the two sides); the harness
      // owns the release so repeated runs don't accumulate blocks.
      spark.catalog.clearCache()
      name -> (if (ok) dt else -dt)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(math.abs).sum else 0.0
    def jmap(m: scala.collection.Map[String, Long]) =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val meta = s"""{"warmup_sec":$warmupSec,"load_avg_start":$loadStart,""" +
      s""""load_avg_end":${loadAvg()},"gc_ms_total":${gcMillis()},""" +
      s""""steal_ms_total":${stealMillis()},"gc_ms":${jmap(gcQ)},""" +
      s""""steal_ms":${jmap(stealQ)},"task_ms":${jmap(taskQ)}}"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","meta":$meta}"""
    println(line)
    // Also write the line to a file: with 85 per-query entries the
    // stdout JSON can overflow a captured-tail limit (round 3's
    // BENCH_r03.json recorded "parsed": null), losing the
    // machine-readable total. The file is the durable copy.
    // Best-effort: an unwritable path must not fail the run whose
    // results are already on stdout.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch {
      case e: Exception =>
        System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
  }
}
