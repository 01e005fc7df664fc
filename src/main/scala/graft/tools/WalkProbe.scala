package graft.tools

import org.apache.spark.sql.functions._

import graft.pipeline.{CheckpointUtil, Similarity}
import graft.sources.Sessions

/** In-session A/B of the walk loop's per-hop truncation spelling
  * (r22): eager localCheckpoint per hop (one count() job per hop, the
  * pre-r22 shape) vs lazy per-hop marks with one eager cut at the end
  * (the next hop's broadcast collect materializes each frontier).
  * Alternated via Similarity.WalkTuning inside ONE session so a host
  * storm hits both arms. Output equality is hash-verified.
  */
object WalkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def stealMillis(): Long =
      try {
        val f = scala.io.Source.fromFile("/proc/stat").getLines()
          .find(_.startsWith("cpu ")).getOrElse("").trim.split("\\s+")
        if (f.length > 8) f(8).toLong * 10 else 0L
      } catch { case _: Exception => 0L }
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    embs.count()
    // the staged k=16 serving graph the declared walks use
    val graph = Similarity.graphPrefix(
      Similarity.knnWorkingList(embs), 16).localCheckpoint(true)
    def hashOf(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(coalesce(sum(xxhash64(col("query_id"), col("node"),
        round(col("cosine"), 9))), lit(0L))).head().getLong(0)
    var ref = 0L
    def run(name: String, eager: Boolean): Unit = {
      Similarity.WalkTuning.eagerHops = eager
      val st0 = stealMillis(); val t0 = System.nanoTime()
      val frontier = Similarity.walkFrontier(
        broadcast(
          embs.select(col("vec_id").as("query_id"), col("embedding").as("qe"),
            sqrt(graft.functions.dotF(col("embedding"), col("embedding"))).as("qn"))
            .where(col("query_id") < 8)),
        embs, graph, beam = 16, hops = 5, entryNode = 0L, truncate = true)
      val h = hashOf(frontier)
      val dt = (System.nanoTime() - t0) / 1e9
      if (ref == 0L) ref = h
      val eq = if (h == ref) "EQ" else "MISMATCH"
      println(f"[walk] $name ${dt}%6.2f s  steal=${stealMillis() - st0}%6d ms  $eq")
      CheckpointUtil.checkpointRdd(frontier).foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    (1 to 3).foreach { rep =>
      run(s"A(eager hops) rep$rep", eager = true)
      run(s"B(lazy hops)  rep$rep", eager = false)
    }
    Similarity.WalkTuning.eagerHops = false
    spark.stop()
  }
}
