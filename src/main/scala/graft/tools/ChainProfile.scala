package graft.tools

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup
import graft.sources.Sessions

/** One-off stage-by-stage timing of the LSH chain build at a scale
  * dir: shingle hashing, signatures, banding+explode, candidate join,
  * jaccard — to locate where the per-session build cost sits.
  */
object ChainProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    def time(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[chain] $what%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
      spark.catalog.clearCache()
    }
    time("tokenize only") {
      docs.select(size(split(col("text"), " ")).as("n")).agg(sum("n")).head().getLong(0)
    }
    time("shingle strings") {
      docs.select(explode(graft.pipeline.TextOps.shingles(col("text"))).as("s")).count()
    }
    time("shingle md5 hashes") {
      docs.select(explode(transform(graft.pipeline.TextOps.shingles(col("text")),
        s => graft.pipeline.TextOps.hash32(s))).as("h")).agg(max("h")).head().getLong(0)
    }
    time("minhash signatures")(Dedup.minhashSignatures(docs).count())
    time("banded explode")(Dedup.lshBands(Dedup.minhashSignatures(docs))
      .select(col("doc_id"), explode(array((0 until 4).map(b => col(s"band$b")): _*)))
      .count())
    time("candidate pairs full")(Dedup.lshCandidatePairs(docs).count())
    time("jaccard full")(
      Dedup.jaccardPairs(Dedup.lshCandidatePairs(docs), docs).count())
    // A/B (interleaved twice — host noise dodging): the fused
    // shingle->md5 path the chain uses today vs a localCheckpoint-
    // staged shingle frame shared by the signature and jaccard stages.
    // Decides whether DedupChain's "shingles NOT staged" call still
    // holds now that token hashes stage separately.
    def fused(): Long = {
      val n = Dedup.jaccardPairs(Dedup.lshCandidatePairs(docs), docs).count()
      spark.catalog.clearCache(); n
    }
    def staged(): Long = {
      val sh = Dedup.shingled(docs).localCheckpoint(true)
      val n = Dedup.jaccardPairsSh(Dedup.lshCandidatePairsSh(sh), sh).count()
      spark.catalog.clearCache()
      graft.pipeline.CheckpointUtil.checkpointRdd(sh).foreach(_.unpersist(false))
      n
    }
    time("A fused jaccard #1")(fused())
    time("B staged-shingle jaccard #1")(staged())
    time("A fused jaccard #2")(fused())
    time("B staged-shingle jaccard #2")(staged())
    spark.stop()
  }
}
