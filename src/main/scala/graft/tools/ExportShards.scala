package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data DELIVERY sink: materialize the token-balanced shard
  * plan ([[graft.pipeline.Corpus.shardAssign]]) as compressed JSONL
  * shard directories plus a manifest — the format a training job's
  * data loader actually consumes (one worker streams one shard; the
  * manifest tells the scheduler how many docs/tokens each shard
  * carries without opening it).
  *
  * Write shape: one partitioned write — `repartition(shard)` aligns
  * each write task with exactly one shard directory (the
  * Io.writeBucketed argument: no task writes a sliver of every
  * shard), `partitionBy("shard")` gives the loader directory-level
  * addressing, gzip keeps shard bytes near wire size. The manifest is
  * a second, shards-sized aggregate — never a driver-side loop over
  * documents.
  *
  * Usage: runMain graft.tools.ExportShards [sfDir] [outDir] [nShards]
  */
object ExportShards {

  /** Writes gzip JSONL under `outDir/data/shard=K/` + an
    * `outDir/_manifest` parquet;
    * returns the manifest frame (shard, n_docs, n_tokens, min/max
    * doc_id — contiguity witnesses: shard boundaries are doc_id
    * ranges by construction).
    */
  def export(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      nShards: Int = 8): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = graft.pipeline.Corpus.shardAssign(docs, nShards)
      .select(col("doc_id"), col("n_tokens"), col("shard"))
    val keyed = docs.join(plan, Seq("doc_id"))
    keyed
      .repartition(nShards, col("shard"))
      .write.mode("overwrite")
      .partitionBy("shard")
      .option("compression", "gzip")
      .json(s"$outDir/data")
    val manifest = plan
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"),
        min(col("doc_id")).as("first_doc_id"),
        max(col("doc_id")).as("last_doc_id"))
      .orderBy("shard")
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$outDir/_manifest")
    spark.read.parquet(s"$outDir/_manifest")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft_shards_").toString)
    val nShards = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = graft.sources.Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val m = export(spark, sfDir, outDir, nShards)
    m.show(nShards, truncate = false)
    println(s"// wrote $nShards shards to $outDir")
    spark.stop()
  }
}
