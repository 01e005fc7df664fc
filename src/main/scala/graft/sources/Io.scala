package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink helpers with the 100 TB disciplines baked in:
  *
  *  - readers take an EXPLICIT schema — schema inference on csv/json
  *    is a full extra pass over the data (at 100 TB, an extra 100 TB
  *    scan) and silently types everything it guesses;
  *  - the parquet sink supports `partitionBy` so downstream readers
  *    get partition pruning (a predicate on the partition column
  *    becomes a directory skip, verified in IoSpec), and a target
  *    file-count repartition so writers neither emit thousands of tiny
  *    files nor one giant one.
  */
object Io {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** `targetFiles` bounds output file count — total without
    * `partitionBy`, PER PARTITION VALUE with it. The partitioned path
    * repartitions on (partition columns, salt): the partition columns
    * keep each task to few values (one open parquet writer each — a
    * plain round-robin repartition hands every task rows of EVERY
    * value: numValues x tasks files and the many-open-writers OOM),
    * and the salt spreads one value over up to `targetFiles` tasks —
    * without it each value collapses into a single task and a hot
    * value is written as one giant file, the exact skew case the bound
    * exists for.
    */
  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil, targetFiles: Int = 0): Unit = {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val d =
      if (targetFiles <= 0) df
      else if (partitionBy.nonEmpty) {
        val salt = pmod(hash(df.columns.map(col): _*), lit(targetFiles))
        df.repartition(partitionBy.map(col) :+ salt: _*)
      } else df.repartition(targetFiles)
    val w = d.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed + sorted external table — the storage layout for a key
    * that gets joined REPEATEDLY (a doc-keyed feature store, an
    * embedding sidecar): pay the partitioning shuffle once at write
    * time, then every later join of two tables bucketed on the key
    * runs with NO exchange (asserted in BucketingSpec against the
    * executed plan, not assumed). At 100 TB that converts the
    * dominant per-query cost of the join family into a one-time
    * write-side cost.
    *
    * The explicit `repartition(numBuckets, key)` before the write is
    * load-bearing: Spark's bucket hash IS Murmur3 hash partitioning,
    * so each write task holds exactly one bucket's rows and emits ONE
    * file per bucket — without it every task writes a sliver of every
    * bucket (tasks×buckets small files). The reader still runs a
    * per-bucket in-memory Sort before the merge join (Spark 4 does
    * not trust file-level order from bucketed scans); the win this
    * layout buys is the absent EXCHANGE, which is the cost that
    * scales with the corpus.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, numBuckets: Int = 8): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartition(numBuckets, col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}

/** Write-once/serve-many JSONL shard delivery — the DedupStateStore
  * stance applied to the TRAINING-DATA SINK: on first touch per
  * (JVM, sfDir) the token-balanced shard plan is materialized as gzip
  * JSONL shard directories (tools/ExportShards' write shape: one
  * repartition-aligned task per shard, partitionBy directory
  * addressing); every later touch — including bench passes — serves
  * the written files. This is what makes the sink a DECLARED,
  * oracle-checked surface instead of a tool: the round-trip query
  * reads the JSONL back and digests its content, so any write-side
  * loss (escaping, truncation, mis-sharding) goes red against an
  * oracle that never saw the files.
  */
object ShardStore {
  private lazy val storeRoot: String =
    java.nio.file.Files.createTempDirectory("graft_shards_").toString

  /** The JSONL data dir for `sfDir`'s export, written on first touch. */
  def dataDir(spark: SparkSession, sfDir: String, nShards: Int = 8): String =
    synchronized {
      val key = java.security.MessageDigest.getInstance("MD5")
        .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val p = s"$storeRoot/$key"
      val marker = new java.io.File(p, "_SAVED")
      if (!marker.exists()) {
        graft.tools.ExportShards.export(spark, sfDir, p, nShards)
        marker.createNewFile()
      }
      s"$p/data"
    }
}
