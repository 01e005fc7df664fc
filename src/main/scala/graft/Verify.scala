package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — an explicit name list
    // restricts the dump (local spot-checks); the driver passes none.
    // Unknown names fail loudly: a typo'd filter would otherwise write
    // an empty dump that downstream compares read as vacuously green.
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown query name(s): ${unknown.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.sources.Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally spark.catalog.clearCache() // release query-scoped persists
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Trained-rotation fixture for the OPQ oracles: the deterministic
    // 64×64 Opq.trainRotation output (exact doubles, long rows of
    // array<double>) dumped where DuckDB can read it — the eigensolve
    // has no SQL spelling, so the oracle applies the rotation as a
    // matmul and replays everything downstream (PQ training, encode,
    // ADC) from scratch. IvfChain memoizes, so this is the SAME matrix
    // the OPQ queries above just used.
    // Absolute: the oracle SQL is executed by the driver's DuckDB,
    // whose working directory need not be Verify's — a relative
    // fixture path would silently resolve against the wrong root.
    // SIBLING of outDir, not inside it: the correctness driver scans
    // every outDir subdirectory as a query result, so a fixture
    // placed there produces a spurious non-query row in the record
    // (round-10 verdict's `_opq_rotation` err entry).
    val opqRotDir =
      new java.io.File(s"${outDir}_fixtures/opq_rotation").getAbsolutePath
    try {
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      graft.pipeline.IndexStore.saveRotation(
        spark, graft.pipeline.IvfChain.opqRotation(spark, sfDir, e), opqRotDir)
    } catch { case e: Throwable =>
      System.err.println(s"[verify] opq rotation fixture failed: ${e.getMessage}")
    }
    // {SFDIR} -> the actual scale dir: oracles over tables the driver
    // may not register as views (documents/embeddings) read the parquet
    // directly. {OPQROT} -> the rotation fixture dumped above.
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) =>
        s"${q(k)}: ${q(v.replace("{SFDIR}", sfDir).replace("{OPQROT}", opqRotDir))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    graft.pipeline.Chains.releaseAll(spark)
    spark.stop()
  }
}
