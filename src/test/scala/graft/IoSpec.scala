package graft

import org.apache.spark.sql.functions._

import graft.sources.Io
import graft.pipeline.Multimodal

class IoSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-io-$name")
    d.toFile.deleteOnExit()
    d.resolve("out").toString
  }

  test("csv and json round-trip with explicit schemas (no inference pass)") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.0)).toDF("id", "s", "v")
    val c = tmp("csv"); val j = tmp("json")
    Io.writeCsv(df, c)
    Io.writeJson(df, j)
    val back1 = Io.readCsv(spark, c, df.schema).orderBy("id").collect()
    val back2 = Io.readJson(spark, j, df.schema).orderBy("id").collect()
    assert(back1.toSeq == df.orderBy("id").collect().toSeq)
    assert(back2.toSeq == df.orderBy("id").collect().toSeq)
  }

  test("partitioned parquet sink gives partition pruning on read") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"p${i % 4}", i * 1.0)).toDF("id", "part", "v")
    val p = tmp("parq")
    Io.writeParquet(df, p, partitionBy = Seq("part"), targetFiles = 2)
    val read = Io.readParquet(spark, p).where(col("part") === "p1")
    assert(read.count() == 25)
    val scan = read.queryExecution.executedPlan.toString
    // the predicate must land in PartitionFilters (directory skip), not
    // in a post-scan Filter over all partitions
    assert(scan.contains("PartitionFilters: [isnotnull(part"), scan)
  }

  test("multimodal resize seam: NN resampling rescales payload with pixel ratio") {
    val d = Multimodal.Decoded(20, 10, 1, Array.tabulate(200)(_.toByte))
    val r = Multimodal.resize(d, 10, 5)
    assert(r.width == 10 && r.height == 5)
    assert(r.payload.length == 50) // 200 * (10*5)/(20*10)
    // NN sampling: index i maps to source i * 200 / 50 = 4i
    assert(r.payload.toSeq == (0 until 50).map(i => (4 * i).toByte))
    // featurize path accepts the resize hook end-to-end
    import spark.implicits._
    val ds = Seq(Multimodal.MediaRecord(1L, "text", "hello world graft".getBytes, "src"))
      .toDS()
    val out = Multimodal.extractFeatures(ds, resizeTo = Some((8, 8))).collect()
    assert(out.length == 1 && out.head.width == 8 && out.head.height == 8)
    assert(math.abs(out.head.features.sum - 1.0f) < 1e-6)
  }
}
