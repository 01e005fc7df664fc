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

  test("DedupStateStore: the served incremental filter is bit-identical to in-memory state") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import graft.pipeline.{Corpus, DedupStateStore}
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val boiler = "w1 w2 w3 w4 w5 w6 w7 w8"
    val snap = spark.createDataFrame(java.util.Arrays.asList(
      Row(1L, s"alpha beta $boiler gamma delta"),
      Row(2L, "entirely distinct snapshot words here okay fine")), schema)
    val delta = spark.createDataFrame(java.util.Arrays.asList(
      Row(10L, s"fresh opening $boiler closing words"), // leaks the snapshot run
      Row(20L, "completely novel delta document nothing shared")), schema)
    def rows(state: org.apache.spark.sql.DataFrame) =
      Corpus.substringDedupFilterIncremental(state, delta)
        .orderBy("doc_id").collect().map(_.toString).toSeq
    val inMem = rows(Corpus.substringFirstOccurrences(snap))
    // two serves from the same (dir, snapshot): second hits the disk path
    val dir = tmp("dedupstate")
    val served1 = rows(DedupStateStore.substringFirstsServed(spark, dir, snap))
    val served2 = rows(DedupStateStore.substringFirstsServed(spark, dir,
      sys.error("second touch must load, not recompute")))
    assert(served1 == inMem && served2 == inMem)
    // the STORED key is the fixed-width 16-byte binary form (round-12
    // compact-exchange contract), not the 32-char hex spelling
    val stored = DedupStateStore.substringFirstsServed(spark, dir,
      sys.error("schema probe must load, not recompute"))
    assert(stored.schema("wkey").dataType ==
      org.apache.spark.sql.types.BinaryType,
      s"state key must be binary, got ${stored.schema("wkey").dataType}")
    // sanity: the leaked run was actually removed from doc 10
    assert(inMem.exists(_.contains("10")))
  }

  test("IndexStore round-trip: search from loaded artifacts is bit-identical") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    import graft.pipeline.{IndexStore, Opq, Similarity, TrainedIndex}
    // deterministic pseudo-random 64-dim float vectors
    def gauss(seed: Long): Double = {
      val h = seed * 0x9E3779B97F4A7C15L
      ((h >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val e = spark.createDataFrame(
      (0 until 64).map { v =>
        Row(v.toLong,
          IndexedSeq.tabulate(64)(k => gauss(v.toLong * 997 + k).toFloat))
      }.asJava, embSchema)
    val trained = TrainedIndex(
      Some(Opq.trainRotation(e)),
      Similarity.kmeansCentroids(Opq.rotate(e, Opq.trainRotation(e))),
      Similarity.pqCodebooks(Opq.rotate(e, Opq.trainRotation(e))))
    val p = tmp("idx")
    IndexStore.save(p, trained)
    val loaded = IndexStore.load(spark, p)
    // the rotation round-trips to the exact doubles
    assert(loaded.rotation.get.map(_.toSeq).toSeq ==
      trained.rotation.get.map(_.toSeq).toSeq)
    // search from the loaded artifacts is bit-identical to search from
    // the freshly trained ones (parquet preserves doubles exactly)
    def search(idx: TrainedIndex) =
      Similarity.topKIvfPq(
          Opq.rotate(e, idx.rotation.get), idx.centroids, idx.books)
        .orderBy("query_id", "rank")
        .collect().toSeq
    assert(search(loaded) == search(trained))
  }

  test("ExportShards: JSONL shard export round-trips and matches the plan") {
    val out = java.nio.file.Files.createTempDirectory("graft_shards_t_").toString
    val manifest = graft.tools.ExportShards
      .export(spark, "/root/testdata/sf0.001", out, nShards = 4)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(manifest.keySet == Set(0L, 1L, 2L, 3L))
    // contiguity: shard doc_id ranges must not overlap
    val ranges = manifest.toSeq.sortBy(_._1).map(_._2)
    ranges.zip(ranges.tail).foreach { case ((_, _, _, lastA), (_, _, firstB, _)) =>
      assert(lastA < firstB, "shard doc_id ranges must be disjoint and ordered")
    }
    // round trip: the written JSONL carries every document exactly once
    val back = spark.read.json(s"$out/data")
    assert(back.count() == 500)
    assert(back.select("doc_id").distinct().count() == 500)
    // per-shard counts in the data agree with the manifest
    // the shard partition column comes back from the directory path
    // as an inferred INT — normalize
    val perShard = back.groupBy("shard").count().collect()
      .map(r => r.getAs[Number](0).longValue -> r.getLong(1)).toMap
    manifest.foreach { case (s, (nDocs, _, _, _)) =>
      assert(perShard(s) == nDocs, s"shard $s count mismatch")
    }
    // token balance: no shard beyond 2x the ideal share
    val ideal = manifest.values.map(_._2).sum / 4.0
    manifest.foreach { case (s, (_, nTok, _, _)) =>
      assert(nTok < 2 * ideal, s"shard $s unbalanced: $nTok vs ideal $ideal")
    }
  }

  test("shard_export_roundtrip digest is an order-free fold (no per-doc buffering in the plan)") {
    val df = graft.QueriesPipeline
      .queries("shard_export_roundtrip")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // the r16 digest buffered every doc of a shard in a collect_list
    // aggregation buffer — a per-reducer memory cliff at 100 TB shard
    // sizes. The bit_xor fold keeps the shard group in constant space:
    // no object-buffering aggregate may appear anywhere in the plan.
    assert(!plan.contains("collect_list"),
      "shard digest must not buffer per-doc state")
    assert(!plan.contains("ObjectHashAggregate"),
      "shard digest must stay in fixed-width hash aggregation")
    // order independence of the fold itself: xor over any permutation
    // of the same per-doc hashes yields the same digest, so the query
    // needs no sort — pin the algebra on a tiny frame
    import spark.implicits._
    val h = Seq(7L, 11L, 13L).toDF("v")
    val fwd = h.agg(expr("bit_xor(v)")).head.getLong(0)
    val rev = Seq(13L, 7L, 11L).toDF("v").agg(expr("bit_xor(v)")).head.getLong(0)
    assert(fwd == rev && fwd == (7L ^ 11L ^ 13L))
    // the xor blind spot the checksum column exists for: a doc
    // duplicated to EVEN multiplicity xor-cancels ({a,a,b} folds to
    // the same digest as {b}), but the modular-sum checksum shifts by
    // 2·(a mod p) — the count-preserving dup+drop corruption goes red
    // on the checksum even where digest, and possibly n_tokens, agree
    val p = 1000000007L
    def fold(vs: Seq[Long]) = {
      val df = vs.toDF("v")
      (df.agg(expr("bit_xor(v)")).head.getLong(0),
        df.agg(sum(col("v") % p)).head.getLong(0))
    }
    val (xCorrupt, sCorrupt) = fold(Seq(7L, 7L, 11L))
    val (xTrue, sTrue) = fold(Seq(11L))
    assert(xCorrupt == xTrue, "xor alone is blind to even multiplicity")
    assert(sCorrupt != sTrue, "the checksum catches what the xor misses")
  }

  test("Zorder: morton16 interleaves bits; bin8 clamps and guards degenerate ranges") {
    import spark.implicits._
    val out = Seq((0, 0), (255, 255), (1, 0), (0, 1), (3, 5))
      .toDF("x", "y")
      .select(graft.sources.Zorder.morton16(col("x"), col("y")).as("z"))
      .collect().map(_.getInt(0))
    def ref(x: Int, y: Int) = (0 until 8).map(b =>
      (((x >> b) & 1) << (2 * b + 1)) | (((y >> b) & 1) << (2 * b))).sum
    assert(out.toSeq == Seq((0, 0), (255, 255), (1, 0), (0, 1), (3, 5)).map((ref _).tupled))
    assert(ref(255, 255) == 65535 && ref(1, 0) == 2 && ref(0, 1) == 1)
    // degenerate (constant) dimension bins to 0 everywhere
    val bins = Seq(1.0, 1.0).toDF("v")
      .select(graft.sources.Zorder.bin8(col("v"), lit(1.0), lit(1.0)).as("b"))
      .collect().map(_.getInt(0))
    assert(bins.toSeq == Seq(0, 0))
  }

  test("Zorder.writeZordered: per-file zkey ranges are disjoint (the skipping property)") {
    val ev = graft.sources.Bars.readEvents(spark, "/root/testdata/sf0.001")
    val path = tmp("zorder")
    graft.sources.Zorder.writeZordered(ev, path, col("user_id"), col("value"), numFiles = 8)
    val ranges = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("zkey").as("lo"), max("zkey").as("hi"))
      .collect().map(r => (r.getAs[Int]("lo"), r.getAs[Int]("hi")))
      .sortBy(_._1)
    assert(ranges.length > 1)
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) =>
      assert(hi <= lo2, s"overlapping zkey ranges: $ranges")
    }
  }

  test("Zorder.skippingStats: z-order bounds the worst dimension below the linear layout") {
    val ev = graft.sources.Bars.readEvents(spark, "/root/testdata/sf0.001")
    val rows = graft.sources.Zorder
      .skippingStats(ev, col("user_id"), col("value")).collect()
      .map(r => (r.getAs[String]("layout"), r.getAs[String]("probe_dim")) ->
        r.getAs[Double]("scan_fraction")).toMap
    // linear: near-perfect on its own dimension, near-full on the other;
    // zorder: balanced — its worst dimension beats linear's worst
    assert(rows(("linear", "x")) < rows(("zorder", "x")))
    assert(rows(("zorder", "y")) < rows(("linear", "y")))
    val worstZ = math.max(rows(("zorder", "x")), rows(("zorder", "y")))
    val worstL = math.max(rows(("linear", "x")), rows(("linear", "y")))
    assert(worstZ < worstL)
  }
}
