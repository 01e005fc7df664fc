package graft

import org.apache.spark.sql.functions._

/** Bucketing: the co-located-join technique the 100 TB design leans on
  * for repeated large-large joins (SURVEY.md "partitioning & shuffle").
  * Writing both sides bucketed+sorted on the join key lets the
  * sort-merge join read buckets 1:1 with NO exchange and NO sort —
  * asserted here against the executed plan, not assumed.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key runs with no exchange") {
    import spark.implicits._
    val n = 1000
    val a = (1 to n).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to n).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    a.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_a")
    b.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path a genuinely large-large join takes
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
      assert(joined.count() == n)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("BucketStore-served join is exchange- and sort-free; layout invisible in result") {
    val dir = "/root/testdata/sf0.001"
    val (dTab, eTab) = graft.pipeline.BucketStore.tables(spark, dir)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(dTab).join(spark.table(eTab), Seq("doc_id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed store join should not shuffle:\n$plan")
      // A per-partition Sort remains: Spark 4 deliberately does not
      // trust file-level sort order from bucketed scans (the legacy
      // bucketedTableScanOutputOrdering behavior was removed — a
      // multi-file bucket interleaves runs). That sort is linear,
      // in-memory, per-bucket; the EXCHANGE is the cost that matters
      // at 100 TB and it is gone (asserted above).
      assert(plan.contains("SelectedBucketsCount: 8 out of 8"), plan)
      // same rows as joining the raw parquet inputs directly
      val raw = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"))
        .join(spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id").as("doc_id")), Seq("doc_id"))
      assert(joined.count() == raw.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
