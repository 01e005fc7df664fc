package graft.tools
import graft.sources.Sessions
/** One-off plan audit for the round-15 queries (kept as a tool so the
  * audit is re-runnable; prints Exchange/Sort/SinglePartition counts).
  */
object R15PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = Seq(
      "pii_report", "pack_padding_audit", "join_skew_plan",
      "pack_semantic_order", "events_attribution", "corpus_sample_fixed_n",
      "events_rate_anomaly", "embedding_outliers", "hybrid_search_rrf",
      "dedup_minhash_bbit", "bpe_budget_sweep", "wordpiece_budget_sweep",
      "source_drift_report", "decontaminate_bloom_fp", "eval_cut_leakage_safe")
    names.foreach { n =>
      val df = graft.QueriesPipeline.queries(n)(spark, dir)
      val p = df.queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(p).length
      val sp = "SinglePartition".r.findAllIn(p).length
      val bc = "BroadcastExchange".r.findAllIn(p).length
      println(f"$n%-26s exchanges=$ex%-3d broadcast=$bc%-3d singlePartition=$sp")
    }
    spark.stop()
  }
}
