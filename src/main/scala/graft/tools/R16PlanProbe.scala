package graft.tools
import graft.sources.Sessions
/** One-off plan audit for the round-16 queries (kept as a tool so the
  * audit is re-runnable; prints Exchange/Sort/SinglePartition counts).
  */
object R16PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = Seq(
      "decontaminate_bloom", "decontaminate_bloom_fp",
      "decontaminate_bloom_fp_8kb", "events_attribution",
      "source_drift_report", "lang_id_model", "lang_id_agreement",
      "pack_batches_epochs", "embedding_spectrum",
      "embedding_intrinsic_dim", "events_rfm_segments",
      "ann_topk_opq_ivfpq")
    names.foreach { n =>
      val df = graft.QueriesPipeline.queries(n)(spark, dir)
      val p = df.queryExecution.executedPlan.toString
      val ex = "Exchange".r.findAllIn(p).length
      val sp = "SinglePartition".r.findAllIn(p).length
      val bc = "BroadcastExchange".r.findAllIn(p).length
      println(f"$n%-28s exchanges=$ex%-3d broadcast=$bc%-3d singlePartition=$sp")
    }
    spark.stop()
  }
}
