package graft.tools
import graft.sources.Sessions
/** One-off plan audit for the round-17 touched/new queries (kept as a
  * tool so the audit is re-runnable; prints Exchange/Sort/
  * SinglePartition counts plus the collect_list/ObjectHashAggregate
  * scan the round-16 verdict asked for on the shard digest).
  */
object R17PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = Seq(
      "shard_export_roundtrip", "corpus_datasheet_sketch",
      "corpus_datasheet", "approx_distinct_kmv", "events_attribution",
      "pack_batches_epochs", "corpus_sample_fixed_n",
      "deletion_impact_report")
    names.foreach { n =>
      val df = graft.QueriesPipeline.queries(n)(spark, dir)
      val p = df.queryExecution.executedPlan.toString
      // negative lookbehind: a BroadcastExchange must not inflate the
      // SHUFFLE-exchange figure this audit exists to count
      val ex = "(?<!Broadcast)Exchange".r.findAllIn(p).length
      val sp = "SinglePartition".r.findAllIn(p).length
      val bc = "BroadcastExchange".r.findAllIn(p).length
      val cl = "collect_list".r.findAllIn(p).length
      val oha = "ObjectHashAggregate".r.findAllIn(p).length
      println(f"$n%-26s exchanges=$ex%-3d broadcast=$bc%-3d " +
        f"singlePartition=$sp%-3d collect_list=$cl%-3d objHashAgg=$oha")
    }
    spark.stop()
  }
}
