package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.Sessions

/** One-shot plan probe (round 19): does the binary-prefilter's
  * per-node top-candK window execute with WindowGroupLimit — Spark's
  * partial top-k pushdown that prunes each map partition to its local
  * candK rows per key BEFORE the exchange — or does the full
  * candidate volume cross the shuffle? knnWorkingList localCheckpoints
  * eagerly, so the returned frame's plan is just the checkpoint scan;
  * this probe rebuilds the EXACT shortlist shape (candidate self-join
  * → broadcast bits joins → row_number ≤ candK) un-checkpointed and
  * prints the physical plan verdict.
  */
object R19PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(
      args.headOption.getOrElse("/root/testdata/sf0.001") + "/embeddings.parquet")
    val ub = broadcast(e.select(
      col("vec_id").as("ubid"),
      graft.pipeline.Similarity.signBits(col("embedding")).as("ubits")))
    val vb = broadcast(e.select(
      col("vec_id").as("vbid"),
      graft.pipeline.Similarity.signBits(col("embedding")).as("vbits")))
    val g = e.select(col("vec_id").as("u"), (col("vec_id") + 1).as("v"))
    val cand = g.as("a").join(g.as("b"), col("a.v") === col("b.u"))
      .select(col("a.u").as("u"), col("b.v").as("v"))
      .where(col("u") =!= col("v"))
    val shortlist = graft.pipeline.Similarity.descentShortlist(cand, ub, vb, 128)
    val plan = shortlist.queryExecution.executedPlan.toString
    println("HAS WindowGroupLimit: " + plan.contains("WindowGroupLimit"))
    plan.linesIterator
      .filter(l => l.contains("WindowGroupLimit") || l.contains("Window") ||
        l.contains("Exchange"))
      .take(12).foreach(l => println(l.take(160)))
    spark.stop()
  }
}
