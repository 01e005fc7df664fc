package graft.tools

import org.apache.spark.sql.SparkSession

/** Simulates the driver's smoke check: a SparkSession built WITHOUT
  * graft's session settings must still run SparkEntry.entry (the
  * nanos-parquet conf is applied at runtime by Bars.readEvents).
  */
object BareSessionCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows=$n")
    assert(n > 0, "entry must return rows under a bare session")
    spark.stop()
  }
}
