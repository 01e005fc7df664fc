package graft
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity
class ScratchKnnSpec extends SparkSpec {
  test("recall sweep") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val a = e.select(col("vec_id").as("u"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("v"), col("embedding").as("eb"))
    val cos = graft.functions.dotF(col("ea"), col("eb")) /
      (sqrt(graft.functions.dotF(col("ea"), col("ea"))) *
        sqrt(graft.functions.dotF(col("eb"), col("eb"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("u").orderBy(col("cos").desc, col("v").asc)
    val exact = a.crossJoin(b).where(col("u") =!= col("v"))
      .select(col("u"), col("v"), cos.as("cos"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 4)
      .select("u", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (it <- Seq(1, 2, 3, 4, 6)) {
      val got = Similarity.knnGraph(e, k = 4, iters = it).collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"))).toSet
      println(s"ITERS=$it RECALL=${got.intersect(exact).size.toDouble / exact.size}")
    }
  }
}
