package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A trained ANN index as data: the coarse quantizer (IVF centroids),
  * the subspace codebooks (PQ books), and — for the OPQ family — the
  * orthogonal rotation applied before the subspace split. All three
  * are tiny relative to the corpus they index (k·d + m·ksub·(d/m) + d²
  * numbers), which is the entire point of persisting them: at 100 TB
  * the index artifacts are kilobytes written once, while the training
  * that produced them scanned the corpus.
  */
final case class TrainedIndex(
    rotation: Option[Array[Array[Double]]],
    centroids: DataFrame,
    books: DataFrame)

/** Parquet persistence for trained index artifacts — the missing
  * production step between "train per session" (IvfChain's in-memory
  * staging) and "train once, serve many times" (how FAISS-style
  * deployments actually run): centroids/books round-trip as plain
  * frames, the rotation as long-form (r, rrow) rows of exact doubles
  * (the same layout the Verify oracle fixture uses, so one spelling of
  * the artifact exists on disk). Doubles survive parquet bit-exactly,
  * so search from loaded artifacts is pinned bit-identical to search
  * from freshly trained ones (IoSpec round-trip test).
  */
object IndexStore {

  def save(path: String, idx: TrainedIndex): Unit = {
    idx.centroids.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    idx.books.coalesce(1).write.mode("overwrite").parquet(s"$path/books")
    idx.rotation.foreach(saveRotation(idx.centroids.sparkSession, _, s"$path/rotation"))
  }

  /** The rotation alone, in the oracle-readable (r, rrow) long form —
    * also called by Verify to dump the {OPQROT} fixture.
    */
  def saveRotation(
      spark: SparkSession, rows: Array[Array[Double]], path: String): Unit = {
    import spark.implicits._
    rows.toSeq.zipWithIndex
      .map { case (row, r) => (r, row.toSeq) }
      .toDF("r", "rrow")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): TrainedIndex = {
    val rotDir = new java.io.File(s"$path/rotation")
    val rotation =
      if (!rotDir.isDirectory) None
      else Some(
        spark.read.parquet(s"$path/rotation")
          .orderBy("r")
          .collect()
          .map(_.getSeq[Double](1).toArray))
    TrainedIndex(
      rotation,
      spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/books"))
  }
}
