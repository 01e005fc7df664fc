package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DISTRIBUTED trainer for the committed linear quality-model weights
  * ([[graft.pipeline.Corpus.QualityModelWMicro]]) — the in-repo
  * record of "trained by exactly this procedure", the same
  * artifact-not-code stance as the BPE merge table and the OPQ
  * rotation fixture.
  *
  * Model: logistic regression over 64 hashed-token-bucket frequency
  * features (fastText/DCLM-style classifier quality filtering, with
  * a hashed bag-of-words instead of a learned embedding):
  * x_j = count(tokens t with hash32("qm_" + t) % 64 == j) / n_tokens,
  * label = the repo's own rule-based gate (gopherKeep AND
  * qualityScore >= 0.5) — i.e. the classifier DISTILLS the committed
  * rule gate into a single dot product, the way production pipelines
  * distill an expensive teacher signal into a cheap linear scorer.
  * Plus 5 dense text-shape features (length, mean word len, alpha
  * frac, distinct stops, dup-trigram frac) scaled to ~[0,1].
  *
  * Scale shape (replacing the round-11 whole-corpus text collect):
  * feature extraction and labeling run DISTRIBUTED, map-only, where
  * the data lives ([[org.apache.spark.sql.graft.expressions.QmFeaturesF]]
  * — one kernel pass per doc, no shuffle); a deterministic hash
  * sample caps the training set at `maxTrain` rows, and only that
  * bounded fixed-width feature matrix (≤ maxTrain × 69 doubles, ~55 MB
  * at the 100k default — a documented bounded artifact, the OPQ
  * moment-pass stance) reaches the driver, never the corpus text.
  * The optimizer itself (full-batch gradient descent, lr 50, 20k
  * epochs, zero init) is deliberately driver-side over that bounded
  * matrix — the fastText reality: quality classifiers train on a
  * bounded labeled sample while the corpus-scale costs are feature
  * extraction (distributed here) and serving (the map-only integer
  * dot product in [[graft.pipeline.Corpus.qualityModelScore]]).
  * Deterministic end to end: the sample is hash-selected, rows are
  * collected in doc_id order, and the kernel reproduces the round-11
  * per-doc arithmetic byte for byte — so the distributed trainer
  * re-derives the COMMITTED weights exactly (PipelineSpec pins the
  * full train-and-compare round trip on the real corpus).
  *
  * Final weights are rounded to integer MICROS so the serving-side
  * dot product is exact integer arithmetic (the doc_logprob
  * convention) with ONE trailing IEEE division — bit-reproducible
  * across Spark and DuckDB without transcendentals at query time
  * (the sigmoid is monotone, so keep = logit >= 0 needs no exp()).
  *
  * Usage: runMain graft.tools.TrainQualityModel [sfDir] [lr] [epochs]
  */
object TrainQualityModel {
  private val B = org.apache.spark.sql.graft.expressions.QmFeaturesF.B

  private def qmFeats(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.expressions.QmFeaturesF(
        org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** Distributed feature+label pass -> bounded driver matrix. The
    * hash sample keeps every k-th doc (k = ceil(n / maxTrain),
    * hash-selected so the sample is corpus-order-independent), rows
    * arrive in doc_id order.
    */
  def trainingMatrix(docs: DataFrame,
      maxTrain: Long = 100000L): Array[(Array[Double], Double)] = {
    val n = docs.count()
    val k = math.max(1L, (n + maxTrain - 1) / maxTrain)
    docs.select(
        col("doc_id"),
        qmFeats(col("text")).as("x"),
        (graft.pipeline.Corpus.gopherKeep() &&
          graft.pipeline.TextOps.qualityScore(col("text")) >= 0.5).as("y"))
      .where(pmod(graft.pipeline.TextOps.hash32(
        concat(lit("qmtrain_"), col("doc_id").cast("string"))), lit(k)) === 0)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getSeq[Double](1).toArray, if (r.getBoolean(2)) 1.0 else 0.0))
  }

  /** Full-batch logistic GD over the bounded matrix; returns
    * (hashed wMicro, dense wMicro, biasMicro, micro-rounded train
    * accuracy vs the teacher gate).
    */
  def fit(feats: Array[(Array[Double], Double)],
      lr: Double = 50.0, epochs: Int = 20000)
      : (Array[Long], Array[Long], Long, Double) = {
    val D = B + 5
    val w = new Array[Double](D)
    var b = 0.0
    for (_ <- 1 to epochs) {
      val gw = new Array[Double](D)
      var gb = 0.0
      feats.foreach { case (x, y) =>
        var z = b
        var j = 0
        while (j < D) { z += w(j) * x(j); j += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val d = p - y
        j = 0
        while (j < D) { gw(j) += d * x(j); j += 1 }
        gb += d
      }
      val m = feats.length.toDouble
      var j = 0
      while (j < D) { w(j) -= lr * gw(j) / m; j += 1 }
      b -= lr * gb / m
    }
    val wMicro = w.map(x => math.round(x * 1e6))
    val bMicro = math.round(b * 1e6)
    // distillation fidelity of the MICRO-rounded model (what ships):
    // the serving expression computes the hashed part as an exact
    // integer sum over tokens, the dense part in fixed-order doubles
    val acc = feats.count { case (x, y) =>
      val zh = x.take(B).zip(wMicro.take(B)).map { case (xi, wi) => xi * wi }.sum
      val zd = x.drop(B).zip(wMicro.drop(B)).map { case (xi, wi) => xi * (wi / 1e6) }.sum
      val z = zh / 1e6 + zd + bMicro / 1e6
      (z >= 0) == (y > 0.5)
    }.toDouble / feats.length
    (wMicro.take(B), wMicro.drop(B), bMicro, acc)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.sources.Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val feats = trainingMatrix(docs)
    println(s"// base rate y=1: ${feats.count(_._2 > 0.5)} / ${feats.length}")
    val lr = args.lift(1).map(_.toDouble).getOrElse(50.0)
    val epochs = args.lift(2).map(_.toInt).getOrElse(20000)
    val (wHash, wDense, bMicro, acc) = fit(feats, lr, epochs)
    println(s"// trained on $sfDir, ${feats.length} docs, " +
      f"micro-rounded train accuracy vs teacher gate: $acc%.4f")
    println(s"  val QualityModelWMicro: Array[Long] = Array(")
    println(wHash.grouped(8).map(g => "    " + g.mkString(", ")).mkString(",\n"))
    println("  )")
    println(s"  val QualityModelDenseWMicro: Array[Long] = Array(${wDense.mkString(", ")})")
    println(s"  val QualityModelBiasMicro: Long = ${bMicro}L")
    spark.stop()
  }
}
