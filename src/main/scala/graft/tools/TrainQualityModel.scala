package graft.tools

import org.apache.spark.sql.functions._

/** FIXTURE TRAINER for the committed linear quality-model weights
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
  * Full-batch gradient descent, lr 50, 20k epochs, zero init —
  * deterministic end to end (doc order fixed by doc_id; the feature
  * hash is the same md5-derived hash32 the engine applies). Final
  * weights are rounded to integer MICROS so the serving-side dot
  * product is exact integer arithmetic (the doc_logprob convention)
  * with ONE trailing IEEE division — bit-reproducible across Spark
  * and DuckDB without transcendentals at query time (the sigmoid is
  * monotone, so keep = logit >= 0 needs no exp()).
  *
  * Prints the Scala literal to paste into Corpus, plus held-out-free
  * train accuracy vs the teacher gate (a distillation fidelity
  * check, not a benchmark).
  *
  * Usage: runMain graft.tools.TrainQualityModel [sfDir]
  */
object TrainQualityModel {
  private val B = 64

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** JVM mirror of TextOps.hash32: first 8 md5 hex chars as a long. */
  private def hash32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.sources.Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id"), col("text"),
        (graft.pipeline.Corpus.gopherKeep() &&
          graft.pipeline.TextOps.qualityScore(col("text")) >= 0.5).as("y"))
      .orderBy("doc_id")
      .collect()
    // feature vector = 64 hashed-token-bucket frequencies + 5 dense
    // text-shape features (length, mean word len, alpha frac,
    // distinct stops, dup-trigram frac — the gate's own signals,
    // scaled to ~[0,1]), exactly as the serving expression computes
    // them.
    val feats = rows.map { r =>
      val text = r.getString(1)
      val toks = text.split(" ", -1)
      val cnt = new Array[Double](B + 5)
      toks.foreach(t => cnt((hash32("qm_" + t) % B).toInt) += 1.0)
      val n = math.max(toks.length, 1).toDouble
      var j = 0
      while (j < B) { cnt(j) /= n; j += 1 }
      cnt(B) = math.min(toks.length, 1000).toDouble / 1000.0
      cnt(B + 1) = ((text.length - (toks.length - 1)).toDouble / toks.length) / 10.0
      cnt(B + 2) = toks.count(_.exists(c => c >= 'a' && c <= 'z')).toDouble / toks.length
      cnt(B + 3) = toks.filter(Set("the", "a", "of", "to", "and")).distinct.length.toDouble / 5.0
      cnt(B + 4) = {
        val sh = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toArray
        if (sh.isEmpty) 0.0 else 1.0 - sh.distinct.length.toDouble / sh.length
      }
      (cnt, if (r.getBoolean(2)) 1.0 else 0.0)
    }
    println(s"// base rate y=1: ${feats.count(_._2 > 0.5)} / ${feats.length}")
    val D = B + 5
    val w = new Array[Double](D)
    var b = 0.0
    val lr = args.lift(1).map(_.toDouble).getOrElse(50.0)
    val epochs = args.lift(2).map(_.toInt).getOrElse(20000)
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
    println(s"// trained on $sfDir, ${feats.length} docs, " +
      f"micro-rounded train accuracy vs teacher gate: $acc%.4f")
    println(s"  val QualityModelWMicro: Array[Long] = Array(")
    println(wMicro.take(B).grouped(8).map(g => "    " + g.mkString(", ")).mkString(",\n"))
    println("  )")
    println(s"  val QualityModelDenseWMicro: Array[Long] = Array(${wMicro.drop(B).mkString(", ")})")
    println(s"  val QualityModelBiasMicro: Long = ${bMicro}L")
    spark.stop()
  }
}
