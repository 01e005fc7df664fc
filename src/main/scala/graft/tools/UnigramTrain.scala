package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DISTRIBUTED trainer for the committed Unigram-LM vocabulary
  * ([[graft.pipeline.Unigram]], table in
  * [[graft.pipeline.UnigramVocabTable]]) — the SentencePiece recipe
  * (Kudo 2018) as hard-EM (Viterbi-EM) with budget pruning:
  *
  *  1. SEED: every character plus every word substring, scored by
  *     frequency-weighted corpus occurrence. (SentencePiece seeds from
  *     the top suffix-array substrings; this corpus's word inventory
  *     is small enough to seed exhaustively — at 100 TB the seed step
  *     is the same substring explode df-capped to a top-K.)
  *  2. E-STEP: Viterbi-segment the WORD-FREQUENCY table under current
  *     scores and count piece usage weighted by word frequency — the
  *     corpus is scanned once (word table); every round after that
  *     touches only the word table (the [[WordpieceTrain]] scale
  *     layout). Segmentation runs distributed over word-table
  *     partitions with the scores map broadcast, reusing the SERVING
  *     kernel's DP ([[org.apache.spark.sql.graft.expressions
  *     .UnigramEncodeF.segmentWord]]) so training and inference can
  *     never disagree about a segmentation.
  *  3. M-STEP: re-score pieces `round(ln(count/total)·1e6)` (exact
  *     integer micro-log-probs — StrictMath.log so the committed
  *     artifact is platform-deterministic), PRUNE to the top-`budget`
  *     multi-char pieces by (usage desc, piece asc); characters always
  *     survive (the lossless coverage floor).
  *  4. Iterate to fixed point (score map unchanged) or maxRounds.
  *
  * Unlike the BPE/WordPiece tables (trained to saturation), the
  * unigram artifact is BUDGETED — pruning to a vocabulary size is the
  * algorithm's defining step, and a budget below full word coverage
  * keeps corpus words segmenting into multiple pieces, which is what
  * exercises Viterbi (and what the fertility comparison against greedy
  * WordPiece measures).
  *
  * Usage: runMain graft.tools.UnigramTrain [sfDir] [budget] [outFile]
  */
object UnigramTrain {

  import org.apache.spark.sql.graft.expressions.UnigramEncodeF.segmentWord
  import graft.pipeline.Unigram.FallbackMicro

  /** Frequency-weighted counts of every substring (len 1..word len) of
    * the word table — the exhaustive seed inventory. Nested position ×
    * length explode, one shuffle on the piece.
    */
  def seedCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"), col("w"),
        explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(col("freq"), col("w"), col("i"),
        explode(sequence(lit(1), length(col("w")) - col("i") + 1)).as("l"))
      .select(expr("substring(w, i, l)").as("piece"), col("freq"))
      .groupBy("piece").agg(sum("freq").as("cnt"))

  private def rescore(counts: Map[String, Long]): Map[String, Long] = {
    val total = math.max(1L, counts.values.sum)
    counts.map { case (p, c) =>
      p -> (if (c <= 0) FallbackMicro
            else math.round(StrictMath.log(c.toDouble / total) * 1e6))
    }
  }

  /** Hard-EM over the `(w, freq)` word table; returns the final
    * (piece, score_micro) rows — characters first, then the surviving
    * budgeted pieces, each tier piece-ordered for file stability.
    */
  def train(words: DataFrame, budget: Int, maxRounds: Int = 10): Seq[(String, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    val wordDs = words.select(col("w"), col("freq").cast("long")).as[(String, Long)]
      .localCheckpoint()

    val seed = seedCounts(words).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val chars = seed.keySet.filter(_.length == 1)

    // E-step: distributed Viterbi over word-table partitions, scores
    // broadcast; output is vocab-bounded piece counts.
    def usage(scores: Map[String, Long]): Map[String, Long] = {
      val b = spark.sparkContext.broadcast(scores)
      try {
        val maxLen = math.max(1, scores.keys.map(_.length).max)
        wordDs.flatMap { case (w, f) =>
            segmentWord(w, b.value, maxLen, FallbackMicro).map(p => (p, f))
          }
          .groupBy(col("_1").as("piece"))
          .agg(sum(col("_2")).as("cnt"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      } finally {
        // one score map is broadcast per EM round; without an explicit
        // destroy each round's copy lingers on driver and executors
        // for the session's lifetime (harmless at budget 16, a leak at
        // a 100 TB seed vocabulary)
        b.destroy()
      }
    }

    var scores = rescore(seed)
    var round = 0
    var fixed = false
    while (round < maxRounds && !fixed) {
      val used = usage(scores)
      val kept = used.toSeq.filter { case (p, _) => p.length > 1 }
        .sortBy { case (p, c) => (-c, p) }
        .take(budget).map(_._1).toSet
      val counts =
        chars.map(c => c -> used.getOrElse(c, 0L)).toMap ++
          used.filter { case (p, _) => kept(p) }
      val next = rescore(counts)
      fixed = next == scores
      scores = next
      round += 1
    }
    val (cs, ps) = scores.toSeq.partition(_._1.length == 1)
    cs.sortBy(_._1) ++ ps.sortBy(_._1)
  }

  private def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"' => "\\\""
    case c => c.toString
  }

  def renderTable(rows: Seq[(String, Long)], sfDir: String, budget: Int): String = {
    val body = rows.map { case (p, sc) =>
      s"""    ("${esc(p)}", ${sc}L),"""
    }.mkString("\n")
    s"""package graft.pipeline
       |
       |/** AUTO-GENERATED by `graft.tools.UnigramTrain` (distributed
       |  * word-table hard-EM with budget pruning) on $sfDir
       |  * documents — ${rows.count(_._1.length == 1)} single-char pieces +
       |  * ${rows.count(_._1.length > 1)} budgeted pieces (budget $budget),
       |  * each with its exact integer micro-log-prob score. The
       |  * committed artifact-not-code fixture behind [[Unigram.Vocab]];
       |  * regenerate with
       |  * `runMain graft.tools.UnigramTrain $sfDir $budget <thisFile>`.
       |  */
       |private[pipeline] object UnigramVocabTable {
       |  val rows: Seq[(String, Long)] = Seq(
       |$body
       |  )
       |}
       |""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val budget = args.lift(1).map(_.toInt).getOrElse(16)
    val outFile = args.lift(2)
    val spark = graft.sources.Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val words = WordpieceTrain.wordFreq(
      spark.read.parquet(s"$sfDir/documents.parquet").select(col("text")))
    val t0 = System.nanoTime()
    val rows = train(words, budget)
    val sec = (System.nanoTime() - t0) / 1e9
    val src = renderTable(rows, sfDir, budget)
    outFile match {
      case Some(f) =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(f), src)
        println(s"// wrote ${rows.size} pieces to $f")
      case None => println(src)
    }
    println(f"// trained on $sfDir in $sec%.1f s")
    spark.stop()
  }
}
