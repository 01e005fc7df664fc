package graft.tools

import org.apache.spark.sql.functions._

/** FIXTURE TRAINER for the committed BPE merge table
  * ([[graft.pipeline.Bpe]]) — the in-repo record of "trained by
  * exactly this procedure": per round, count adjacent symbol pairs
  * left-to-right non-overlapping (the same semantics the encoder's
  * replace chain applies), merge the most frequent pair (ties:
  * lexicographically smallest), substituting a fresh private-use
  * symbol U+E000+rank; stop at `nMerges` or when no pair repeats.
  * Prints the Scala literal rows to paste into Bpe.Merges.
  *
  * This is offline fixture tooling, not a production operator: the
  * training corpus (sf0.001 documents, ~150 KB) is collected to the
  * driver on purpose — the committed artifact is the KB-sized merge
  * table, the same artifact-not-code stance as the OPQ rotation
  * fixture. A corpus-scale BPE trainer would run the pair counts as
  * per-round distributed aggregations; the ENCODER's cost model
  * (map-only chained replaces) is what matters at 100 TB and is
  * independent of how the table was trained.
  *
  * Byte-level contract: initial symbols are the text's UTF-8 BYTES.
  * The synthetic corpus is pure ASCII, so each byte IS one char and
  * the char-replace chain implements the byte-level merge exactly;
  * the trainer fails loudly on any non-ASCII or private-use input
  * (the precondition PipelineSpec also pins for the testdata).
  *
  * Usage: runMain graft.tools.BpeTrain [sfDir] [nMerges]
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(256)
    val spark = graft.sources.Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var corpus: Array[String] = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .orderBy("doc_id").select(col("text")).collect().map(_.getString(0))
    require(corpus.forall(_.forall(c => c < 128)),
      "byte-level fixture training requires a pure-ASCII corpus " +
        "(non-ASCII chars are multi-byte and would break the " +
        "one-char-per-symbol replace-chain spelling)")
    val rows = Seq.newBuilder[String]
    var rank = 0
    var done = false
    while (rank < nMerges && !done) {
      // left-to-right non-overlapping pair counts, matching the
      // encoder's replace semantics ("aaa" counts "aa" once)
      val counts = new java.util.HashMap[String, Long]()
      corpus.foreach { s =>
        var i = 0
        while (i < s.length - 1) {
          val p = s.substring(i, i + 2)
          counts.merge(p, 1L, _ + _)
          // a self-overlapping pair (s(i)==s(i+1)==s(i+2)) would be
          // replaced only once by the left-to-right scan: skip ahead
          if (s.charAt(i) == s.charAt(i + 1) && i + 2 < s.length &&
            s.charAt(i + 2) == s.charAt(i)) i += 2
          else i += 1
        }
      }
      import scala.jdk.CollectionConverters._
      val best = counts.asScala.filter(_._2 >= 2)
      if (best.isEmpty) done = true
      else {
        val (pair, freq) = best.minBy { case (p, c) => (-c, p) }
        val sym = (0xE000 + rank).toChar.toString
        corpus = corpus.map(_.replace(pair, sym))
        def esc(s: String): String = s.flatMap {
          case c if c >= 0xE000 => f"\\u${c.toInt}%04X"
          case '\\' => "\\\\"
          case '"' => "\\\""
          case c => c.toString
        }
        rows += s"""    ("${esc(pair)}", "${esc(sym)}"),  // freq $freq"""
        rank += 1
      }
    }
    println(s"// trained on $sfDir, $rank merges")
    rows.result().foreach(println)
    val totSym = corpus.map(_.length.toLong).sum
    println(f"// mean symbols/doc after merge: ${totSym.toDouble / corpus.length}%.1f")
    spark.stop()
  }
}
