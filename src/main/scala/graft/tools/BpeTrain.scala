package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DISTRIBUTED trainer for the committed BPE merge table
  * ([[graft.pipeline.Bpe]], table in [[graft.pipeline.BpeMergesTable]])
  * — per merge round, pair frequencies are counted by ONE
  * vocabulary-sized aggregate (`explode(bpe_pairs(s))` →
  * `groupBy(pair).count`, partial aggregation map-side) and only the
  * single argmax row is collected; the most frequent pair (ties:
  * lexicographically smallest — UTF8String binary order equals Java
  * char order over the ASCII + private-use symbol space) is merged by
  * substituting a fresh private-use symbol U+E000+rank via a map-only
  * `replace`, and the loop repeats. The corpus NEVER moves: the only
  * shuffle per round is the pair-count exchange, bounded by the
  * distinct-pair vocabulary (≤ |alphabet|²), independent of corpus
  * size — the shape that runs at 100 TB, replacing the round-11
  * driver-side corpus collect. Lineage is cut every
  * `checkpointEvery` rounds (localCheckpoint), so the plan never
  * compounds past a bounded replace-chain depth.
  *
  * Pair counting semantics match the encoder's replace chain exactly:
  * left-to-right non-overlapping ("aaa" counts "aa" once), the
  * skip-ahead spelled in [[org.apache.spark.sql.graft.expressions.BpePairsF]].
  * The procedure is deterministic, so the table it trains at any
  * nMerges is a rank-for-rank prefix of the table at a larger
  * nMerges; PipelineSpec pins that the distributed trainer reproduces
  * the committed table's prefix (rank, pair, symbol AND frequency) on
  * the real corpus.
  *
  * Byte-level contract: initial symbols are the text's UTF-8 BYTES.
  * The synthetic corpus is pure ASCII, so each byte IS one char and
  * the char-replace chain implements the byte-level merge exactly;
  * the trainer fails loudly on any non-ASCII or private-use input
  * (the precondition PipelineSpec also pins for the testdata).
  *
  * Usage: runMain graft.tools.BpeTrain [sfDir] [nMerges] [outFile]
  * With outFile, writes the complete generated
  * `BpeMergesTable.scala` source; otherwise prints the rows.
  */
object BpeTrain {

  private def pairsCol(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.expressions.BpePairsF(
        org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** One distributed merge-selection round: the (pair, freq) argmax
    * among pairs occurring ≥2 times, ties to the lexicographically
    * smallest pair; None when no pair repeats (training exhausted).
    */
  def bestPair(df: DataFrame): Option[(String, Long)] =
    df.select(explode(pairsCol(col("s"))).as("p"))
      .groupBy("p").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .orderBy(col("c").desc, col("p").asc)
      .limit(1).collect()
      .headOption.map(r => (r.getString(0), r.getLong(1)))

  /** Train `nMerges` byte-level merges over `corpus` (one string
    * column named `s`); returns (pair, symbol, freq) in rank order.
    * Stops early when no pair repeats.
    *
    * `startRank` RESUMES training past an existing table: pass the
    * corpus already encoded with the first `startRank` merges and the
    * new merges continue the symbol space at U+E000+startRank — the
    * procedure composes (train(raw, a+b) == train(raw, a) followed by
    * train(encodeWithFirst_a, b, startRank = a), spec-pinned), so a
    * deployment can EXTEND its committed vocabulary from the stored
    * encoded corpus without re-running the first thousand merges over
    * raw text. With startRank > 0 the input legitimately contains the
    * earlier merge symbols, so the ASCII guard admits exactly the
    * private-use prefix below startRank and still rejects everything
    * else.
    */
  def train(corpus: DataFrame, nMerges: Int,
      checkpointEvery: Int = 16, startRank: Int = 0): Seq[(String, String, Long)] = {
    require(startRank >= 0 && startRank <= 0x1000, s"bad startRank $startRank")
    val okChars =
      if (startRank == 0) "[^\\x00-\\x7F]"
      else f"[^\\x00-\\x7F\\uE000-\\u${0xE000 + startRank - 1}%04X]"
    require(corpus.filter(col("s").rlike(okChars)).isEmpty,
      "byte-level training requires a pure-ASCII corpus (plus, when " +
        "resuming, the merge symbols below startRank): non-ASCII " +
        "chars are multi-byte and would break the " +
        "one-char-per-symbol replace-chain spelling")
    var df = corpus.localCheckpoint()
    val rows = Seq.newBuilder[(String, String, Long)]
    var rank = startRank
    var done = false
    while (rank < startRank + nMerges && !done) {
      bestPair(df) match {
        case None => done = true
        case Some((pair, freq)) =>
          val sym = (0xE000 + rank).toChar.toString
          df = df.withColumn("s",
            call_function("replace", col("s"), lit(pair), lit(sym)))
          rows += ((pair, sym, freq))
          rank += 1
          if ((rank - startRank) % checkpointEvery == 0) df = df.localCheckpoint()
      }
    }
    rows.result()
  }

  private def esc(s: String): String = s.flatMap {
    case c if c >= 0xE000 => f"\\u${c.toInt}%04X"
    case '\\' => "\\\\"
    case '"' => "\\\""
    case c => c.toString
  }

  /** The generated BpeMergesTable.scala source: rows chunked into
    * 256-entry defs so no single method body nears the JVM's 64 KB
    * bytecode limit.
    */
  def renderTable(rows: Seq[(String, String, Long)], sfDir: String): String = {
    val groups = rows.grouped(256).toSeq.zipWithIndex.map { case (g, i) =>
      val body = g.map { case (p, r, f) =>
        s"""    ("${esc(p)}", "${esc(r)}"),  // freq $f"""
      }.mkString("\n")
      s"  private def g$i: Seq[(String, String)] = Seq(\n$body\n  )"
    }
    val concat = groups.indices.map(i => s"g$i").mkString(" ++ ")
    s"""package graft.pipeline
       |
       |/** AUTO-GENERATED by `graft.tools.BpeTrain` (distributed
       |  * per-round pair-count aggregation) on $sfDir documents —
       |  * ${rows.size} byte-level merges in training rank order. The
       |  * committed artifact-not-code fixture behind [[Bpe.Merges]];
       |  * regenerate with
       |  * `runMain graft.tools.BpeTrain $sfDir ${rows.size} <thisFile>`.
       |  * Rows are chunked into 256-entry defs to stay clear of the
       |  * JVM method bytecode limit.
       |  */
       |private[pipeline] object BpeMergesTable {
       |${groups.mkString("\n")}
       |  val rows: Seq[(String, String)] = ${concat}
       |}
       |""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(1024)
    val outFile = args.lift(2)
    val spark = graft.sources.Sessions.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text").as("s"))
    val t0 = System.nanoTime()
    val rows = train(corpus, nMerges)
    val sec = (System.nanoTime() - t0) / 1e9
    outFile match {
      case Some(f) =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(f), renderTable(rows, sfDir))
        println(s"// wrote ${rows.size} merges to $f")
      case None =>
        rows.foreach { case (p, r, f) =>
          println(s"""    ("${esc(p)}", "${esc(r)}"),  // freq $f""")
        }
    }
    println(f"// trained on $sfDir: ${rows.size} merges in $sec%.1f s")
    spark.stop()
  }
}
