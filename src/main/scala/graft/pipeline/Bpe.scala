package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic BYTE-level byte-pair encoding over a COMMITTED
  * fixture merge table -- the tokenizer-faithful token accounting the
  * packing/budget tier runs on (`pack_sequences_bpe`,
  * `corpus_budget_sample_bpe`), replacing the whitespace proxy with
  * merge-based subword counts (Sennrich et al. 2016's procedure at
  * byte granularity, the GPT-2-class denomination).
  *
  * Design for cross-engine bit-equality: every symbol is ONE char --
  * initial symbols are the text's UTF-8 bytes (the corpus contract
  * below makes byte == char), each merge output is a fresh Unicode
  * private-use char (U+E000+rank) -- so applying merge rules in rank
  * order is a chain of plain left-to-right non-overlapping string
  * replaces, a spelling Spark (StringReplace, whole-stage codegen),
  * DuckDB (`replace`) and the JVM (`String.replace`) implement
  * identically (pinned in PipelineSpec). Token count = character
  * length of the fully-merged string. The merge table was trained by
  * [[graft.tools.BpeTrain]] -- the committed in-repo procedure
  * (most-frequent adjacent pair per round, ties lexicographic,
  * left-to-right non-overlapping counting and replace) -- on the
  * sf0.001 documents corpus: 256 merges, compressing the corpus to
  * ~49 mean symbols/doc (chars 306, whitespace words 56, round-10's
  * 47-merge table 160).
  *
  * Contract: input text must be ASCII -- no U+E000..U+F8FF
  * private-use chars (reserved for merge outputs) and no multi-byte
  * chars (a non-ASCII char is several bytes but ONE char, so the
  * replace-chain spelling would no longer implement the byte-level
  * merge). PipelineSpec pins both properties over the committed
  * testdata corpora so a contract violation fails loudly, and
  * [[graft.tools.BpeTrain]] refuses to train on a non-ASCII corpus.
  * Scale shape: encode is a map-only projection (256 chained codegen
  * replaces), no shuffle, no state.
  */
object Bpe {

  /** (pair, replacement) in training rank order -- 256 byte-level
    * merges from [[graft.tools.BpeTrain]] on sf0.001.
    */
  val Merges: Seq[(String, String)] = Seq(
    (" s", "\uE000"),  // freq 5505
    ("er", "\uE001"),  // freq 4650
    ("e ", "\uE002"),  // freq 3690
    ("or", "\uE003"),  // freq 2880
    ("in", "\uE004"),  // freq 2858
    ("ow", "\uE005"),  // freq 2763
    ("t ", "\uE006"),  // freq 2223
    ("\uE001 ", "\uE007"),  // freq 2163
    ("\uE005 ", "\uE008"),  // freq 2143
    ("lu", "\uE009"),  // freq 1928
    ("ar", "\uE00A"),  // freq 1873
    ("p\uE00A", "\uE00B"),  // freq 1873
    ("as", "\uE00C"),  // freq 1836
    ("at", "\uE00D"),  // freq 1806
    ("n ", "\uE00E"),  // freq 1563
    ("y ", "\uE00F"),  // freq 1476
    ("g ", "\uE010"),  // freq 1461
    ("h ", "\uE011"),  // freq 1427
    ("a ", "\uE012"),  // freq 1405
    ("m\uE001", "\uE013"),  // freq 1137
    ("ca", "\uE014"),  // freq 984
    ("co", "\uE015"),  // freq 978
    ("\uE009m", "\uE016"),  // freq 978
    ("\uE015\uE016", "\uE017"),  // freq 978
    ("w\uE004", "\uE018"),  // freq 976
    ("\uE018d", "\uE019"),  // freq 976
    ("\uE003d", "\uE01A"),  // freq 975
    ("up", "\uE01B"),  // freq 963
    ("\uE000\uE003", "\uE01C"),  // freq 961
    ("\uE000\uE014", "\uE01D"),  // freq 954
    ("ag", "\uE01E"),  // freq 953
    ("a\uE009", "\uE01F"),  // freq 950
    ("v\uE01F", "\uE020"),  // freq 950
    ("l\uE004", "\uE021"),  // freq 946
    ("ke", "\uE022"),  // freq 945
    ("jo", "\uE023"),  // freq 936
    ("\uE023\uE004", "\uE024"),  // freq 936
    ("\uE013g", "\uE025"),  // freq 935
    ("gr", "\uE026"),  // freq 934
    ("o\uE01B", "\uE027"),  // freq 934
    ("qu", "\uE028"),  // freq 934
    ("\uE026\uE027", "\uE029"),  // freq 934
    ("\uE028\uE001", "\uE02A"),  // freq 934
    ("ct", "\uE02B"),  // freq 931
    ("e\uE02B", "\uE02C"),  // freq 931
    ("v\uE02C", "\uE02D"),  // freq 931
    ("\uE02D\uE003", "\uE02E"),  // freq 931
    ("h\uE00C", "\uE02F"),  // freq 923
    ("am", "\uE030"),  // freq 919
    ("e\uE030", "\uE031"),  // freq 919
    ("r\uE031", "\uE032"),  // freq 919
    ("t\uE032", "\uE033"),  // freq 919
    ("fi", "\uE034"),  // freq 917
    ("lt", "\uE035"),  // freq 917
    ("\uE034\uE035", "\uE036"),  // freq 917
    ("f\uE00C", "\uE037"),  // freq 913
    ("b\uE00D", "\uE038"),  // freq 910
    ("th", "\uE039"),  // freq 910
    ("\uE000l", "\uE03A"),  // freq 910
    ("\uE00Bk", "\uE03B"),  // freq 910
    ("\uE038c", "\uE03C"),  // freq 910
    ("\uE000\uE033", "\uE03D"),  // freq 907
    ("ab", "\uE03E"),  // freq 903
    ("t\uE03E", "\uE03F"),  // freq 903
    ("\uE03Fl", "\uE040"),  // freq 903
    ("al", "\uE041"),  // freq 898
    ("m\uE041", "\uE042"),  // freq 898
    ("\uE042l", "\uE043"),  // freq 898
    ("d\uE00D", "\uE044"),  // freq 896
    ("\uE000\uE03B", "\uE045"),  // freq 891
    ("bi", "\uE046"),  // freq 890
    ("cu", "\uE047"),  // freq 889
    ("st", "\uE048"),  // freq 889
    ("\uE047\uE048", "\uE049"),  // freq 889
    ("\uE049o", "\uE04A"),  // freq 889
    ("\uE000\uE043", "\uE04B"),  // freq 882
    ("\uE017\uE00E", "\uE04C"),  // freq 786
    ("\uE01A\uE007", "\uE04D"),  // freq 766
    ("\uE020\uE002", "\uE04E"),  // freq 758
    ("\uE021\uE002", "\uE04F"),  // freq 757
    ("\uE01E\uE010", "\uE050"),  // freq 756
    ("\uE01C\uE006", "\uE051"),  // freq 755
    ("\uE01D\uE00E", "\uE052"),  // freq 750
    ("\uE025\uE002", "\uE053"),  // freq 749
    ("\uE02E ", "\uE054"),  // freq 747
    ("\uE019\uE008", "\uE055"),  // freq 745
    ("\uE022\uE00F", "\uE056"),  // freq 743
    ("\uE029 ", "\uE057"),  // freq 742
    ("\uE00B\uE006", "\uE058"),  // freq 738
    ("\uE02A\uE00F", "\uE059"),  // freq 733
    ("\uE024 ", "\uE05A"),  // freq 726
    ("\uE037\uE006", "\uE05B"),  // freq 720
    ("\uE02F\uE011", "\uE05C"),  // freq 719
    ("\uE039\uE002", "\uE05D"),  // freq 717
    ("\uE045 ", "\uE05E"),  // freq 715
    ("\uE036\uE007", "\uE05F"),  // freq 710
    ("\uE040\uE002", "\uE060"),  // freq 709
    ("\uE03C\uE011", "\uE061"),  // freq 708
    ("\uE03D ", "\uE062"),  // freq 708
    ("\uE046\uE010", "\uE063"),  // freq 705
    ("\uE04B ", "\uE064"),  // freq 704
    ("\uE03A\uE008", "\uE065"),  // freq 699
    ("r\uE008", "\uE066"),  // freq 690
    ("m\uE007", "\uE067"),  // freq 687
    ("\uE04A\uE067", "\uE068"),  // freq 687
    ("\uE044\uE012", "\uE069"),  // freq 675
    ("\uE019\uE005", "\uE06A"),  // freq 231
    ("\uE00Bt", "\uE06B"),  // freq 225
    ("\uE044a", "\uE06C"),  // freq 221
    ("\uE03A\uE005", "\uE06D"),  // freq 211
    ("\uE01A\uE001", "\uE06E"),  // freq 209
    ("\uE036\uE001", "\uE06F"),  // freq 207
    ("\uE01Ct", "\uE070"),  // freq 206
    ("\uE01Dn", "\uE071"),  // freq 204
    ("\uE02Fh", "\uE072"),  // freq 204
    ("\uE022y", "\uE073"),  // freq 202
    ("\uE03Ch", "\uE074"),  // freq 202
    ("\uE04A\uE013", "\uE075"),  // freq 202
    ("\uE02Ay", "\uE076"),  // freq 201
    ("\uE01Eg", "\uE077"),  // freq 197
    ("\uE040e", "\uE078"),  // freq 194
    ("\uE037t", "\uE079"),  // freq 193
    ("\uE039e", "\uE07A"),  // freq 193
    ("\uE017n", "\uE07B"),  // freq 192
    ("\uE020e", "\uE07C"),  // freq 192
    ("\uE021e", "\uE07D"),  // freq 189
    ("\uE025e", "\uE07E"),  // freq 186
    ("\uE046g", "\uE07F"),  // freq 185
    ("r\uE005", "\uE080"),  // freq 176
    ("\uE068\uE04E", "\uE081"),  // freq 40
    ("\uE04D\uE05B", "\uE082"),  // freq 38
    ("\uE05A\uE04C", "\uE083"),  // freq 38
    ("\uE06E\uE051", "\uE084"),  // freq 38
    ("\uE050\uE060", "\uE085"),  // freq 37
    ("\uE062\uE04C", "\uE086"),  // freq 37
    ("\uE06C\uE065", "\uE087"),  // freq 37
    ("\uE04F\uE050", "\uE088"),  // freq 36
    ("\uE058\uE05F", "\uE089"),  // freq 36
    ("\uE069\uE059", "\uE08A"),  // freq 36
    ("\uE07A\uE05E", "\uE08B"),  // freq 36
    ("\uE04F\uE057", "\uE08C"),  // freq 35
    ("\uE052\uE012", "\uE08D"),  // freq 35
    ("\uE053\uE05A", "\uE08E"),  // freq 35
    ("\uE054\uE05A", "\uE08F"),  // freq 35
    ("\uE05D\uE04E", "\uE090"),  // freq 35
    ("\uE060\uE056", "\uE091"),  // freq 35
    ("\uE061\uE012", "\uE092"),  // freq 35
    ("\uE04D\uE056", "\uE093"),  // freq 34
    ("\uE052\uE059", "\uE094"),  // freq 34
    ("\uE055\uE05A", "\uE095"),  // freq 34
    ("\uE05C\uE04C", "\uE096"),  // freq 34
    ("\uE062\uE058", "\uE097"),  // freq 34
    ("\uE052\uE053", "\uE098"),  // freq 33
    ("\uE059\uE05F", "\uE099"),  // freq 33
    ("\uE05C\uE050", "\uE09A"),  // freq 33
    ("a\uE065", "\uE09B"),  // freq 32
    ("\uE04D\uE05D", "\uE09C"),  // freq 32
    ("\uE04F\uE04C", "\uE09D"),  // freq 32
    ("\uE051\uE053", "\uE09E"),  // freq 32
    ("\uE051\uE066", "\uE09F"),  // freq 32
    ("\uE055\uE058", "\uE0A0"),  // freq 32
    ("\uE05C\uE054", "\uE0A1"),  // freq 32
    ("\uE064\uE066", "\uE0A2"),  // freq 32
    ("\uE069\uE061", "\uE0A3"),  // freq 32
    ("\uE06A\uE065", "\uE0A4"),  // freq 32
    ("\uE06C\uE05E", "\uE0A5"),  // freq 32
    ("\uE06E\uE052", "\uE0A6"),  // freq 32
    ("\uE075\uE062", "\uE0A7"),  // freq 32
    ("\uE04E\uE056", "\uE0A8"),  // freq 31
    ("\uE052\uE068", "\uE0A9"),  // freq 31
    ("\uE057\uE012", "\uE0AA"),  // freq 31
    ("\uE05C\uE068", "\uE0AB"),  // freq 31
    ("\uE05D\uE05F", "\uE0AC"),  // freq 31
    ("\uE066\uE04C", "\uE0AD"),  // freq 31
    ("\uE071\uE065", "\uE0AE"),  // freq 31
    ("s\uE014", "\uE0AF"),  // freq 30
    ("\uE04B\uE051", "\uE0B0"),  // freq 30
    ("\uE04D\uE04D", "\uE0B1"),  // freq 30
    ("\uE04E\uE054", "\uE0B2"),  // freq 30
    ("\uE053\uE05B", "\uE0B3"),  // freq 30
    ("\uE05C\uE063", "\uE0B4"),  // freq 30
    ("\uE05D\uE050", "\uE0B5"),  // freq 30
    ("\uE05F\uE053", "\uE0B6"),  // freq 30
    ("\uE062\uE059", "\uE0B7"),  // freq 30
    ("\uE064\uE012", "\uE0B8"),  // freq 30
    ("\uE06B\uE05E", "\uE0B9"),  // freq 30
    ("\uE06D\uE05E", "\uE0BA"),  // freq 30
    ("\uE070\uE065", "\uE0BB"),  // freq 30
    ("\uE07B\uE064", "\uE0BC"),  // freq 30
    ("d\uE01B", "\uE0BD"),  // freq 29
    ("\uE04F\uE054", "\uE0BE"),  // freq 29
    ("\uE052\uE055", "\uE0BF"),  // freq 29
    ("\uE053\uE056", "\uE0C0"),  // freq 29
    ("\uE05D\uE057", "\uE0C1"),  // freq 29
    ("\uE02E\uE05E", "\uE0C2"),  // freq 28
    ("\uE04F\uE05A", "\uE0C3"),  // freq 28
    ("\uE053\uE058", "\uE0C4"),  // freq 28
    ("\uE05D\uE056", "\uE0C5"),  // freq 28
    ("\uE060\uE059", "\uE0C6"),  // freq 28
    ("\uE066\uE066", "\uE0C7"),  // freq 28
    ("\uE072\uE064", "\uE0C8"),  // freq 28
    ("\uE072\uE065", "\uE0C9"),  // freq 28
    ("\uE076\uE065", "\uE0CA"),  // freq 28
    ("\uE07A\uE051", "\uE0CB"),  // freq 28
    ("\uE07B\uE05E", "\uE0CC"),  // freq 28
    ("\uE07D\uE051", "\uE0CD"),  // freq 28
    ("\uE07E\uE065", "\uE0CE"),  // freq 28
    ("\uE012\uE063", "\uE0CF"),  // freq 27
    ("\uE024\uE051", "\uE0D0"),  // freq 27
    ("\uE03D\uE05E", "\uE0D1"),  // freq 27
    ("\uE03D\uE064", "\uE0D2"),  // freq 27
    ("\uE04C\uE063", "\uE0D3"),  // freq 27
    ("\uE04D\uE059", "\uE0D4"),  // freq 27
    ("\uE04E\uE04E", "\uE0D5"),  // freq 27
    ("\uE04F\uE055", "\uE0D6"),  // freq 27
    ("\uE055\uE050", "\uE0D7"),  // freq 27
    ("\uE055\uE059", "\uE0D8"),  // freq 27
    ("\uE056\uE069", "\uE0D9"),  // freq 27
    ("\uE057\uE05B", "\uE0DA"),  // freq 27
    ("\uE05F\uE050", "\uE0DB"),  // freq 27
    ("\uE060\uE05A", "\uE0DC"),  // freq 27
    ("\uE060\uE061", "\uE0DD"),  // freq 27
    ("\uE06A\uE051", "\uE0DE"),  // freq 27
    ("\uE06B\uE065", "\uE0DF"),  // freq 27
    ("\uE06D\uE051", "\uE0E0"),  // freq 27
    ("\uE06D\uE064", "\uE0E1"),  // freq 27
    ("\uE074\uE052", "\uE0E2"),  // freq 27
    ("\uE077\uE051", "\uE0E3"),  // freq 27
    ("\uE079\uE051", "\uE0E4"),  // freq 27
    ("\uE07C\uE062", "\uE0E5"),  // freq 27
    ("\uE080\uE052", "\uE0E6"),  // freq 27
    ("\uE0AF\uE00E", "\uE0E7"),  // freq 27
    ("\uE012\uE056", "\uE0E8"),  // freq 26
    ("\uE024\uE062", "\uE0E9"),  // freq 26
    ("\uE055\uE054", "\uE0EA"),  // freq 26
    ("\uE058\uE05B", "\uE0EB"),  // freq 26
    ("\uE060\uE04C", "\uE0EC"),  // freq 26
    ("\uE060\uE054", "\uE0ED"),  // freq 26
    ("\uE061\uE061", "\uE0EE"),  // freq 26
    ("\uE06F\uE064", "\uE0EF"),  // freq 26
    ("\uE070\uE051", "\uE0F0"),  // freq 26
    ("\uE071\uE05E", "\uE0F1"),  // freq 26
    ("\uE073\uE051", "\uE0F2"),  // freq 26
    ("\uE075\uE051", "\uE0F3"),  // freq 26
    ("\uE077\uE05E", "\uE0F4"),  // freq 26
    ("\uE07D\uE05E", "\uE0F5"),  // freq 26
    ("a\uE052", "\uE0F6"),  // freq 25
    ("\uE029\uE05E", "\uE0F7"),  // freq 25
    ("\uE045\uE065", "\uE0F8"),  // freq 25
    ("\uE04E\uE063", "\uE0F9"),  // freq 25
    ("\uE04F\uE063", "\uE0FA"),  // freq 25
    ("\uE053\uE012", "\uE0FB"),  // freq 25
    ("\uE057\uE050", "\uE0FC"),  // freq 25
    ("\uE058\uE05A", "\uE0FD"),  // freq 25
    ("\uE06A\uE064", "\uE0FE"),  // freq 25
    ("\uE06B\uE064", "\uE0FF"),  // freq 25
  )

  /** Round-10's 47-merge char-level fixture, kept for continuity.
    * The training procedure is deterministic and byte == char on the
    * ASCII corpus, so it is EXACTLY the first 47 rows of [[Merges]]
    * (BpeTrain reproduces the round-10 table rank-for-rank,
    * freq-for-freq; PipelineSpec pins the prefix relation).
    */
  val MergesChar: Seq[(String, String)] = Merges.take(47)

  private def encodeWith(merges: Seq[(String, String)], text: Column): Column =
    merges.foldLeft(text) { case (c, (p, r)) =>
      call_function("replace", c, lit(p), lit(r))
    }

  /** The fully-merged symbol string (each char = one BPE token).
    * Spelled as the fused one-buffer kernel
    * ([[org.apache.spark.sql.graft.expressions.BpeEncodeF]]) rather
    * than 256 chained `StringReplace`s: bit-identical by contract
    * (PipelineSpec pins kernel == fold == Spark chain), ~an order of
    * magnitude cheaper per row (no 256 intermediate UTF8Strings;
    * passes whose pair symbols are absent are skipped).
    */
  def encode(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.graft.expressions.BpeEncodeF(
        org.apache.spark.sql.graft.ColumnBridge.expression(text)))

  /** BPE token count: length of the merged symbol string. */
  def tokenCount(text: Column): Column = length(encode(text)).cast("long")

  /** Inverse of [[encode]]: expand merge symbols back to their pairs
    * in REVERSE rank order (each replace re-inflates one symbol; a
    * later-rank symbol's expansion may contain earlier-rank symbols,
    * which the remaining passes then expand). BPE merge chains are
    * lossless by construction — every symbol maps to exactly one pair
    * and output symbols never occur in input text (the U+E000
    * contract) — so `decode(encode(s)) == s`, pinned over the real
    * corpus in PipelineSpec. This is what makes the merged symbol
    * string a legitimate STORED representation: a pipeline can carry
    * the ~6x-smaller symbol column through packing/budget stages and
    * still recover byte-exact text.
    */
  def decode(sym: Column): Column =
    Merges.reverse.foldLeft(sym) { case (c, (p, r)) =>
      call_function("replace", c, lit(r), lit(p))
    }

  /** JVM mirror of [[decode]], for state-free use in kernels/tests. */
  def decodeString(s: String): String =
    Merges.reverse.foldLeft(s) { case (acc, (p, r)) => acc.replace(r, p) }

  /** Char-47 legacy encode/count (the round-10 denomination). */
  def encodeChar(text: Column): Column = encodeWith(MergesChar, text)
  def tokenCountChar(text: Column): Column =
    length(encodeChar(text)).cast("long")

  private def sqlLit(s: String) = "'" + s.replace("'", "''") + "'"

  private def sqlEncodeWith(merges: Seq[(String, String)], expr: String): String =
    merges.foldLeft(expr) { case (e, (p, r)) =>
      s"replace($e, ${sqlLit(p)}, ${sqlLit(r)})"
    }

  /** DuckDB mirror of [[encode]] as a staged CTE block: DuckDB's
    * binder caps expression recursion at 128, so the 256-deep replace
    * nesting cannot bind as ONE scalar expression -- the identical
    * chain is applied in 64-merge layers through stacked CTEs instead
    * (each layer's expression is 64 deep; rank order is preserved
    * across layers, so the result is bit-identical to the Spark
    * fold). Emits `name_0 .. name_k, name` CTE definitions; the final
    * CTE `name` carries (doc_id, source, bpe) with `bpe` the
    * fully-merged symbol string -- token count = length(bpe).
    */
  def sqlEncodeCtes(name: String, from: String): String = {
    val layers = Merges.grouped(64).toSeq
    val defs = layers.zipWithIndex.map { case (g, i) =>
      val src = if (i == 0) from else s"${name}_${i - 1}"
      val inner = if (i == 0) "text" else "bpe"
      s"${name}_$i AS (SELECT doc_id, source, ${sqlEncodeWith(g, inner)} AS bpe FROM $src)"
    }
    (defs :+ s"$name AS (SELECT * FROM ${name}_${layers.size - 1})")
      .mkString(",\n")
  }
}
