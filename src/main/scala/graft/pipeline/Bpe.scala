package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic char-level byte-pair encoding over a COMMITTED
  * fixture merge table — the tokenizer-faithful token accounting the
  * packing/budget tier runs on (`pack_sequences_bpe`,
  * `corpus_budget_sample_bpe`), replacing the whitespace proxy with
  * merge-based subword counts (Sennrich et al. 2016's procedure, at
  * char rather than byte granularity).
  *
  * Design for cross-engine bit-equality: every symbol is ONE char —
  * initial symbols are the text's characters, each merge output is a
  * fresh Unicode private-use char (U+E000+rank) — so applying merge
  * rules in rank order is a chain of plain left-to-right
  * non-overlapping string replaces, a spelling Spark (StringReplace,
  * whole-stage codegen), DuckDB (`replace`) and the JVM
  * (`String.replace`) implement identically (pinned in PipelineSpec).
  * Token count = character length of the fully-merged string. The
  * merge table was trained by exactly this procedure (most-frequent
  * adjacent pair per round, ties lexicographic) on the sf0.001
  * documents corpus and is committed as the fixture, the same
  * fixture-artifact stance as the OPQ rotation.
  *
  * Contract: input text must not contain U+E000..U+F8FF private-use
  * chars (reserved for merge outputs); the synthetic corpus is ASCII.
  * Scale shape: encode is a map-only projection (47 chained codegen
  * replaces), no shuffle, no state.
  */
object Bpe {

  /** (pair, replacement) in training rank order. */
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
  )

  /** The fully-merged symbol string (each char = one BPE token). */
  def encode(text: Column): Column =
    Merges.foldLeft(text) { case (c, (p, r)) =>
      call_function("replace", c, lit(p), lit(r))
    }

  /** BPE token count: length of the merged symbol string. */
  def tokenCount(text: Column): Column = length(encode(text)).cast("long")

  private def sqlLit(s: String) = "'" + s.replace("'", "''") + "'"

  /** DuckDB mirror of [[encode]] — the identical replace chain. */
  def sqlEncode(expr: String): String =
    Merges.foldLeft(expr) { case (e, (p, r)) =>
      s"replace($e, ${sqlLit(p)}, ${sqlLit(r)})"
    }

  /** DuckDB mirror of [[tokenCount]]. */
  def sqlTokenCount(expr: String): String = s"length(${sqlEncode(expr)})"
}
