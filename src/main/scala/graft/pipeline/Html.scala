package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RAW-CRAWL FRONT DOOR — HTML→text extraction (r19 verdict ask #2).
  *
  * Every real 100 TB pretraining pipeline (C4, RefinedWeb, FineWeb)
  * starts one stage BEFORE this repo's §8 inventory: the corpus
  * arrives as crawled HTML, and the first operator strips markup,
  * drops script/style/head metadata, and removes boilerplate
  * navigation/footer blocks before `documents.text` exists at all.
  * This object adds that stage as a MAP-ONLY native-expression
  * pipeline (zero UDFs, zero shuffles — embarrassingly parallel, the
  * one shape that is trivially correct at 1000 executors).
  *
  * Fixture stance: the container has no crawl data, so the HTML is
  * SYNTHESIZED deterministically from `documents.text` with the same
  * column algebra on both engines (the [[Multimodal]] fake-codec /
  * piiDocs stance): the text is cut at the first space after its
  * midpoint into two `<p>` blocks, entity-encoded (`q` → `&#113;`,
  * `&` → `&amp;`), and wrapped in a full page — head block with
  * title/script/style, a nav bar and a footer (high link density,
  * entity separators), plus a multi-line tracking script INSIDE the
  * body. The extractor never sees the generator: it runs real
  * regex/entity/line-gate passes over an opaque html column, and the
  * DuckDB oracle rebuilds the same page and mirrors the same passes.
  *
  * Extraction passes (each expressible identically in Spark and
  * DuckDB, kept in lock-step by the shared spelling in
  * [[graft.QueriesPipeline]]):
  *   1. drop the `(?s)<head>…</head>` block (title IS metadata);
  *   2. drop `(?s)<script…>…</script>` and `(?s)<style…>…</style>`
  *      blocks anywhere in the body (dotall — they span lines);
  *   3. split on newlines; per line: strip tags to a space, decode
  *      entities (numeric `&#113;`, `&lt;/&gt;/&amp;`, and the
  *      decorative `&middot;/&mdash;/&copy;` to spaces), squeeze
  *      space runs, trim;
  *   4. LINE GATES (the C4/FineWeb heuristics, integer arithmetic so
  *      both engines agree bit-wise): keep a line iff it has a
  *      letter, its link density is low (5·links ≤ words — nav and
  *      footer fail), and ≥70% of its characters are `[a-z ]`;
  *   5. join survivors with `\n`.
  *
  * The fixture is built so extraction is EXACTLY invertible:
  * `replace(extracted, '\n', ' ') == text` (the cut consumed one
  * space; `documents.text` is single-spaced `[a-z ]` at every SF —
  * verified). `roundtrip_ok` is therefore a per-row self-proof the
  * `extract_html` query carries, ON TOP of the engine-vs-oracle hash
  * compare.
  *
  * 100 TB: stateless projection — no state, no shuffle, no skew
  * surface; scales with input bytes. The regexes are anchored,
  * non-backtracking-hostile (`[^>]*`, lazy dotall over bounded
  * blocks), and run once per row.
  */
object Html {

  /** Midpoint cut position helper: 1-based offset of the space the
    * cut consumes, 0 when the midpoint's tail has no space (then the
    * whole text is paragraph 1).
    */
  private def cutParts(text: Column): (Column, Column) = {
    val mid = floor(length(text) / lit(2)).cast("int")
    val sp = locate(" ", text.substr(mid + lit(1), length(text)))
    val p1 = when(sp > lit(0), text.substr(lit(1), mid + sp - lit(1))).otherwise(text)
    val p2 = when(sp > lit(0), text.substr(mid + sp + lit(1), length(text))).otherwise(lit(""))
    (p1, p2)
  }

  /** Entity-encode paragraph content: `&` first (total), then `q` to
    * the numeric entity so the decoder's numeric path is exercised on
    * real content (`query` appears throughout the corpus).
    */
  private def enc(x: Column): Column =
    replace(replace(x, lit("&"), lit("&amp;")), lit("q"), lit("&#113;"))

  /** The deterministic synthetic page (one string column). */
  def synthHtml(docId: Column, text: Column): Column = {
    val (p1, p2) = cutParts(text)
    val id = docId.cast("string")
    concat_ws("\n",
      lit("<html>"),
      concat(lit("<head><title>doc "), id, lit("</title>")),
      concat(lit("<script type=\"text/javascript\">var id = "), id,
        lit(" &amp;&amp; 1;</script>")),
      lit("<style>"),
      lit(".nav a { color: #00f; }"),
      lit("</style>"),
      lit("</head>"),
      lit("<body>"),
      lit("<div class=\"nav\"><a href=\"/\">home</a> &middot; " +
        "<a href=\"/about\">about</a> &middot; <a href=\"/contact\">contact</a></div>"),
      concat(lit("<p>"), enc(p1), lit("</p>")),
      lit("<script>"),
      concat(lit("track("), id, lit(");")),
      lit("</script>"),
      concat(lit("<p>"), enc(p2), lit("</p>")),
      lit("<div class=\"footer\">&copy; 2026 corpus &mdash; " +
        "<a href=\"/tos\">terms</a> <a href=\"/privacy\">privacy</a></div>"),
      lit("</body>"),
      lit("</html>"))
  }

  /** Pass 1+2: head/script/style block removal (dotall — blocks span
    * lines; each block collapses to one space so the line structure
    * around it survives).
    */
  def bodyOf(html: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(html, "(?s)<head>.*?</head>", " "),
        "(?s)<script[^>]*>.*?</script>", " "),
      "(?s)<style[^>]*>.*?</style>", " ")

  /** Pass 3 per line: tags → space, entity decode (`&amp;` LAST so a
    * literal `&amp;` in content never double-decodes), squeeze, trim.
    *
    * The decoder is an explicit entity TABLE (named + the numeric
    * forms the fixture and common crawls actually emit), not a
    * general `&#NN;`/`&#xNN;` evaluator — computing chr(NN) from a
    * regex capture is not expressible in native column functions on
    * either engine; a general decoder would need a custom codegen
    * Expression and is out of scope while every input speaks the
    * table. The same table is interpolated into the DuckDB oracle
    * (QueriesPipeline.htmlCleanSql) so the engines cannot drift.
    */
  def cleanLine(l: Column): Column = {
    val tagless = regexp_replace(l, "<[^>]*>", " ")
    val decoded = replace(replace(replace(replace(replace(replace(replace(
      replace(replace(replace(replace(
      tagless,
      lit("&#113;"), lit("q")),
      lit("&#39;"), lit("'")),
      lit("&apos;"), lit("'")),
      lit("&quot;"), lit("\"")),
      lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")),
      lit("&nbsp;"), lit(" ")),
      lit("&middot;"), lit(" ")),
      lit("&mdash;"), lit(" ")),
      lit("&copy;"), lit(" ")),
      lit("&amp;"), lit("&"))
    trim(regexp_replace(decoded, " +", " "))
  }

  /** Anchor-tag count on the RAW line (tags still present). */
  private def nLinks(l: Column): Column =
    (size(split(l, "<a ")) - lit(1)).cast("long")

  /** Pass 4 — the line gates over a pre-cleaned line. Integer
    * arithmetic only (no float thresholds to drift between engines):
    * letter present; link density ≤ 0.2 links/word as
    * `5·links ≤ words`; alpha-space ratio ≥ 70% as `10·other ≤ 3·len`.
    * Takes the RAW line (for the anchor count) and its CLEANED form
    * separately so the caller can bind the clean chain once — see
    * [[lineStructs]].
    */
  private def keepFrom(raw: Column, c: Column): Column =
    c.rlike("[a-z]") &&
      nLinks(raw) * lit(5L) <= size(split(c, " ")).cast("long") &&
      length(regexp_replace(c, "[a-z ]", "")).cast("long") * lit(10L) <=
        length(c).cast("long") * lit(3L)

  /** [[keepFrom]] over a raw line (the pre-r21 gate spelling, kept for
    * spec-level use): cleans inline, so each reference of the cleaned
    * value re-evaluates the chain — use [[lineStructs]] on any hot
    * path.
    */
  def keepLine(l: Column): Column = keepFrom(l, cleanLine(l))

  /** Per-line (raw, clean) structs for a body column. The ONE place
    * [[cleanLine]] is spelled on the extraction path (r21): HOF
    * lambdas are CodegenFallback and never CSE duplicated subtrees —
    * the previous filter(keepLine)-then-transform(cleanLine) spelling
    * re-evaluated the 11-replace + 2-regex clean chain up to 5× per
    * line (4 references inside the keep gate + the survivor
    * re-clean). Materializing the struct array binds the cleaned
    * string once per line; the gate and the output projection read
    * struct fields.
    */
  private def lineStructs(body: Column): Column =
    transform(split(body, "\n"),
      l => struct(l.as("raw"), cleanLine(l).as("clean")))

  /** The whole extraction over a frame carrying (doc_id, html):
    * adds body/lines bookkeeping and the extracted text. Stateless —
    * this exact projection is also the streaming twin
    * ([[graft.streaming.Streaming.htmlExtractStream]]).
    */
  def extractDocs(docs: DataFrame): DataFrame =
    docs
      .withColumn("_body", bodyOf(col("html")))
      .withColumn("_kept",
        filter(lineStructs(col("_body")),
          x => keepFrom(x.getField("raw"), x.getField("clean"))))
      .withColumn("extracted_text",
        array_join(transform(col("_kept"), x => x.getField("clean")), "\n"))
      .withColumn("n_chars_html", length(col("html")).cast("long"))
      .withColumn("n_chars_extracted", length(col("extracted_text")).cast("long"))
      .withColumn("lines_total",
        size(split(col("_body"), "\n")).cast("long"))
      .withColumn("lines_kept", size(col("_kept")).cast("long"))
      .drop("_body", "_kept")
}
