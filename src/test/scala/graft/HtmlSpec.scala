package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Html

/** Pins the HTML→text front door (r19 verdict ask #2): the synthetic
  * page fixture, each extraction pass, the integer line gates, the
  * exact-roundtrip invariant, and the map-only plan shape. The
  * engine-vs-DuckDB agreement is pinned separately by the
  * `extract_html` / `html_extract_stats` oracle rows.
  */
class HtmlSpec extends SparkSpec {

  private def pages(texts: (Long, String)*) = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"),
        Html.synthHtml(col("doc_id"), col("text")).as("html"))
  }

  private def extracted(texts: (Long, String)*) =
    Html.extractDocs(pages(texts: _*))
      .withColumn("rt",
        replace(col("extracted_text"), lit("\n"), lit(" ")) === col("text"))
      .orderBy("doc_id")
      .collect()

  test("extraction exactly round-trips the clean text, midpoint-cut edge cases included") {
    val rows = extracted(
      1L -> "the fast key order sort table scan merge part window",
      2L -> "ab", // no space after midpoint: p2 is empty, its <p> line is gated out
      3L -> "a b", // cut consumes the only space
      4L -> "query quick quorum sequence", // numeric-entity path on real content
      5L -> "spark join")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("rt"),
        s"doc ${r.getLong(0)}: <${r.getAs[String]("extracted_text")}>")
    }
    // doc 2: single surviving line, no stray newline from the empty <p>
    val d2 = rows(1).getAs[String]("extracted_text")
    assert(d2 == "ab" && rows(1).getAs[Long]("lines_kept") == 1L)
    assert(rows(0).getAs[Long]("lines_kept") == 2L)
  }

  test("head/nav/script/footer boilerplate never leaks into extracted text") {
    val r = extracted(7L -> "batch stream spark window merge value sort")(0)
    val out = r.getAs[String]("extracted_text")
    for (bad <- Seq("<", ">", "&", "home", "about", "contact", "track(",
        "doc 7", "terms", "privacy", "corpus", "2026", "color", "nav"))
      assert(!out.contains(bad), s"boilerplate <$bad> leaked: $out")
    // 10 body lines survive head removal; only the two <p> lines pass the gates
    assert(r.getAs[Long]("lines_total") == 10L &&
      r.getAs[Long]("lines_kept") == 2L,
      s"${r.getAs[Long]("lines_total")}/${r.getAs[Long]("lines_kept")}")
  }

  test("entity decode is total and ordered: numeric first, &amp; last, no double decode") {
    import spark.implicits._
    val df = Seq((1L,
      "<p>alpha beta a &#113;b &lt;c&gt; &amp;#113; d&amp;e gamma delta epsilon words</p>"))
      .toDF("doc_id", "html")
    val out = Html.extractDocs(df).collect()(0).getAs[String]("extracted_text")
    // &amp;#113; must decode to the LITERAL &#113;, not to q — the
    // numeric pass runs before the &amp; pass ever creates a new &#.
    assert(out == "alpha beta a qb <c> &#113; d&e gamma delta epsilon words", s"<$out>")
    // the wider table: quotes, apostrophes (named + numeric), nbsp
    val df2 = Seq((2L,
      "<p>she said &quot;it&apos;s mine&quot; and it&#39;s done alpha beta gamma delta</p>"))
      .toDF("doc_id", "html")
    val out2 = Html.extractDocs(df2).collect()(0).getAs[String]("extracted_text")
    assert(out2 == "she said \"it's mine\" and it's done alpha beta gamma delta", s"<$out2>")
    val df3 = Seq((3L, "<p>alpha&nbsp;beta&nbsp;&nbsp;gamma delta epsilon</p>"))
      .toDF("doc_id", "html")
    val out3 = Html.extractDocs(df3).collect()(0).getAs[String]("extracted_text")
    assert(out3 == "alpha beta gamma delta epsilon", s"<$out3>")
  }

  test("line gates: high link density and non-alpha lines drop, content lines keep") {
    import spark.implicits._
    val df = Seq(
      (1L, "<p>plain words here</p>"), // keep
      (2L, "<a href=\"/\">x</a> <a href=\"/\">y</a> join"), // 2 links / 3 words: drop
      (3L, "123 456 789 0"), // no letter: drop
      (4L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"), // digits >30% of chars: drop
      (5L, "<a href=\"/\">deep</a> spark merge query value sort group row" +
        " agg filter")) // 1 link / 10 words: keep
      .toDF("doc_id", "html")
    val got = Html.extractDocs(df).orderBy("doc_id")
      .select("doc_id", "lines_kept").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 1L), got.toString)
  }

  test("the extraction plan is map-only: no Exchange of any kind") {
    val df = Html.extractDocs(pages(1L -> "spark join merge sort"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"front door claims a shuffle-free map pass but the plan has an Exchange:\n$plan")
  }

  test("cleanLine chain is spelled once per line in the extraction plan (r21 fusion)") {
    // HOF lambdas are CodegenFallback — duplicated subtrees inside or
    // across lambda bodies never CSE — so the pre-r21 spelling carried
    // the 11-replace + 2-regex clean chain 5× per line (4 gate
    // references + the survivor re-clean). The struct fusion must pin
    // it to exactly ONE occurrence; the DECODER direction of the
    // numeric-entity replace prints as `&#113;, q` (the generator's
    // encode side prints `q, &#113;`), so its count in the executed
    // plan counts clean-chain spellings and nothing else.
    // spark.range input: a literal fixture constant-folds the whole
    // extraction into a LocalTableScan and the assertion sees no plan
    val src = spark.range(1).select(col("id").as("doc_id"),
      concat(lit("spark join merge sort "), col("id").cast("string")).as("text"))
    val plan = Html.extractDocs(
        src.select(col("doc_id"), col("text"),
          Html.synthHtml(col("doc_id"), col("text")).as("html")))
      .queryExecution.executedPlan.toString
    val n = "&#113;, q".r.findAllIn(plan).size
    assert(n == 1, s"expected exactly 1 cleanLine spelling, found $n:\n$plan")
  }
}
