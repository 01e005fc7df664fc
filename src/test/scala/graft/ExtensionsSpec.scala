package graft

import graft.functions.ewmaOver
import org.apache.spark.sql.functions.col

/** The SQL function surface must agree with the Column API. */
class ExtensionsSpec extends SparkSpec {

  test("ewma is callable from SQL with OVER and matches the Column API") {
    GraftExtensions.register(spark)
    val df = bars("x", Seq(1.0, 2.0, 3.0, 4.0))
    df.createOrReplaceTempView("ext_bars")
    val viaSql = spark.sql(
      """SELECT ewma(close, CAST(0.5 AS DOUBLE), false)
        |  OVER (PARTITION BY symbol ORDER BY timestamp) AS y
        |FROM ext_bars ORDER BY timestamp""".stripMargin)
      .collect().map(_.getDouble(0))
    val viaApi = df.withColumn(
        "y", ewmaOver(col("close"), 0.5, adjust = false, Seq(col("symbol")), Seq(col("timestamp"))))
      .orderBy("timestamp").select("y").collect().map(_.getDouble(0))
    assert(viaSql.toSeq == viaApi.toSeq)
  }

  test("dot_product_f is callable from SQL") {
    GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT dot_product_f(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(out == 11.0)
  }

  test("Column-selector overloads resolve like the reference's _get_column_names") {
    import graft.indicators.Indicators
    val df = bars("x", Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    // Column selectors resolve via a plan-only select (indicators.py:65-76)
    val viaCols = Indicators(df).sma(Seq(col("close")), 3).dataframe
      .orderBy("timestamp").select("close_sma_3").collect()
    val viaStrings = Indicators(df).sma(Seq("close"), 3).dataframe
      .orderBy("timestamp").select("close_sma_3").collect()
    assert(viaCols.sameElements(viaStrings))
    // varargs form + an expression selector producing a derived name
    val derived = Indicators(df.withColumn("c2", col("close") * 2))
      .daily_return(col("c2")).dataframe
    assert(derived.columns.contains("c2_daily_return"))
    // single-price-col methods accept a Column too (kama price_col)
    val viaKamaCol = Indicators(df).kama(col("close"), 3).dataframe
      .orderBy("timestamp").select("KAMA_close").collect()
    val viaKamaStr = Indicators(df).kama("close", 3).dataframe
      .orderBy("timestamp").select("KAMA_close").collect()
    assert(viaKamaCol.sameElements(viaKamaStr))
  }

  test("dot_product_fd and simhash_bits_f are callable from SQL") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      """SELECT
        |  dot_product_fd(array(CAST(1.5 AS FLOAT), CAST(-2 AS FLOAT)),
        |                 array(CAST(2 AS DOUBLE), CAST(0.5 AS DOUBLE))) AS d,
        |  simhash_bits_f(array(CAST(11 AS BIGINT))) AS s0,
        |  simhash_bits_f(array(CAST(11 AS BIGINT)), 32) AS s32
        |""".stripMargin).collect().head
    assert(got.getDouble(0) == 1.5 * 2 + (-2) * 0.5)
    assert(got.getLong(1) == 11L) // single token: its own bits win every vote
    assert(got.getLong(2) == 11L << 32)
  }

  test("bpe_encode and text_counts are callable from SQL") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      """SELECT
        |  length(bpe_encode('the quick brown fox')) AS n_bpe,
        |  text_counts('the a of x').n_tokens AS nt,
        |  text_counts('the a of x').stop_en AS se,
        |  text_counts('the a of x').stop_en_dist AS sed
        |""".stripMargin).collect().head
    // must agree with the Column-API spellings
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val want = Seq("x").toDF("d").select(
      graft.pipeline.Bpe.tokenCount(lit("the quick brown fox")),
      graft.pipeline.TextOps.textCounts(lit("the a of x")).getField("n_tokens"))
      .collect().head
    assert(got.getInt(0).toLong == want.getLong(0)) // SQL length() is INT
    assert(got.getInt(1) == 4 && got.getInt(1) == want.getInt(1))
    assert(got.getInt(2) == 3 && got.getInt(3) == 3)
  }

  test("wordpiece_encode is callable from SQL and matches the kernel") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT wordpiece_encode('window custom') AS p").collect().head
    assert(got.getSeq[String](0) ==
      graft.pipeline.Wordpiece.encodeString("window custom"))
    assert(got.getSeq[String](0).head == "window", "in-vocab word is one piece")
  }

  test("unigram_encode is callable from SQL and matches the kernel") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT unigram_encode('window batch') AS p").collect().head
    assert(got.getSeq[String](0) ==
      graft.pipeline.Unigram.encodeString("window batch"))
    assert(got.getSeq[String](0).head == "window", "budget survivor is one piece")
  }

  test("bpe_decode, bpe_pairs and qm_features are callable from SQL") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      """SELECT
        |  bpe_decode(bpe_encode('the quick brown fox')) AS rt,
        |  bpe_pairs('aaab') AS prs,
        |  bpe_ids(bpe_encode('fox')) AS ids,
        |  size(qm_features('the a of to and words here')) AS nf
        |""".stripMargin).collect().head
    assert(got.getString(0) == "the quick brown fox", "decode inverts encode")
    assert(got.getSeq[String](1) == Seq("aa", "ab"))
    assert(org.apache.spark.sql.graft.expressions.BpeIdsF.symbols(
      got.getSeq[Int](2).toArray) ==
      org.apache.spark.sql.graft.expressions.BpeEncodeF.encode("fox"))
    assert(got.getInt(3) == 69)
  }

  test("winnow_fp is callable from SQL and agrees with the Corpus spelling") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val text = (1 to 8).map(i => s"p$i").mkString(" ") + " alpha beta gamma " +
      (1 to 8).map(i => s"p$i").mkString(" ")
    val got = spark.sql(
      s"""SELECT winnow_fp('$text').n_grams AS g,
         |  size(winnow_fp('$text').positions) AS nf,
         |  winnow_fp('$text', 8, 4).hashes AS hs
         |""".stripMargin).collect().head
    val want = graft.pipeline.Corpus.winnowFingerprints(
      Seq((1L, text)).toDF("doc_id", "text")).collect().head
    assert(got.getLong(0) == want.getAs[Long]("n_grams"))
    assert(got.getInt(1).toLong == want.getAs[Long]("n_fingerprints"))
    assert(got.getSeq[Long](2).nonEmpty)
  }

  test("RewriteTokenCount: byte-exact with size(split), fires count-only, stays out otherwise") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftExtensions.register(spark)
    // 1. equivalence on every empty-token edge: empty string, leading/
    //    trailing/double spaces, single token
    val edges = Seq("", " ", "a", "a b", " a", "a ", "a  b", "  ", "a b c ")
    edges.foreach { s =>
      val viaKernel = org.apache.spark.sql.graft.expressions.TokenCountF
        .count(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val viaSplit = s.split(" ", -1).length
      assert(viaKernel == viaSplit, s"'$s'")
    }
    // values equal the spelling on the literal edge frame (the tiny
    // frame constant-folds to a LocalRelation, so plan-shape asserts
    // use the parquet-backed table below)
    val df = edges.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .orderBy("doc_id").collect().map(_.getInt(1)).toSeq
    assert(got == edges.map(_.split(" ", -1).length).toSeq)
    // ANSI-off sessions run the legacy -1-on-null Size; the rewrite
    // must preserve it (coalesce(kernel, -1))
    val nullGot = Seq((1L, null: String)).toDF("doc_id", "text")
      .select(size(split(col("text"), " ")).as("n")).collect().head
    assert(nullGot.getInt(0) == -1)
    // 2. count-only shape over a scan: the rewrite fires (optimized
    //    plan carries TokenCountF, no StringSplit)
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val counted = d.select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val opt = counted.queryExecution.optimizedPlan.toString
    assert(opt.contains("tokencountf") || opt.contains("TokenCountF"), opt)
    assert(!opt.contains("split("), opt)
    // and the rewritten scan agrees with a rule-free evaluation
    val want = d.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).length).toMap
    counted.collect().foreach(r => assert(r.getInt(1) == want(r.getLong(0))))
    // 3. mixed shape: a sibling consumes the split array, so the rule
    //    must stay out (subexpression elimination already shares the
    //    one split; rewriting would add a byte scan)
    val mixed = d.select(
      size(split(col("text"), " ")).as("n"),
      array_join(split(col("text"), " "), "|").as("joined"))
    val optMixed = mixed.queryExecution.optimizedPlan.toString
    assert(!optMixed.contains("tokencountf") && !optMixed.contains("TokenCountF"), optMixed)
    // 4. non-space patterns untouched
    val other = d.select(size(split(col("text"), ",")).as("n"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("TokenCountF"))
  }

  test("var_alpha_ewma is callable from SQL with OVER") {
    GraftExtensions.register(spark)
    val df = bars("x", Seq(10.0, 20.0, 30.0))
    df.createOrReplaceTempView("ext_bars2")
    val got = spark.sql(
      """SELECT var_alpha_ewma(close, CAST(0.5 AS DOUBLE))
        |  OVER (PARTITION BY symbol ORDER BY timestamp) AS y
        |FROM ext_bars2 ORDER BY timestamp""".stripMargin)
      .collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(10.0, 15.0, 22.5))
  }
}
