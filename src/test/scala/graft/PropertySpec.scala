package graft

import graft.indicators.Indicators

/** Property anchors from FIXTURES.md §3 (bars_flat / bars_edge /
  * two-symbol invariance) — deterministic seeded generators (the
  * scalatest/scalacheck bridge isn't in the offline cache, so cases
  * are hand-rolled).
  */
class PropertySpec extends SparkSpec {

  private def cases(seed: Long, n: Int = 3): Seq[List[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(List.fill(8 + rnd.nextInt(17))(1.0 + rnd.nextDouble() * 499.0))
  }

  private def forAll(gen: Seq[List[Double]])(f: List[Double] => Unit): Unit =
    gen.foreach(f)
  private def forAll2(g1: Seq[List[Double]], g2: Seq[List[Double]])(
      f: (List[Double], List[Double]) => Unit): Unit =
    g1.zip(g2).foreach { case (a, b) => f(a, b) }

  private val closesGen = cases(42)

  test("sma(c, 1) is the identity") {
    forAll(closesGen) { cs =>
      val out = Indicators(bars("x", cs.map(java.lang.Double.valueOf)))
        .sma(Seq("close"), 1).toDF
      assert(doubles(out, "close_sma_1") == doubles(out, "close"))
    }
  }

  test("sma and ema of a constant series equal the constant") {
    val flat = bars("x", Seq.fill(20)(java.lang.Double.valueOf(42.0)))
    val out = Indicators(flat).sma(Seq("close"), 5).ema(Seq("close"), 9).toDF
    assert(doubles(out, "close_sma_5").flatten.forall(_ == 42.0))
    assert(doubles(out, "close_ema_9").flatten.forall(_ == 42.0))
  }

  test("bollinger bands collapse to the mean on a flat series") {
    val flat = bars("x", Seq.fill(25)(java.lang.Double.valueOf(7.0)))
    val out = Indicators(flat).bollinger_bands(Seq("close"), 5, 2).toDF
    assert(doubles(out, "close_upprsier_band_5_2").flatten.forall(_ == 7.0))
    assert(doubles(out, "close_lower_band_5_2").flatten.forall(_ == 7.0))
  }

  test("williams %R lies in [-100, 0]") {
    forAll(closesGen) { cs =>
      val out = Indicators(bars("x", cs.map(java.lang.Double.valueOf))).williams_ri(5).toDF
      doubles(out, "williams_%r_5").flatten.foreach(v =>
        assert(v >= -100.0 - 1e-9 && v <= 1e-9, s"out of range: $v"))
    }
  }

  test("per-symbol results are invariant to adding another symbol's rows") {
    forAll2(cases(7), cases(11)) { (as, bs) =>
      val a = bars("a", as.map(java.lang.Double.valueOf))
      val b = bars("b", bs.map(java.lang.Double.valueOf))
      def run(df: org.apache.spark.sql.DataFrame) =
        doubles(
          Indicators(df).sma(Seq("close"), 3).ema(Seq("close"), 5)
            .daily_return(Seq("close")).dataframe.where("symbol = 'a'"),
          "close_sma_3")
      assert(run(a) == run(a.union(b)))
    }
  }

  test("single-row and empty inputs do not crash; rolling outputs are null") {
    val one = Indicators(bars("x", Seq(java.lang.Double.valueOf(5.0))))
      .sma(Seq("close"), 3).atr(3).vwap().toDF.collect()
    assert(one.length == 1)
    assert(one.head.isNullAt(one.head.fieldIndex("close_sma_3")))
    assert(one.head.isNullAt(one.head.fieldIndex("atr")))
    // vwap is cumulative: defined from row 1
    assert(!one.head.isNullAt(one.head.fieldIndex("vwap")))

    val empty = Indicators(bars("x", Seq.empty))
      .sma(Seq("close"), 3).rsi(Seq("close")).toDF.collect()
    assert(empty.isEmpty)
  }

  test("withExactCanonical: exactly one canonical per hash group, at the min id") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(19)
    (0 until 3).foreach { _ =>
      import spark.implicits._
      // random many-to-few id->hash assignment, including singletons
      val rows = (0L until (50 + rnd.nextInt(100)).toLong)
        .map(id => (id, s"h${rnd.nextInt(12)}"))
      val out = pipeline.Corpus
        .withExactCanonical(rows.toDF("doc_id", "cmd5"))
        .collect()
        .map(r => (r.getAs[String]("cmd5"), r.getAs[Long]("doc_id"),
          r.getAs[Boolean]("is_exact_canonical")))
      out.groupBy(_._1).foreach { case (h, grp) =>
        val canon = grp.filter(_._3)
        assert(canon.length == 1, s"hash $h: ${canon.length} canonicals")
        assert(canon.head._2 == grp.map(_._2).min, s"hash $h: wrong canonical")
      }
      assert(out.length == rows.length)
    }
  }

  test("substringDedupFilter invariants: bounds, unchanged docs, dup removal") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val docs = (0L until 40L).map { id =>
      (id, (0 until 5 + rnd.nextInt(20)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val out = pipeline.Corpus
      .substringDedupFilter(docs.toDF("doc_id", "text"), n = 4)
      .collect()
    assert(out.length == docs.length)
    val origMd5 = docs.toDF("doc_id", "text")
      .select(col("doc_id"), md5(col("text")).as("m")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = r.getAs[Long]("n_tokens"); val rem = r.getAs[Long]("n_removed")
      assert(rem >= 0 && rem <= n, s"doc $id: removed $rem of $n")
      val frac = r.getAs[Double]("removed_frac")
      assert(frac >= 0.0 && frac <= 1.0)
      // changed=false must mean the rebuilt text IS the original
      if (!r.getAs[Boolean]("changed"))
        assert(r.getAs[String]("text_sub_md5") == origMd5(id), s"doc $id mutated")
    }
    // an exact duplicate of doc 0 appended with a HIGHER id loses all
    // its windows (full-span removal)
    val dup = docs :+ (999L, docs.head._2)
    val dupOut = pipeline.Corpus
      .substringDedupFilter(dup.toDF("doc_id", "text"), n = 4)
      .where(col("doc_id") === 999L).collect().head
    if (dupOut.getAs[Long]("n_tokens") >= 4)
      assert(dupOut.getAs[Long]("n_removed") == dupOut.getAs[Long]("n_tokens"))
  }

  test("canonicalUrl is idempotent and scheme/host/path-shape preserving") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    val hosts = Vector("WWW.Example.com", "example.com", "cdn.a.co.uk", "X.Y.org")
    val ports = Vector("", ":80", ":443", ":8443")
    val paths = Vector("", "/", "/doc/1", "/A/B")
    val queries = Vector("", "?a=1", "?utm_source=f", "?b=2&a=1&ref=x", "?ref=x")
    val frags = Vector("", "#frag")
    val urls = (0 until 300).map { _ =>
      "https://" + hosts(rnd.nextInt(hosts.length)) + ports(rnd.nextInt(ports.length)) +
        paths(rnd.nextInt(paths.length)) + queries(rnd.nextInt(queries.length)) +
        frags(rnd.nextInt(frags.length))
    }
    val out = urls.toDF("u")
      .select(
        col("u"),
        pipeline.Corpus.canonicalUrl(col("u")).as("c1"),
        pipeline.Corpus.canonicalUrl(pipeline.Corpus.canonicalUrl(col("u"))).as("c2"))
      .collect()
    out.foreach { r =>
      val (u, c1, c2) = (r.getString(0), r.getString(1), r.getString(2))
      // idempotence: canonicalizing a canonical URL changes nothing
      assert(c1 == c2, s"not idempotent: $u -> $c1 -> $c2")
      assert(c1.startsWith("https://"), s"scheme lost: $u -> $c1")
      assert(!c1.contains("#") && !c1.contains("utm_") && !c1.contains("ref="),
        s"tracking/fragment survived: $u -> $c1")
      assert(!c1.matches("^[a-z]+://[^/]*:(80|443)/.*"), s"default port survived: $c1")
    }
  }

  test("registeredDomain is always a dot-suffix of the host") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val labels = Vector("www", "cdn", "a", "example", "co", "uk", "com",
      "github", "io", "x1", "unknowntld")
    val hosts = (0 until 200).map { _ =>
      (0 until 1 + rnd.nextInt(4)).map(_ => labels(rnd.nextInt(labels.length))).mkString(".")
    }
    hosts.toDF("host")
      .select(col("host"), pipeline.Corpus.registeredDomain(col("host")).as("rd"))
      .collect().foreach { r =>
        val (h, rd) = (r.getString(0), r.getString(1))
        assert(h == rd || h.endsWith("." + rd), s"$rd is not a suffix of $h")
        assert(rd.nonEmpty)
      }
  }

  test("shardAssign: contiguity, coverage and balance hold on random corpora") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    for (trial <- 1 to 3) {
      val nDocs = 50 + rnd.nextInt(200)
      val rows = (0L until nDocs).map { id =>
        // skewed doc lengths: mostly short, a few giants
        val len = if (rnd.nextInt(10) == 0) 200 + rnd.nextInt(800)
                  else 1 + rnd.nextInt(30)
        (id, (1 to len).map(i => s"t${id}_$i").mkString(" "))
      }
      val s = 4 + rnd.nextInt(5)
      val got = pipeline.Corpus.shardAssign(
          rows.toDF("doc_id", "text"), nShards = s)
        .orderBy("doc_id").collect()
      val shards = got.map(_.getAs[Long]("shard"))
      assert(shards.forall(x => x >= 0 && x < s), s"trial $trial: shard range")
      assert(shards.zip(shards.tail).forall { case (a, b) => a <= b },
        s"trial $trial: contiguity")
      val tot = got.map(_.getAs[Long]("n_tokens")).sum
      val maxDoc = got.map(_.getAs[Long]("n_tokens")).max
      got.groupBy(_.getAs[Long]("shard")).values.foreach { g =>
        val sz = g.map(_.getAs[Long]("n_tokens")).sum
        assert(math.abs(sz - tot.toDouble / s) <= maxDoc + 1,
          s"trial $trial: imbalance $sz vs ${tot.toDouble / s}")
      }
    }
  }

  test("winnowing guarantee holds on random docs with planted shared runs") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    def md5hex(x: String) =
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def h32(x: String) = java.lang.Long.parseLong(md5hex(x).substring(0, 8), 16)
    for (trial <- 1 to 5) {
      // plant a shared run of exactly w+n-1 = 11 tokens (the guarantee's
      // minimum) inside two otherwise-random documents
      val run = (1 to 11).map(i => s"r${trial}_$i").mkString(" ")
      def randTail(m: Int) = (1 to m).map(_ => s"x${rnd.nextInt(100000)}").mkString(" ")
      val docA = s"${randTail(3 + rnd.nextInt(10))} $run ${randTail(3 + rnd.nextInt(10))}"
      val docB = s"${randTail(3 + rnd.nextInt(10))} $run ${randTail(3 + rnd.nextInt(10))}"
      val rows = pipeline.Corpus.winnowFingerprintRows(
          Seq((1L, docA), (2L, docB)).toDF("doc_id", "text"))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("h"))
      val fpA = rows.filter(_._1 == 1L).map(_._2).toSet
      val fpB = rows.filter(_._1 == 2L).map(_._2).toSet
      assert((fpA & fpB).nonEmpty,
        s"trial $trial: shared ${11}-token run must share a fingerprint")
    }
  }

  test("TokenCountF equals size(split) on arbitrary unicode strings") {
    // the rewrite's byte-exactness claim, fuzzed: 0x20 never occurs
    // inside a UTF-8 multibyte sequence, so counting separator BYTES
    // equals counting separator CHARS equals the regex split length
    val rnd = new scala.util.Random(1601L)
    (1 to 2000).foreach { trial =>
      val len = rnd.nextInt(40)
      val s = new String((1 to len).map { _ =>
        rnd.nextInt(5) match {
          case 0 => ' '
          case 1 => (0x4e00 + rnd.nextInt(100)).toChar // CJK, 3-byte UTF-8
          case 2 => (0xe9 + rnd.nextInt(4)).toChar // latin-1, 2-byte UTF-8
          case _ => ('a' + rnd.nextInt(26)).toChar
        }
      }.toArray)
      val got = org.apache.spark.sql.graft.expressions.TokenCountF
        .count(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(got == s.split(" ", -1).length, s"trial $trial: '$s'")
    }
  }

  test("quality model logit is invariant to doc order and partitioning") {
    import org.apache.spark.sql.functions._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def key(df: org.apache.spark.sql.DataFrame) =
      pipeline.Corpus.qualityModelScore(df)
        .orderBy("doc_id").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("logit"))).toSeq
    val a = key(d.repartition(3))
    val b = key(d.repartition(17, col("source")))
    assert(a == b && a.nonEmpty)
  }
}
