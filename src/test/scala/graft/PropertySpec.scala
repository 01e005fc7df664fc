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
}
