package graft

import org.apache.spark.sql.functions.col

import graft.functions.ewmaOver

/** Golden values for the custom EWMA window expression, both adjust
  * modes, incl. the ignore_nulls=False null-gap weighting the round-1
  * advisor flagged (polars docs: [x0, null, x2] with adjust=False gives
  * ((1-a)^2*x0 + a*x2) / ((1-a)^2 + a)).
  */
class EwmaSpec extends SparkSpec {

  private def run(closes: Seq[java.lang.Double], alpha: Double, adjust: Boolean): Seq[Option[Double]] =
    doubles(
      bars("x", closes).withColumn(
        "y",
        ewmaOver(col("close"), alpha, adjust, Seq(col("symbol")), Seq(col("timestamp")))),
      "y")

  test("adjust=false plain recursion") {
    assertSeq(run(Seq(1.0, 2.0, 3.0), 0.5, adjust = false),
      Seq(Some(1.0), Some(1.5), Some(2.25)))
  }

  test("adjust=false null gap uses decayed weights (ignore_nulls=False)") {
    // ((1-a)^2*1 + a*3)/((1-a)^2 + a) = 1.75/0.75
    assertSeq(run(Seq(1.0, null, 3.0), 0.5, adjust = false),
      Seq(Some(1.0), Some(1.0), Some(1.75 / 0.75)))
  }

  test("adjust=false leading nulls stay null") {
    assertSeq(run(Seq(null, null, 4.0, 6.0), 0.5, adjust = false),
      Seq(None, None, Some(4.0), Some(5.0)))
  }

  test("adjust=true weighted form") {
    // y2 = (0.25*1 + 0.5*2 + 3)/(0.25 + 0.5 + 1)
    assertSeq(run(Seq(1.0, 2.0, 3.0), 0.5, adjust = true),
      Seq(Some(1.0), Some(2.5 / 1.5), Some(4.25 / 1.75)))
  }

  test("adjust=true null gap keeps decaying weights") {
    // weights (1-a)^2 for x0, 1 for x2 -> (0.25*1 + 3)/(1.25)
    assertSeq(run(Seq(1.0, null, 3.0), 0.5, adjust = true),
      Seq(Some(1.0), Some(1.0), Some(3.25 / 1.25)))
  }

  test("constant series is the constant") {
    assertSeq(run(Seq(7.0, 7.0, 7.0, 7.0), 0.3, adjust = false),
      Seq.fill(4)(Some(7.0)))
    assertSeq(run(Seq(7.0, 7.0, 7.0, 7.0), 0.3, adjust = true),
      Seq.fill(4)(Some(7.0)))
  }

  test("per-symbol partition isolation") {
    val df = bars("a", Seq(1.0, 2.0)).union(bars("b", Seq(10.0, 20.0)))
    val out = doubles(
      df.withColumn(
        "y",
        ewmaOver(col("close"), 0.5, adjust = false, Seq(col("symbol")), Seq(col("timestamp")))),
      "y")
    assert(out == Seq(Some(1.0), Some(1.5), Some(10.0), Some(15.0)))
  }
}
