package graft

import org.apache.spark.sql.functions.col

import graft.indicators.Kernel

/** Kernel primitive semantics pinned against polars behavior
  * (SURVEY.md §2.1).
  */
class KernelSpec extends SparkSpec {

  test("rolling min_periods gate: NULL until n non-null values") {
    val df = bars("x", Seq(1.0, 2.0, 3.0, 4.0))
      .withColumn("y", Kernel.rollMean(col("close"), 2, Kernel.bySymbol))
    assertSeq(doubles(df, "y"), Seq(None, Some(1.5), Some(2.5), Some(3.5)))
  }

  test("rolling gate counts non-null, not rows") {
    val df = bars("x", Seq(1.0, null, 3.0, 4.0))
      .withColumn("y", Kernel.rollMean(col("close"), 2, Kernel.bySymbol))
    // windows: [1], [1,null], [null,3], [3,4] -> only the last has 2 non-null
    assertSeq(doubles(df, "y"), Seq(None, None, None, Some(3.5)))
  }

  test("cum_sum skips nulls in total but emits null at null rows") {
    val df = bars("x", Seq(1.0, null, 3.0))
      .withColumn("y", Kernel.cumSum(col("close"), Kernel.bySymbol))
    assertSeq(doubles(df, "y"), Seq(Some(1.0), None, Some(4.0)))
  }

  test("cum_prod same null placement") {
    val df = bars("x", Seq(2.0, null, 3.0))
      .withColumn("y", Kernel.cumProd(col("close"), Kernel.bySymbol))
    assertSeq(doubles(df, "y"), Seq(Some(2.0), None, Some(6.0)))
  }

  test("sum_horizontal treats nulls as 0 including the all-null row") {
    val df = bars("x", Seq[java.lang.Double](null))
      .withColumn("y", Kernel.sumHorizontal(Seq(col("close"), col("open"))))
    assertSeq(doubles(df, "y"), Seq(Some(0.0)))
  }

  test("shift lags and leads") {
    val df = bars("x", Seq(1.0, 2.0, 3.0))
      .withColumn("lag1", Kernel.shift(col("close"), 1, Kernel.bySymbol))
      .withColumn("lead1", Kernel.shift(col("close"), -1, Kernel.bySymbol))
    assertSeq(doubles(df, "lag1"), Seq(None, Some(1.0), Some(2.0)))
    assertSeq(doubles(df, "lead1"), Seq(Some(2.0), Some(3.0), None))
  }

  test("rolling_std is sample std (ddof=1)") {
    val df = bars("x", Seq(1.0, 2.0, 4.0))
      .withColumn("y", Kernel.rollStd(col("close"), 3, Kernel.bySymbol))
    // sample std of [1,2,4]: mean 7/3, var = ((16+1+25)/9)/2 ... = 2.333…
    assertSeq(doubles(df, "y"), Seq(None, None, Some(math.sqrt(7.0 / 3.0))))
  }
}
