package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (ANSI off for polars float
  * div-by-zero parity, SURVEY.md §2.6 Q12; UTC; small shuffle count).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  import scala.jdk.CollectionConverters._

  val barsSchema: StructType = StructType(Seq(
    StructField("symbol", StringType),
    StructField("timestamp", TimestampType),
    StructField("open", DoubleType),
    StructField("high", DoubleType),
    StructField("low", DoubleType),
    StructField("close", DoubleType),
    StructField("volume", DoubleType)))

  /** Rows at 1-hour spacing from epoch, one symbol. */
  def bars(sym: String, closes: Seq[java.lang.Double]): DataFrame = {
    val rows = closes.zipWithIndex.map { case (c, i) =>
      val high = if (c == null) null else java.lang.Double.valueOf(c + 1)
      val low = if (c == null) null else java.lang.Double.valueOf(c - 1)
      Row(sym, new java.sql.Timestamp(i * 3600L * 1000), c, high, low, c,
        java.lang.Double.valueOf(100.0 * (i + 1)))
    }
    spark.createDataFrame(rows.asJava, barsSchema)
  }

  def doubles(df: DataFrame, column: String): Seq[Option[Double]] =
    df.orderBy("symbol", "timestamp").select(column).collect().toSeq
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))

  def assertSeq(actual: Seq[Option[Double]], expected: Seq[Option[Double]], tol: Double = 1e-9): Unit = {
    assert(actual.length == expected.length, s"length: $actual vs $expected")
    actual.zip(expected).zipWithIndex.foreach {
      case ((Some(a), Some(e)), i) =>
        assert(math.abs(a - e) <= tol * math.max(1.0, math.abs(e)), s"row $i: $a != $e")
      case ((a, e), i) => assert(a == e, s"row $i: $a != $e")
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession =
    graft.sources.Sessions.builder("local[4]", 4).appName("graft-test").getOrCreate()
}
