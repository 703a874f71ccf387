package graft.eth

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** B10/B11 semantics, golden sequence from
  * tests/token_prices_tests.py:39-61.
  */
class PricesSpec extends SparkSpec {

  test("trailing average emits raw close until the 5-window fills (golden)") {
    val s = spark
    import s.implicits._
    val prices = Seq(2, 3, 4, 5, 4, 200, 5).zipWithIndex
      .map { case (c, i) => ("0x1", i, c.toDouble) }
      .toDF("address", "time", "close")
    val got = Prices.withMovingAverage(prices)
      .orderBy(col("time")).collect().map(_.getAs[Double]("average"))
    assert(got.toSeq === Seq(
      2.0, 3.0, 4.0, 5.0,
      (2 + 3 + 4 + 5 + 4) / 5.0,
      (3 + 4 + 5 + 4 + 200) / 5.0,
      (4 + 5 + 4 + 200 + 5) / 5.0))
  }

  test("gapDays: cap, fresh, and missing history") {
    val today = java.time.LocalDate.of(2026, 8, 12)
    assert(Prices.gapDays(None, today) === 2000)
    assert(Prices.gapDays(Some(today.minusDays(3)), today) === 4)
    assert(Prices.gapDays(Some(today.minusDays(5000)), today) === 2000)
    assert(Prices.gapDays(Some(today), today) === 1)
  }

  test("priceId follows the addr_date convention") {
    val s = spark
    import s.implicits._
    val df = Seq(("0xabc", "2018-05-03")).toDF("address", "d")
      .select(Prices.priceId(col("address"), to_date(col("d"))).as("id"))
    assert(df.head().getString(0) === "0xabc_2018-05-03")
  }
}
