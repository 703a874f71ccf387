package graft.eth

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-price operators (reference:
  * /root/reference/operations/token_prices.py):
  *  - B10 trailing moving average with warm-up passthrough (lines
  *    79-102: raw value is emitted until the 5-sample window fills)
  *  - B11 gap-days computation + id assignment (lines 131-186)
  */
object Prices {

  /** B10: trailing `window`-row moving average over `valueCol`,
    * partitioned/ordered as given; rows before the window fills emit
    * the RAW value (matching the reference's stack-based warm-up).
    */
  def trailingAverage(
      df: DataFrame,
      partition: Seq[Column],
      order: Seq[Column],
      valueCol: Column,
      window: Int = 5): Column = {
    val w = Window.partitionBy(partition: _*).orderBy(order: _*)
    val ma = avg(valueCol).over(w.rowsBetween(-(window - 1), 0))
    when(row_number().over(w) >= window, ma).otherwise(valueCol)
  }

  /** Apply B10 to a price table (address, time, close) → adds
    * `average`.
    */
  def withMovingAverage(prices: DataFrame, window: Int = 5): DataFrame =
    prices.withColumn("average",
      trailingAverage(prices, Seq(col("address")), Seq(col("time")),
        col("close"), window))

  /** B11: days to (re)fetch per token: (now - last_known).days + 1,
    * capped (DAYS_LIMIT=2000, token_prices.py:14,131-140).
    */
  def gapDays(lastTimestamp: Option[java.time.LocalDate],
      today: java.time.LocalDate, cap: Int = 2000): Int =
    lastTimestamp match {
      case None => cap
      case Some(d) =>
        val days = java.time.temporal.ChronoUnit.DAYS.between(d, today).toInt + 1
        math.min(math.max(days, 0), cap)
    }

  /** Price row id convention "{address}_{yyyy-MM-dd}"
    * (token_prices.py:60).
    */
  def priceId(address: Column, date: Column): Column =
    concat(address, lit("_"), date_format(date, "yyyy-MM-dd"))
}
