package graft.eth

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Price-feed boundary (the reference's CryptoCompare `histoday` call,
  * /root/reference/operations/token_prices.py:155-177). Production: an
  * HTTP client; tests: canned points. One handle per partition, same
  * seam shape as [[AbiSource]]/[[EthCallSource]].
  */
trait PriceSource extends Serializable {
  /** Daily close points (epochSecond, closeBTC) for `address` covering
    * the most recent `days` days; None/empty when the feed has no
    * exchange rate for the token (token_prices.py:170-177 returns
    * nothing on failure — the token is simply skipped).
    */
  def histoDay(address: String, days: Int): Option[Seq[(Long, Double)]]
}

/** Token-price operators (reference:
  * /root/reference/operations/token_prices.py):
  *  - B10 trailing moving average with warm-up passthrough (lines
  *    79-102: raw value is emitted until the 5-sample window fills)
  *  - B11 gap-days computation, fetch fan-out, id assignment and the
  *    price-table populate job (lines 131-186, 255-269)
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

  /** B11 fetch fan-out: one streamed `mapPartitions` pass over the
    * token addresses (the Spark analog of the reference's per-token
    * request loop, token_prices.py:244-259) → (address, time, close)
    * rows. Tokens without an exchange rate contribute nothing.
    */
  def fetchDailyPrices(spark: SparkSession, tokens: DataFrame,
      source: PriceSource, days: Int): DataFrame = {
    import spark.implicits._
    tokens.select(col(tokens.columns.head).cast("string")).as[String]
      .mapPartitions { it =>
        it.flatMap { addr =>
          source.histoDay(addr, days).getOrElse(Seq.empty)
            .iterator.map { case (time, close) => (addr, time, close) }
        }
      }
      .toDF("address", "time", "close")
  }

  /** Fetched points → `price`-table rows: per-address trailing moving
    * average (B10), BTC = average at the reference's 10-decimal
    * formatting (token_prices.py:122-124), timestamp from the epoch
    * second, id = "{address}_{date}". The window shuffles on address
    * only — each token's daily series is tiny and independent.
    */
  def priceRows(fetched: DataFrame): DataFrame =
    withMovingAverage(fetched)
      .select(
        col("address"),
        lit(null).cast("double").as("USD"),
        round(col("average"), 10).as("BTC"),
        lit(null).cast("double").as("ETH"),
        timestamp_seconds(col("time")).as("timestamp"))
      .withColumn("id", priceId(col("address"), col("timestamp")))
}
