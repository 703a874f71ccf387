package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}

import graft.eth.DerivedViews

/** Per-contract ingestion state carried across micro-batches: the
  * streaming analog of the reference's `contract_block` high-water
  * marks (/root/reference/utils.py:96-117,186-209).
  */
case class HighWater(address: String, maxBlock: Long, events: Long)

/** Structured-Streaming maintenance of the derived tables — the
  * incremental path for what ClickHouse does with materialized views
  * (/root/reference/operations/contract_transactions.py:103-112,
  * token_holders.py:20-51) and what the reference's restart-forever
  * docker loop does for ingestion (docker-compose.yml:14-15,
  * operations/clickhouse.py:151-159).
  *
  * Design: the batch transforms in [[graft.eth.DerivedViews]] are
  * stateless (filter + projection + stream-static broadcast join), so
  * the SAME code runs over `readStream` unchanged — one definition,
  * two execution modes. State appears only where semantics demand it:
  * watermarked windows for time-series aggregates and
  * `mapGroupsWithState` for per-contract frontiers.
  *
  * Scale notes: stream-static joins re-broadcast the static side per
  * micro-batch (fine for the small dimension tables here); watermarks
  * bound window state so a 100 TB/day stream does not accumulate
  * unbounded aggregation state; `maxFilesPerTrigger` is the knob that
  * turns a parquet directory into a paced replay source.
  */
object DerivedStreams {

  /** Streaming source over a store table's parquet append log. */
  def eventStream(spark: org.apache.spark.sql.SparkSession, path: String,
      maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream
      .schema(graft.eth.Schemas.event.add("_seq", org.apache.spark.sql.types.LongType))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** A34 incrementally: ERC-20 Transfer decode over an event stream,
    * decimals via stream-static ANY-INNER broadcast join. Append-mode
    * safe (no aggregation).
    */
  def tokenTransfers(events: DataFrame, contractDescriptions: DataFrame): DataFrame =
    DerivedViews.tokenTransfers(events, contractDescriptions)

  /** Continuous time-series aggregate (the Grafana dashboard shape,
    * SURVEY A15/A22) with a watermark bounding state: per event-time
    * window and emitting address, count + distinct-ish transfer volume.
    * `ts` must be an event-time timestamp column (block timestamp via
    * the A14 broadcast dictionary join).
    */
  def windowedEventCounts(events: DataFrame, tsCol: String,
      windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("address"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("transactionHash")).as("n_txs"))
      .select(col("window.start").as("window_start"), col("address"),
        col("n_events"), col("n_txs"))

  private def updateHighWater(address: String, rows: Iterator[(String, Long)],
      state: GroupState[HighWater]): HighWater = {
    val prev = state.getOption.getOrElse(HighWater(address, -1L, 0L))
    var mx = prev.maxBlock
    var n = prev.events
    rows.foreach { case (_, b) => if (b > mx) mx = b; n += 1 }
    val next = HighWater(address, mx, n)
    state.update(next)
    next
  }

  /** B17 incrementally: per-contract high-water marks maintained as
    * streaming state (`mapGroupsWithState`) instead of re-scanning the
    * `contract_block` table each pass. Update output mode.
    */
  def contractHighWater(events: DataFrame): Dataset[HighWater] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("address"), col("blockNumber"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(updateHighWater _)
  }

  /** Run one incremental MV maintenance pass: process whatever files
    * are new since the checkpoint, then stop — the flag-gated,
    * idempotent "one sync pass" of the reference's restart loop,
    * expressed as Trigger.AvailableNow.
    */
  def refreshOnce(derived: DataFrame, outPath: String, checkpoint: String): StreamingQuery =
    derived.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
