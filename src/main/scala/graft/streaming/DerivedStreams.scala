package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}
import org.apache.spark.sql.types.TimestampType

import graft.eth.{DerivedViews, EthStore}

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
  * the SAME code runs over `readStream` — with ONE addition: the
  * stream reads the raw `_seq` append log, whereas the batch path
  * reads `store.tableFinal` (latest-`_seq` dedup). To keep the two
  * modes equivalent, streaming transforms first pass through
  * [[firstIngest]], which drops re-appended versions of an id so an
  * upsert does not reprocess the row. State appears only where
  * semantics demand it: watermarked windows for time-series
  * aggregates and `mapGroupsWithState` for per-contract frontiers.
  *
  * Raw-log semantics (documented contract): an upsert of id X appends
  * a second physical row for X. Batch FINAL reads resolve it to the
  * latest version; a file stream sees BOTH rows, FIRST version first.
  * `firstIngest` therefore yields first-write-wins semantics — right
  * for immutable chain data (re-extraction writes identical rows),
  * but an intentionally-changed row is NOT re-derived; that case is
  * the batch recompute's job (Pipeline.deriveViews).
  *
  * Scale notes: stream-static joins re-broadcast the static side per
  * micro-batch (fine for the small dimension tables here); watermarks
  * bound window and dedup state so a 100 TB/day stream does not
  * accumulate unbounded state; `maxFilesPerTrigger` is the knob that
  * turns a parquet directory into a paced replay source.
  */
object DerivedStreams {

  /** Streaming source over a store table's parquet append log.
    *
    * The file source checkpoints files BY NAME, so the watched
    * directory must be append-only: `EthStore.compact`/`overwrite`
    * delete and rewrite files, which the source would see as all-new
    * and replay the entire table into the derived outputs. The
    * store-based overload below drops a marker that makes
    * `EthStore.compact` refuse; if you stream a path directly, never
    * compact it (or stream from a separate immutable landing dir).
    */
  def eventStream(spark: SparkSession, path: String,
      maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream
      .schema(graft.eth.Schemas.event.add("_seq", org.apache.spark.sql.types.LongType))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Stream a store table and mark it stream-watched so
    * `EthStore.compact` refuses to rewrite it out from under the
    * checkpoint (ADVICE: compaction would replay the whole table).
    */
  def eventStream(store: EthStore, table: String): DataFrame = {
    store.markStreamWatched(table)
    eventStream(store.spark, store.path(table))
  }

  /** First-write-wins dedup over the raw append log, so upserted rows
    * are not processed twice by downstream aggregates.
    *
    * With an event-time column, dedup state is watermark-bounded
    * (`dropDuplicatesWithinWatermark`) — the scale path. Without one
    * (the chain tables have no timestamp; blockNumber is logical
    * time), plain `dropDuplicates` keeps all-ids state: fine for a
    * bounded replay (Trigger.AvailableNow maintenance pass), not for
    * an unbounded 24/7 stream — give it a timestamp there.
    */
  def firstIngest(stream: DataFrame, keys: Seq[String] = Seq("id"),
      tsCol: Option[String] = None, watermark: String = "2 hours"): DataFrame =
    tsCol match {
      case Some(c) =>
        stream.withWatermark(c, watermark).dropDuplicatesWithinWatermark(keys)
      case None => stream.dropDuplicates(keys)
    }

  /** A34 incrementally: ERC-20 Transfer decode over an event stream,
    * decimals via stream-static ANY-INNER broadcast join. Input is
    * deduped to first-ingest rows so log upserts do not emit duplicate
    * transfers. Append-mode safe (no aggregation).
    */
  def tokenTransfers(events: DataFrame, contractDescriptions: DataFrame): DataFrame =
    DerivedViews.tokenTransfers(firstIngest(events), contractDescriptions)

  /** Continuous time-series aggregate (the Grafana dashboard shape,
    * SURVEY A15/A22) with a watermark bounding state: per event-time
    * window and emitting address, row count + approx-distinct
    * transaction count. `tsCol` must already be a `TimestampType`
    * event-time column (the raw event table has none — join block
    * timestamps in first via the A14 broadcast dictionary join);
    * asserted here so misuse fails at construction, not at runtime.
    * Rows are deduped by id within the watermark before aggregation.
    */
  def windowedEventCounts(events: DataFrame, tsCol: String,
      windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame = {
    require(events.schema(tsCol).dataType == TimestampType,
      s"windowedEventCounts needs a TimestampType event-time column; " +
        s"'$tsCol' is ${events.schema(tsCol).dataType.simpleString}")
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("id")
      .groupBy(window(col(tsCol), windowLen), col("address"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct(col("transactionHash")).as("n_txs"))
      .select(col("window.start").as("window_start"), col("address"),
        col("n_events"), col("n_txs"))
  }

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
    * `contract_block` table each pass. Null addresses/blockNumbers are
    * dropped before the typed conversion (blockNumber is nullable in
    * the schema; a null would kill the query). Update output mode —
    * persist via [[saveHighWaterOnce]], not the append-mode file sink.
    */
  def contractHighWater(events: DataFrame): Dataset[HighWater] = {
    val spark = events.sparkSession
    import spark.implicits._
    firstIngest(events)
      .filter(col("address").isNotNull && col("blockNumber").isNotNull)
      .select(col("address"), col("blockNumber"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(updateHighWater _)
  }

  /** Run one incremental MV maintenance pass for a STATELESS append
    * stream (e.g. [[tokenTransfers]]): process whatever files are new
    * since the checkpoint, then stop — the flag-gated, idempotent
    * "one sync pass" of the reference's restart loop, expressed as
    * Trigger.AvailableNow. Stateful update-mode streams
    * ([[contractHighWater]]) cannot use the append-only file sink;
    * they go through [[saveHighWaterOnce]].
    */
  def refreshOnce(derived: DataFrame, outPath: String, checkpoint: String): StreamingQuery =
    derived.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Persist one [[contractHighWater]] maintenance pass by upserting
    * each micro-batch's frontier rows into the `contract_block` table
    * — the reference's `_save_max_block`
    * (/root/reference/utils.py:197-199) — via `foreachBatch`, which
    * supports Update output where the file sink cannot. Reads of
    * `contract_block` go through the FINAL dedup view, so appending a
    * newer `_seq` version IS the upsert.
    */
  def saveHighWaterOnce(highWater: Dataset[HighWater], store: EthStore,
      checkpoint: String, flagName: String = "stream_events_block"): StreamingQuery =
    highWater.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[HighWater], batchId: Long) =>
        val rows = batch.toDF().select(
          col("address").as("id"),
          lit(flagName).as("name"),
          col("maxBlock").as("value"))
        store.append("contract_block", rows, System.currentTimeMillis() + batchId)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
