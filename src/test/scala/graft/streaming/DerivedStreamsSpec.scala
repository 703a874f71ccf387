package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.eth.{DerivedViews, EthStore}

/** Streaming maintenance: dedup of re-appended (upserted) log rows,
  * high-water persistence through foreachBatch into contract_block,
  * and the compaction guard on stream-watched tables.
  */
class DerivedStreamsSpec extends SparkSpec {

  private def topicAddr(n: Int) = "0x" + "%064x".format(n)

  private def eventRows(ids: Seq[(String, Long)], seq: Long) = {
    val s = spark
    import s.implicits._
    ids.toDF("id", "blockNumber").select(
      col("id"), col("blockNumber"),
      lit("0xc0ffee").as("address"),
      lit("0xt1").as("transactionHash"),
      array(lit(DerivedViews.TransferTopic), lit(topicAddr(0xa)),
        lit(topicAddr(0xb))).as("topics"),
      lit("0x" + "%064x".format(BigInt(5) * BigInt(10).pow(17))).as("data"))
  }

  test("tokenTransfers stream dedups re-appended ids; highwater persists via foreachBatch") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("streamstore").toString
    val store = new EthStore(spark, root)

    // first ingest: two events; then an upsert re-appends event e1
    store.append("event", eventRows(Seq(("e1", 10L), ("e2", 11L)), 1L), 1L)
    store.append("event", eventRows(Seq(("e1", 10L)), 2L), 2L)

    val descriptions = Seq(("0xc0ffee", 17.toShort)).toDF("id", "decimals")
    val stream = DerivedStreams.eventStream(store, "event")

    val outDir = s"$root/token_transaction_stream"
    val q1 = DerivedStreams.refreshOnce(
      DerivedStreams.tokenTransfers(stream, descriptions),
      outDir, s"$root/ckpt_tt")
    q1.awaitTermination()

    // e1 appears ONCE despite the double append (ADVICE finding 1)
    val out = spark.read.parquet(outDir)
    assert(out.count() === 2)
    assert(out.filter(col("id") === "e1").count() === 1)
    assert(out.filter(col("id") === "e1").head().getAs[Double]("value") === 5.0)

    // high-water marks flow into contract_block via foreachBatch upsert
    val hw = DerivedStreams.contractHighWater(
      DerivedStreams.eventStream(store, "event"))
    val q2 = DerivedStreams.saveHighWaterOnce(hw, store, s"$root/ckpt_hw")
    q2.awaitTermination()
    val marks = store.tableFinal("contract_block")
      .filter(col("name") === "stream_events_block")
    assert(marks.count() === 1)
    assert(marks.head().getAs[Long]("value") === 11L)

    // compaction of a stream-watched table is refused (ADVICE finding 3)
    val err = intercept[IllegalArgumentException](store.compact("event"))
    assert(err.getMessage.contains("watched by a file stream"))
    intercept[IllegalArgumentException](
      store.overwrite("event", eventRows(Seq(("e3", 12L)), 3L), 3L))
  }

  test("windowedEventCounts rejects a non-timestamp time column") {
    val events = eventRows(Seq(("e1", 10L)), 1L) // blockNumber is Long
    val err = intercept[IllegalArgumentException](
      DerivedStreams.windowedEventCounts(events, "blockNumber"))
    assert(err.getMessage.contains("TimestampType"))
  }

  test("windowedEventCounts: watermarked window agg over a deduped stream, append mode") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("streamstore3").toString
    val store = new EthStore(spark, root)
    // two events in hour 0, one in hour 1; e1 re-appended (upsert)
    store.append("event", eventRows(Seq(("e1", 10L), ("e2", 11L), ("e3", 12L)), 1L), 1L)
    store.append("event", eventRows(Seq(("e1", 10L)), 2L), 2L)

    // block-timestamp dictionary (A14): blockNumber -> event time
    val ts = Seq(
      (10L, "2024-01-01 00:05:00"), (11L, "2024-01-01 00:40:00"),
      (12L, "2024-01-01 01:10:00"))
      .toDF("blockNumber", "t")
      .select(col("blockNumber"), col("t").cast("timestamp").as("block_ts"))
    val withTime = DerivedStreams.eventStream(store, "event")
      .join(broadcast(ts), Seq("blockNumber"))
    val counts = DerivedStreams.windowedEventCounts(withTime, "block_ts")

    val outDir = s"$root/windowed"
    val q = DerivedStreams.refreshOnce(counts, outDir, s"$root/ckpt_w")
    q.awaitTermination()
    // append mode emits only windows closed by the watermark: with max
    // event time 01:10 and a 2h watermark nothing is final yet — run a
    // second pass after appending a far-future row that advances it.
    store.append("event", eventRows(Seq(("e9", 13L)), 3L), 3L)
    val ts2 = ts.unionByName(Seq((13L, "2024-01-01 09:00:00")).toDF("blockNumber", "t")
      .select(col("blockNumber"), col("t").cast("timestamp").as("block_ts")))
    val q2 = DerivedStreams.refreshOnce(
      DerivedStreams.windowedEventCounts(
        DerivedStreams.eventStream(store.spark, store.path("event")).join(broadcast(ts2), Seq("blockNumber")),
        "block_ts"),
      outDir, s"$root/ckpt_w")
    q2.awaitTermination()

    val out = spark.read.parquet(outDir)
      .orderBy(col("window_start"))
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2)))
    // hour 0 holds e1 (deduped) + e2 = 2 events; hour 1 holds e3
    assert(out.contains(("2024-01-01 00:00:00.0", 2L)))
    assert(out.contains(("2024-01-01 01:00:00.0", 1L)))
  }

  test("null address/blockNumber rows are dropped before the typed highwater state") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("streamstore2").toString
    val store = new EthStore(spark, root)
    val withNull = eventRows(Seq(("e1", 10L)), 1L)
      .unionByName(eventRows(Seq(("e2", 0L)), 1L)
        .withColumn("blockNumber", lit(null).cast("long")))
    store.append("event", withNull, 1L)
    val hw = DerivedStreams.contractHighWater(
      DerivedStreams.eventStream(store, "event"))
    val q = DerivedStreams.saveHighWaterOnce(hw, store, s"$root/ckpt_hw")
    q.awaitTermination() // would throw NPE without the null filter
    assert(store.tableFinal("contract_block").head().getAs[Long]("value") === 10L)
  }
}
