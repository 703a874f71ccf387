package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming session windows: closed sessions emitted in append mode
  * equal the batch evaluation of the same expression, and a restart
  * emits nothing twice.
  */
class SessionStreamsSpec extends SparkSpec {

  test("sessionStats: closed streaming sessions == batch session_window, restart-idempotent") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("sessstream").toString
    val in = s"$root/events"

    def rows(xs: Seq[(Long, String, Double)]) =
      xs.toDF("uid", "t", "v")
        .select(col("uid"), col("t").cast("timestamp").as("ts"), col("v"))

    // user 1: two sessions (09:00-09:10 block, then 11:00); user 2: one.
    val early = rows(Seq(
      (1L, "2024-01-01 09:00:00", 1.0),
      (1L, "2024-01-01 09:10:00", 2.0),
      (1L, "2024-01-01 11:00:00", 4.0),
      (2L, "2024-01-01 09:05:00", 8.0)))
    early.coalesce(1).write.mode("append").parquet(in)

    def stream() = SessionStreams.sessionStats(
      CorpusStreams.docStream(spark, in, maxFilesPerTrigger = 1),
      keys = Seq("uid"), tsCol = "ts", value = col("v"))

    val out = s"$root/sessions"
    DerivedStreams.refreshOnce(stream(), out, s"$root/ckpt").awaitTermination()

    // advance the watermark past every early session end
    rows(Seq((9L, "2024-01-02 12:00:00", 0.0)))
      .coalesce(1).write.mode("append").parquet(in)
    DerivedStreams.refreshOnce(stream(), out, s"$root/ckpt").awaitTermination()

    val got = spark.read.parquet(out)
      .select("uid", "session_start", "n_events", "sum_v")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3)))
      .toSet

    // batch evaluation of the SAME expression over the early frame
    val batch = SessionStreams.sessionStats(early, Seq("uid"), "ts", col("v"))
      .select("uid", "session_start", "n_events", "sum_v")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3)))
      .toSet
    assert(batch === Set(
      (1L, "2024-01-01 09:00:00.0", 2L, 3.0),
      (1L, "2024-01-01 11:00:00.0", 1L, 4.0),
      (2L, "2024-01-01 09:05:00.0", 1L, 8.0)))
    assert(got === batch, "closed streaming sessions must equal the batch run")

    // restart with no new data: nothing re-emitted
    DerivedStreams.refreshOnce(stream(), out, s"$root/ckpt").awaitTermination()
    assert(spark.read.parquet(out).count() === got.size)
  }
}
