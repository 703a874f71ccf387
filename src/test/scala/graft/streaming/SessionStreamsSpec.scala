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

  test("funnelProgress: stage state survives micro-batches; each advance emitted once") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("funnelstream").toString
    val in = s"$root/events"

    // batch 1: user 1 clicks (pre-signup, must not count) then signs up;
    // user 2 signs up.
    Seq((1L, 10L, "click"), (1L, 20L, "signup"), (2L, 15L, "signup"))
      .toDF("uid", "t", "etype").coalesce(1).write.mode("append").parquet(in)

    def stream() = SessionStreams.funnelProgress(
      CorpusStreams.docStream(spark, in, maxFilesPerTrigger = 1),
      "uid", "t", "etype", Seq("signup", "click", "purchase")).toDF()

    val out = s"$root/progress"
    DerivedStreams.refreshOnce(stream(), out, s"$root/ckpt").awaitTermination()
    val p1 = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(p1 === Set((1L, 1, 20L), (2L, 1, 15L)),
      "pre-signup click must not advance; both signups emit stage 1")

    // batch 2: user 1 completes click+purchase — stage-1 state must
    // have survived the first batch's checkpoint.
    Seq((1L, 30L, "click"), (1L, 40L, "purchase"), (2L, 5L, "click"))
      .toDF("uid", "t", "etype").coalesce(1).write.mode("append").parquet(in)
    DerivedStreams.refreshOnce(stream(), out, s"$root/ckpt").awaitTermination()
    val p2 = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // user 2's click at t=5 predates their signup time 15: forward-only
    // state machine requires t >= stage-1 time, so no advance.
    assert(p2 === p1 ++ Set((1L, 2, 30L), (1L, 3, 40L)))

    // restart with no new data: nothing re-emitted
    DerivedStreams.refreshOnce(stream(), out, s"$root/ckpt").awaitTermination()
    assert(spark.read.parquet(out).count() === p2.size)
  }

  test("sessionStats merges two open sessions when a late bridging event arrives") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("sessmerge").toString
    val in = s"$root/events"

    def rows(xs: Seq[(Long, String, Double)]) =
      xs.toDF("uid", "t", "v")
        .select(col("uid"), col("t").cast("timestamp").as("ts"), col("v"))

    // batch 1: two events 50 min apart — two separate open sessions
    rows(Seq((1L, "2024-01-01 09:00:00", 1.0), (1L, "2024-01-01 09:50:00", 2.0)))
      .coalesce(1).write.mode("append").parquet(in)
    // batch 2: a bridge at 09:25 (inside the 1h watermark) joins them
    rows(Seq((1L, "2024-01-01 09:25:00", 4.0)))
      .coalesce(1).write.mode("append").parquet(in)
    // batch 3: far-future sentinel closes everything earlier
    rows(Seq((9L, "2024-01-02 12:00:00", 0.0)))
      .coalesce(1).write.mode("append").parquet(in)

    def stream() = SessionStreams.sessionStats(
      CorpusStreams.docStream(spark, in, maxFilesPerTrigger = 1),
      keys = Seq("uid"), tsCol = "ts", value = col("v"))

    val out = s"$root/sessions"
    DerivedStreams.refreshOnce(stream(), out, s"$root/ckpt").awaitTermination()
    DerivedStreams.refreshOnce(stream(), out, s"$root/ckpt").awaitTermination()

    val got = spark.read.parquet(out).filter(col("uid") === 1L)
      .collect().map(r => (r.getTimestamp(1).toString, r.getLong(3), r.getDouble(4)))
    assert(got.toSeq === Seq(("2024-01-01 09:00:00.0", 3L, 7.0)),
      "the bridge must merge both open sessions into ONE emitted row")
  }

  test("funnelProgress equal-ts ties process in stage order, not stage-name order") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("funneltie").toString
    val in = s"$root/events"
    // "click" < "signup" lexicographically — a name-ordered sort would
    // discard the click; stage order must process signup first.
    Seq((1L, 10L, "click"), (1L, 10L, "signup"))
      .toDF("uid", "t", "etype").coalesce(1).write.mode("append").parquet(in)
    val out = s"$root/progress"
    DerivedStreams.refreshOnce(
      SessionStreams.funnelProgress(
        CorpusStreams.docStream(spark, in, maxFilesPerTrigger = 1),
        "uid", "t", "etype", Seq("signup", "click")).toDF(),
      out, s"$root/ckpt").awaitTermination()
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getInt(1), r.getLong(2))).toSet
    assert(got === Set((1, 10L), (2, 10L)),
      "same-instant signup+click must complete both stages")
  }
}
