package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Watermarked stream-stream attribution join: closed-input stream
  * output equals the batch evaluation of the same expression; a
  * left-outer unmatched row is emitted null-extended exactly once,
  * only after the watermark passes its horizon; restarts emit nothing
  * twice.
  */
class JoinStreamsSpec extends SparkSpec {

  private def writeRows(path: String, xs: Seq[(Long, String)], ts: String) = {
    val s = spark
    import s.implicits._
    xs.toDF("ad", "t")
      .select(col("ad"), col("t").cast("timestamp").as(ts))
      .coalesce(1).write.mode("append").parquet(path)
  }

  test("attributionJoin inner: in-horizon clicks only; stream == batch on closed inputs; restart-idempotent") {
    val root = Files.createTempDirectory("joinstream").toString
    val impDir = s"$root/imps"
    val clkDir = s"$root/clicks"
    writeRows(impDir, Seq((1L, "2024-01-01 09:00:00"), (2L, "2024-01-01 09:00:00")), "imp_ts")
    writeRows(clkDir, Seq(
      (1L, "2024-01-01 09:30:00"), // within 1 h of imp 1 — the match
      (1L, "2024-01-01 11:00:00"), // past the horizon
      (2L, "2024-01-01 08:30:00"), // before the impression
      (3L, "2024-01-01 09:10:00")), "click_ts") // no impression at all

    def stream() = JoinStreams.attributionJoin(
      CorpusStreams.docStream(spark, impDir, maxFilesPerTrigger = 1),
      CorpusStreams.docStream(spark, clkDir, maxFilesPerTrigger = 1),
      key = "ad", leftTs = "imp_ts", rightTs = "click_ts",
      within = "1 hour", watermark = "2 hours")

    val out = s"$root/attributed"
    DerivedStreams.refreshOnce(stream(), out, s"$root/ckpt").awaitTermination()
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString))
      .toSet
    assert(got === Set((1L, "2024-01-01 09:00:00.0", "2024-01-01 09:30:00.0")))

    // the SAME expression on static frames
    val batch = JoinStreams.attributionJoin(
      spark.read.parquet(impDir), spark.read.parquet(clkDir),
      key = "ad", leftTs = "imp_ts", rightTs = "click_ts",
      within = "1 hour", watermark = "2 hours")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString))
      .toSet
    assert(batch === got)

    // restart with no new input emits nothing twice
    DerivedStreams.refreshOnce(stream(), out, s"$root/ckpt").awaitTermination()
    assert(spark.read.parquet(out).count() === 1L)
  }

  test("attributionJoin left_outer: unmatched impression emitted null-extended exactly once, only after the horizon closes") {
    val root = Files.createTempDirectory("joinstream2").toString
    val impDir = s"$root/imps"
    val clkDir = s"$root/clicks"
    writeRows(impDir, Seq((1L, "2024-01-01 09:00:00"), (2L, "2024-01-01 09:00:00")), "imp_ts")
    writeRows(clkDir, Seq((1L, "2024-01-01 09:30:00")), "click_ts")

    def stream() = JoinStreams.attributionJoin(
      CorpusStreams.docStream(spark, impDir, maxFilesPerTrigger = 1),
      CorpusStreams.docStream(spark, clkDir, maxFilesPerTrigger = 1),
      key = "ad", leftTs = "imp_ts", rightTs = "click_ts",
      within = "1 hour", watermark = "2 hours", joinType = "left_outer")

    val out = s"$root/attributed"
    DerivedStreams.refreshOnce(stream(), out, s"$root/ckpt").awaitTermination()
    def rows() = spark.read.parquet(out)
      .filter(col("ad") < 9)
      .collect()
      .map(r => (r.getLong(0),
        Option(r.getTimestamp(2)).map(_.toString).getOrElse("NONE")))
      .toSet
    // watermark hasn't passed imp2 + horizon yet: the match is out,
    // the unmatched impression is still held in state
    assert(rows() === Set((1L, "2024-01-01 09:30:00.0")))

    // advance BOTH watermarks (global watermark = min) past the
    // horizon, then one more batch so the new watermark takes effect
    writeRows(impDir, Seq((9L, "2024-01-02 12:00:00")), "imp_ts")
    writeRows(clkDir, Seq((9L, "2024-01-02 12:00:00")), "click_ts")
    DerivedStreams.refreshOnce(stream(), out, s"$root/ckpt").awaitTermination()
    writeRows(impDir, Seq((9L, "2024-01-02 13:00:00")), "imp_ts")
    writeRows(clkDir, Seq((9L, "2024-01-02 13:00:00")), "click_ts")
    DerivedStreams.refreshOnce(stream(), out, s"$root/ckpt").awaitTermination()

    assert(rows() === Set(
      (1L, "2024-01-01 09:30:00.0"),
      (2L, "NONE")))

    // and exactly once: a further restart adds nothing
    writeRows(impDir, Seq((9L, "2024-01-02 14:00:00")), "imp_ts")
    writeRows(clkDir, Seq((9L, "2024-01-02 14:00:00")), "click_ts")
    DerivedStreams.refreshOnce(stream(), out, s"$root/ckpt").awaitTermination()
    assert(rows().count(_._1 == 2L) === 1)
  }
}
