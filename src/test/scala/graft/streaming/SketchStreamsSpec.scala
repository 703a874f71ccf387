package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class SketchStreamsSpec extends SparkSpec {

  private def stream(in: String, statePath: String, capacity: Int, ckpt: String): Unit = {
    val q = SketchStreams.maintain(
      spark.readStream.schema("text string")
        .option("maxFilesPerTrigger", "1").parquet(in),
      col("text"), capacity, statePath)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("exact regime: streamed summary equals batch token counts; replay is idempotent") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("sketchstream").toString
    val in = s"$root/docs"
    Seq("a a b", "b c").toDF("text").coalesce(1).write.mode("append").parquet(in)
    Seq("a c c d", "d a").toDF("text").coalesce(1).write.mode("append").parquet(in)

    stream(in, s"$root/state", capacity = 16, ckpt = s"$root/ckpt")
    val got = SketchStreams.currentSummary(spark, s"$root/state").get
      .orderBy("token").as[(String, Long)].collect().toSeq
    // exact counts: a=4, b=2, c=3, d=2
    assert(got === Seq(("a", 4L), ("b", 2L), ("c", 3L), ("d", 2L)))

    // replay: second AvailableNow pass changes nothing
    val v = SketchStreams.currentVersion(spark, s"$root/state").get
    stream(in, s"$root/state", capacity = 16, ckpt = s"$root/ckpt")
    assert(SketchStreams.currentVersion(spark, s"$root/state").get === v)
  }

  test("reduced regime: bounded size, undercounts never overcount, heavy hitter survives") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("sketchstream2").toString
    val in = s"$root/docs"
    // 'hot' appears 12 times across batches; singletons churn
    Seq("hot hot hot u1 u2", "hot hot u3 u4").toDF("text")
      .coalesce(1).write.mode("append").parquet(in)
    Seq("hot hot hot u5 u6", "hot hot hot hot u7 u8").toDF("text")
      .coalesce(1).write.mode("append").parquet(in)

    stream(in, s"$root/state", capacity = 3, ckpt = s"$root/ckpt")
    val got = SketchStreams.currentSummary(spark, s"$root/state").get
      .as[(String, Long)].collect().toMap
    assert(got.size <= 3, s"state exceeded capacity: $got")
    assert(got.contains("hot"), s"heavy hitter evicted: $got")
    // undercount bound: true 12, N=20, cap+1=4 -> count >= 12 - 20/4
    assert(got("hot") <= 12L && got("hot") >= 7L, s"count out of band: $got")
  }
}
