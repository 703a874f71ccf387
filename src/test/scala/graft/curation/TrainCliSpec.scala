package graft.curation

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end command flow over parquet directories: dedup → decontam
  * → redact → shards, each stage a rerunnable overwrite.
  */
class TrainCliSpec extends SparkSpec {

  test("the command chain runs end-to-end on parquet dirs and is rerun-safe") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("traincli").toString
    val cli = new TrainCli(spark)

    Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "web"),
      (2L, "the quick brown fox jumps over the lazy dog", "web"), // exact dup
      (3L, "call me at 415-555-0042 about spark engines today", "web"),
      (4L, "held out benchmark sentence that must never train here", "wiki"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$root/docs")
    Seq((9L, "held out benchmark sentence that must never train here"))
      .toDF("pid", "text").write.parquet(s"$root/probes")

    assert(cli.dedup(s"$root/docs", s"$root/d1") === 3L) // dup 2 dropped
    assert(cli.decontam(s"$root/d1", s"$root/probes", s"$root/d2",
      n = 3, minShared = 2) === 2L) // doc 4 dropped
    assert(cli.redact(s"$root/d2", s"$root/d3") === 2L)
    val redacted = spark.read.parquet(s"$root/d3")
      .filter(col("doc_id") === 3L).head().getAs[String]("text")
    assert(redacted.contains("<PHONE>") && !redacted.contains("415-555"))
    assert(cli.shards(s"$root/d3", s"$root/out", numShards = 2) === 2L)
    // rerun-safe: same command, same output
    assert(cli.shards(s"$root/d3", s"$root/out", numShards = 2) === 2L)
  }
}
