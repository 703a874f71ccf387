package graft.core

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketed-layout contract: a big⋈big join over two tables
  * written with the same bucket spec plans with NO shuffle on either
  * side — the write-once/join-many trade that replaces per-query
  * repartitioning at scale.
  */
class BucketingSpec extends SparkSpec {

  test("same-spec bucketed tables join without an exchange; results match the plain join") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("bucketing").toString
    val left = (1L to 500L).map(i => (i % 97, i, s"l$i")).toDF("k", "lv", "ltag")
    val right = (1L to 300L).map(i => (i % 97, s"r$i")).toDF("k", "rtag")

    Bucketing.writeBucketed(left, "bkt_left", s"$root/left", Seq("k"), numBuckets = 8)
    Bucketing.writeBucketed(right, "bkt_right", s"$root/right", Seq("k"), numBuckets = 8)
    try {
      val joined = Bucketing.bucketedJoin(spark, "bkt_left", "bkt_right", Seq("k"))
      // disable the broadcast path so the assertion exercises the
      // bucketed sort-merge plan a big⋈big join would take
      val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val p = joined.queryExecution.executedPlan.toString
        assert(!p.contains("Exchange"),
          s"bucketed join still shuffles:\n$p")
        assert(joined.count() ===
          left.join(right, Seq("k")).count(), "bucketed join changed the result")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
