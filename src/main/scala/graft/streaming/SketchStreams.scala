package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming heavy-hitters maintenance — the 24/7 "trending tokens"
  * monitor: each micro-batch's token counts fold into a persisted
  * Misra–Gries summary of at most `capacity` counters. Folding is the
  * mergeable-summaries reduction (Agarwal et al., PODS'12) spelled in
  * DataFrame algebra: union counts, per-token sum, subtract the
  * (capacity+1)-th largest, evict non-positive — so the maintained
  * state carries the same guarantee as the batch `misra_gries`
  * aggregate: every reported count undercounts by at most
  * N/(capacity+1) and NEVER overcounts; with capacity ≥ |distinct|
  * the state is the exact count table.
  *
  * State is versioned-dir + commit-marker (the AggStreams discipline)
  * — exactly-once across foreachBatch replays; state size is bounded
  * by `capacity` rows regardless of stream length.
  */
object SketchStreams {

  private def commitDir(statePath: String) = s"$statePath/_commits"

  def currentVersion(spark: SparkSession, statePath: String): Option[Long] = {
    val dir = new org.apache.hadoop.fs.Path(commitDir(statePath))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) None
    else {
      val vs = fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.matches("v\\d+")).map(_.drop(1).toLong)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** The maintained summary: (token, c), at most `capacity` rows. */
  def currentSummary(spark: SparkSession, statePath: String): Option[DataFrame] =
    currentVersion(spark, statePath)
      .map(v => spark.read.parquet(s"$statePath/v=$v"))

  /** Misra–Gries reduction over a (token, c) frame: keep at most
    * `capacity` counters, uniform-subtract the overflow. One rank
    * window over a state-sized (not stream-sized) frame.
    */
  private[streaming] def reduceSummary(counts: DataFrame, capacity: Int): DataFrame = {
    // zeroKey: same single-partition evaluation the frame needs (it is
    // state-sized by construction) without WindowExec's no-partition
    // WARN polluting the bench/driver output tail.
    val w = Window.partitionBy(graft.core.Windows.zeroKey(col("token")))
      .orderBy(col("c").desc, col("token"))
    val ranked = counts.withColumn("__rk", row_number().over(w))
    val sub = ranked.agg(
      coalesce(max(when(col("__rk") === capacity + 1, col("c"))), lit(0L))
        .as("__sub"))
    ranked.crossJoin(broadcast(sub))
      .filter(col("c") - col("__sub") > 0)
      .select(col("token"), (col("c") - col("__sub")).as("c"))
  }

  /** Fold one micro-batch of text into the summary (idempotent per
    * batchId).
    */
  def maintainBatch(
      batch: DataFrame, batchId: Long,
      text: Column, capacity: Int,
      statePath: String): Unit = {
    val spark = batch.sparkSession
    val marker = new org.apache.hadoop.fs.Path(s"${commitDir(statePath)}/v$batchId")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) return
    // batch side summarized by the NATIVE mergeable misra_gries
    // aggregate (distributed, capacity-bounded partials) — the merge
    // frame below is then ≤ 2·capacity rows, never batch-vocab-sized
    val counts = batch
      .select(explode(graft.text.TextFunctions.tokens(text)).as("token"))
      .agg(graft.functions.AggregateFunctions
        .heavyHitters(col("token"), capacity).as("__hh"))
      .select(explode(col("__hh")).as("__e"))
      .select(col("__e.token").as("token"), col("__e.c").as("c"))
    val merged = currentSummary(spark, statePath) match {
      case Some(st) => st.unionByName(counts)
        .groupBy(col("token")).agg(sum(col("c")).as("c"))
      case None => counts
    }
    reduceSummary(merged, capacity)
      .write.mode("overwrite").parquet(s"$statePath/v=$batchId")
    fs.mkdirs(marker.getParent)
    fs.create(marker, false).close()
  }

  /** Streaming writer maintaining the summary. */
  def maintain(
      stream: DataFrame,
      text: Column, capacity: Int,
      statePath: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        maintainBatch(batch, batchId, text, capacity, statePath)
    }
}
