package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

import graft.core.IncrementalAgg

/** Streaming maintenance of an incremental aggregate state — the 24/7
  * form of [[graft.core.IncrementalAgg]] (q160): each micro-batch
  * folds into the persisted per-group partials with one delta-sized
  * aggregation + one state-sized merge; raw history is never
  * re-scanned. The serving read is [[currentState]] (optionally
  * through `IncrementalAgg.finalizeAgg`).
  *
  * Exactly-once across restarts and foreachBatch replays: state is
  * written to VERSIONED directories (`v=batchId`) and a commit marker
  * lands only after the write; readers take the highest COMMITTED
  * version, and a replayed batch whose marker exists is skipped.
  * A crash between write and marker leaves an orphan version that is
  * simply never read and gets rewritten by the replay — the same
  * marker discipline as CorpusStreams.ingestBatch.
  *
  * Scale note: each version rewrites the full (group-count-sized)
  * state — the right trade while state ≪ raw history, which is the
  * premise of the pattern; partition the state path by a group-key
  * prefix when the group count itself gets large.
  */
object AggStreams {

  private def commitDir(statePath: String) = s"$statePath/_commits"

  /** Highest committed state version, if any. */
  def currentVersion(spark: SparkSession, statePath: String): Option[Long] = {
    val dir = new org.apache.hadoop.fs.Path(commitDir(statePath))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) None
    else {
      // strict v<digits> match: a stray non-numeric entry (editor
      // backup, copy artifact) must not crash every state read.
      val vs = fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.matches("v\\d+")).map(_.drop(1).toLong)
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** The latest committed state (mergeable partials per group). */
  def currentState(spark: SparkSession, statePath: String): Option[DataFrame] =
    currentVersion(spark, statePath)
      .map(v => spark.read.parquet(s"$statePath/v=$v"))

  /** Fold one micro-batch into the state (idempotent per batchId). */
  def maintainBatch(
      batch: DataFrame, batchId: Long,
      keys: Seq[String], value: Column,
      statePath: String): Unit = {
    val spark = batch.sparkSession
    val marker = new org.apache.hadoop.fs.Path(s"${commitDir(statePath)}/v$batchId")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(marker)) return
    val delta = IncrementalAgg.partials(batch, keys, value)
    val merged = currentState(spark, statePath) match {
      case Some(st) => IncrementalAgg.merge(st, delta)
      case None => delta
    }
    merged.write.mode("overwrite").parquet(s"$statePath/v=$batchId")
    fs.mkdirs(marker.getParent)
    fs.create(marker, false).close()
  }

  /** Streaming writer maintaining the state; caller picks trigger +
    * checkpoint and starts it.
    */
  def maintain(
      stream: DataFrame,
      keys: Seq[String], value: Column,
      statePath: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        maintainBatch(batch, batchId, keys, value, statePath)
    }
}
