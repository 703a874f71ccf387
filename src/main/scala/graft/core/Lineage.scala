package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage truncation for multi-action operators (the Dataset-API
  * analog of RDD checkpointing, without the disk write).
  *
  * A `persist()` caches DATA but not the PLAN: every later action on a
  * frame derived from the cached one still re-analyzes and re-optimizes
  * the full upstream lineage, and for operators whose input is itself a
  * large composed plan (a multi-version change feed, an iterative
  * generation) that driver-side planning cost recurs per action and
  * can dominate the measured wall time (ProfileQ: wall minus
  * sum-of-job-walls). [[checkpointed]] materializes the frame once as a
  * persisted INTERNAL-row RDD and returns a frame whose logical plan is
  * a flat scan of that RDD — each downstream action plans a leaf, not
  * the tree.
  *
  * INTERNAL rows, not `df.rdd`: the external-Row path decodes and
  * re-encodes every row (plus boxing); persisting the UnsafeRow bytes
  * (copied — the scan reuses row buffers) skips both conversions.
  *
  * Lazy: nothing runs until the first action. The caller owns the
  * release handle (call it in a `finally`); releasing after the last
  * consumer leaves later re-use correct but recomputing, exactly like
  * an unpersisted cache.
  */
object Lineage {

  def checkpointed(df: DataFrame): (DataFrame, () => Unit) = {
    val rdd = df.queryExecution.toRdd.map(_.copy()).persist()
    val out = org.apache.spark.sql.GraftBridge.internalCreateDataFrame(
      df.sparkSession, rdd, df.schema)
    (out, () => { rdd.unpersist(blocking = false); () })
  }
}
