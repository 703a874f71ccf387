package graft.core

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cursor-driven incremental processing over a [[VersionLog]] table —
  * the "process only what's new since the last run" orchestration
  * primitive a standing 100 TB corpus is consumed by: each run reads
  * EXACTLY the rows added since the cursor's recorded version (via
  * [[VersionLog.readChanges]] — file-list-diff scan, delta-sized
  * work), hands them to the caller's transform, and advances the
  * cursor only after the transform returns.
  *
  * Delivery contract, stated plainly: AT-LEAST-ONCE. A crash after the
  * transform's effects but before the cursor write reprocesses the
  * same delta on the next run — pair with an idempotent sink (the
  * [[Upsert]] key discipline, [[graft.streaming.AggStreams]]-style
  * markers keyed by the version range, or an overwrite-by-range
  * write) for exactly-once effects. The cursor write itself is
  * tmp+rename, so a reader never sees a torn cursor.
  */
object Incremental {

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The cursor's last processed version, if any. */
  def readCursor(spark: SparkSession, cursorPath: String): Option[Int] = {
    val p = new Path(cursorPath)
    val f = fs(spark, cursorPath)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val bytes =
        try {
          val out = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
          out.toByteArray
        } finally in.close()
      Some(new String(bytes, StandardCharsets.UTF_8).trim.toInt)
    }
  }

  private def writeCursor(spark: SparkSession, cursorPath: String, v: Int): Unit = {
    val p = new Path(cursorPath)
    val f = fs(spark, cursorPath)
    f.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = f.create(tmp, true)
    try out.write(s"$v\n".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // atomic overwrite, never delete-then-rename: a crash between the
    // two would lose the cursor and silently reprocess from scratch
    VersionLog.atomicReplace(spark, tmp, p)
  }

  /** Run one incremental step: apply `process` to the rows added since
    * the cursor (the FULL latest version on the first run), then
    * advance the cursor to the latest version. Returns the
    * `(fromVersion, toVersion)` range processed (`fromVersion` 0 on
    * first run), or None when the cursor is already at the latest
    * version — a no-op, `process` is not called.
    */
  def runOnce(spark: SparkSession, dir: String, cursorPath: String)(
      process: DataFrame => Unit): Option[(Int, Int)] = {
    val latest = VersionLog.latest(spark, dir)
    readCursor(spark, cursorPath) match {
      case Some(v) if v >= latest => None
      case Some(v) =>
        val delta =
          try VersionLog.readChanges(spark, dir, v, latest)
          catch {
            case e: IllegalArgumentException =>
              throw new IllegalArgumentException(
                s"cursor $cursorPath is stuck at source version $v: " +
                  s"${e.getMessage}. A DML version needs a row-level " +
                  "consumer (Incremental.runOnceFeed); a vacuumed " +
                  "source needs an operator decision — reprocess " +
                  "(Incremental.reset + a full run) or skip ahead " +
                  "(Incremental.reset to the latest version).", e)
          }
        process(delta)
        writeCursor(spark, cursorPath, latest)
        Some((v, latest))
      case None =>
        process(VersionLog.readVersion(spark, dir, latest))
        writeCursor(spark, cursorPath, latest)
        Some((0, latest))
    }
  }

  /** [[runOnce]] over the row-level CHANGE FEED: `process` receives
    * inserts AND deletes (tagged `_change_type`/`_commit_version` —
    * see [[VersionLog.readChangeFeed]]), so the consumer survives
    * copy-on-write DELETE/MERGE and restores on its source, not just
    * appends and compactions. Same AT-LEAST-ONCE cursor contract:
    * pair with a sink that applies the signed events idempotently.
    * The first run delivers the full latest version as inserts.
    */
  def runOnceFeed(spark: SparkSession, dir: String, cursorPath: String)(
      process: DataFrame => Unit): Option[(Int, Int)] = {
    import org.apache.spark.sql.functions.lit
    val latest = VersionLog.latest(spark, dir)
    readCursor(spark, cursorPath) match {
      case Some(v) if v >= latest => None
      case Some(v) =>
        process(VersionLog.readChangeFeed(spark, dir, v, latest))
        writeCursor(spark, cursorPath, latest)
        Some((v, latest))
      case None =>
        process(VersionLog.readVersion(spark, dir, latest)
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(latest)))
        writeCursor(spark, cursorPath, latest)
        Some((0, latest))
    }
  }

  /** Explicit cursor override — the OPERATOR-decided recovery when the
    * source history was rewritten past the cursor (see [[runOnce]]'s
    * error): reset to 0 (delete) to reprocess from the latest full
    * version, or pin to a known-processed version to skip ahead. Never
    * called automatically: both directions change delivery semantics.
    */
  def reset(spark: SparkSession, cursorPath: String,
      toVersion: Option[Int]): Unit = toVersion match {
    case Some(v) => writeCursor(spark, cursorPath, v)
    case None =>
      val p = new Path(cursorPath)
      fs(spark, cursorPath).delete(p, false)
      ()
  }
}
