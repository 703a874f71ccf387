package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Multi-dimensional data layout via Z-ordering — the file-skipping
  * lever for 100 TB scans filtered on MORE THAN ONE column. A table
  * sorted on `a` prunes scans on `a` but not on `b`; writing in
  * Z-curve order of (a, b) gives every file a TIGHT bounding box in
  * BOTH dimensions, so parquet min/max stats prune scans on either
  * (or both) — the same mechanism behind Delta's OPTIMIZE ZORDER and
  * ClickHouse's `ORDER BY (a, b)` hierarchical index, expressed as a
  * plain Spark sort.
  *
  * Mechanics: [[zValue]] Morton-interleaves the low 31 bits of two
  * dimension keys (a codegen'd Catalyst expression — see
  * [[graft.functions.ZInterleave]]); [[writeZOrdered]] range-
  * partitions on that key and sorts within partitions, so each output
  * file covers one compact Z-range = one small (a, b) box. No shuffle
  * beyond the one range exchange the sort itself needs; nothing
  * driver-sized.
  *
  * Dimensions wider than 31 bits should be bucketed first (e.g.
  * `unix_micros(ts) div 60000000` for minutes) — layout keys need
  * locality, not full resolution.
  */
object Layout {

  /** Z-curve layout key of two int64 dimension keys (31 bits each). */
  def zValue(x: Column, y: Column): Column =
    GraftFunctions.z_interleave(x, y)

  /** Write `df` parquet at `path` clustered into `files` Z-ordered
    * files on (x, y). The layout key is dropped from the data — it is
    * re-derivable, the point is only WHERE rows landed.
    */
  def writeZOrdered(
      df: DataFrame, path: String, x: Column, y: Column, files: Int): Unit =
    df.withColumn("_zv", zValue(x, y))
      .repartitionByRange(files, col("_zv"))
      .sortWithinPartitions(col("_zv"))
      .drop("_zv")
      .write.mode("overwrite").parquet(path)

  /** Per-file bounding boxes of two dimension columns over a written
    * table — the pruning diagnostic: a file whose [min, max] box
    * misses the predicate box is skipped by parquet stats. One scan +
    * one aggregate keyed by file identity.
    */
  def fileBoxes(
      spark: SparkSession, path: String, x: String, y: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(
        count(lit(1)).as("n"),
        min(col(x)).as("x_min"), max(col(x)).as("x_max"),
        min(col(y)).as("y_min"), max(col(y)).as("y_max"))

  /** How many files a (x in [x0,x1]) AND (y in [y0,y1]) box predicate
    * must read under this layout (bounding-box intersection count).
    */
  def filesTouched(
      boxes: DataFrame, x0: Long, x1: Long, y0: Long, y1: Long): Long =
    boxes.filter(
      col("x_max") >= x0 && col("x_min") <= x1 &&
        col("y_max") >= y0 && col("y_min") <= y1)
      .count()
}
