package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range-predicate builder (reference: `make_range_query`,
  * /root/reference/utils.py:32-66): turns a list of half-open ranges
  * into one boolean Column `(f >= a AND f < b) OR (f >= c) OR ...`.
  *
  * Emitted as a plain Catalyst expression tree so parquet row-group
  * pruning and partition pruning both see it.
  */
object Ranges {

  /** One range: [bottom, upper). `None` bounds are open; both-None means
    * `f IS NOT NULL` (matching the reference's fallback, utils.py:65).
    */
  def rangePredicate(field: Column, bottom: Option[Long], upper: Option[Long]): Column =
    (bottom, upper) match {
      case (Some(a), Some(b)) => field >= a && field < b
      case (Some(a), None)    => field >= a
      case (None, Some(b))    => field < b
      case (None, None)       => field.isNotNull
    }

  /** OR-of-ranges over the same field. */
  def rangesPredicate(field: Column, ranges: Seq[(Option[Long], Option[Long])]): Column = {
    require(ranges.nonEmpty, "at least one range required")
    ranges.map { case (a, b) => rangePredicate(field, a, b) }.reduce(_ || _)
  }

  /** Bucketized INTERVAL JOIN: points `pointCol` ∈ [loCol, hiCol) —
    * the scale-safe form of a range-condition join. Spark plans a raw
    * `p >= lo AND p < hi` join as BroadcastNestedLoop (or a per-key
    * cartesian with equi-keys), which is quadratic on hot keys; here
    * each interval is exploded to the fixed-width buckets it covers
    * and each point to its one bucket, so the join is a plain hash
    * join on (keys, bucket) with a residual range filter. Interval
    * copies fan out by ceil(width / bucket) — pick `bucket` near the
    * typical interval width so the blow-up is a small constant.
    *
    * Inner join only: an unmatched interval would surface once per
    * bucket copy under outer semantics — aggregate or anti-join on the
    * result instead. Domain must be non-negative (epochs, block
    * numbers): `div` truncates toward zero, which is floor only there.
    */
  def intervalJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bucket: Long,
      keys: Seq[String] = Seq.empty): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    // `div` needs SQL text; backtick-quote the spliced names so
    // "window start", "a-b", or "p.x" resolve as columns, not
    // expressions — and use the SAME quoted references in the residual
    // filter, where a bare col("p.x") would parse as field access.
    Seq(pointCol, loCol, hiCol).foreach(c =>
      require(!c.contains("`"), s"backticks unsupported in column name '$c'"))
    def q(c: String) = s"`$c`"
    // one bucket name free in BOTH frames (it is the join key)
    val taken = (points.columns ++ intervals.columns).toSet
    var b = "__b"
    while (taken.contains(b)) b += "_"
    val iv = intervals.filter(expr(s"${q(hiCol)} > ${q(loCol)}"))
      .withColumn(b,
        explode(sequence(
          expr(s"${q(loCol)} div ${bucket}L"),
          expr(s"(${q(hiCol)} - 1) div ${bucket}L"))))
    val pt = points.withColumn(b, expr(s"${q(pointCol)} div ${bucket}L"))
    iv.join(pt, keys :+ b)
      .filter(expr(s"${q(pointCol)} >= ${q(loCol)} AND ${q(pointCol)} < ${q(hiCol)}"))
      .drop(b)
  }

  /** Merge overlapping-or-touching intervals per key (the
    * gaps-and-islands coverage operator: uptime spans from heartbeat
    * leases, attention spans from activity windows, coverage from
    * range scans). An interval starts a new island iff its start lies
    * strictly past the running max end of everything before it; island
    * members then aggregate to one merged span.
    *
    * Scale shape: ONE (keys, start) sort carries both windows (the
    * running max and the island running sum share the partitioning and
    * order), then one hash aggregate per island — no self-join, no
    * interval explosion. Output: keys, span_start, span_end, n_merged.
    */
  def coalesceIntervals(
      df: DataFrame,
      keys: Seq[String],
      loCol: String,
      hiCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(loCol), col(hiCol))
    val prevMax = max(col(hiCol)).over(
      w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    val run = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__new_island",
        when(prevMax.isNull || col(loCol) > prevMax, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new_island")).over(run))
      .groupBy((keys.map(col) :+ col("__island")): _*)
      .agg(
        min(col(loCol)).as("span_start"),
        max(col(hiCol)).as("span_end"),
        count(lit(1)).as("n_merged"))
      .drop("__island")
  }
}
