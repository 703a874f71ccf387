package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Partition-parallel EXACT global ranking — the distributed
  * replacement for `row_number()/ntile(k) OVER (ORDER BY …)`, whose
  * empty partition spec funnels the whole input through ONE task
  * (Spark's own `WARN WindowExec: No Partition Defined` names the
  * hazard; at cluster scale the full table sorts on a single
  * executor).
  *
  * Shape: (1) one small aggregate collects ~`buckets` range-boundary
  * values of the primary sort column (`percentile_approx` — the
  * boundary QUALITY only affects load balance, never the result);
  * (2) every row gets a bucket map-side by comparing against the
  * boundary LITERALS (monotone in the sort order, so bucket order
  * refines global order); (3) one tiny per-bucket count aggregate
  * (≤ `buckets` rows) turns into broadcast rank offsets; (4) a
  * `row_number` window PARTITIONED by bucket — every partition sorts
  * in parallel — plus its bucket's offset is the exact global rank.
  *
  * Because the bucket is a pure function of the row against fixed
  * literals (never `spark_partition_id()`), recomputation is safe and
  * nothing needs to be persisted for correctness; callers with an
  * expensive upstream may persist it to avoid the two extra passes.
  */
object GlobalRanks {

  /** Adds exact 1-based global row numbers as `out` under the total
    * order (`rangeCol` asc/desc, then `tieBreak` asc). `rangeCol`
    * must be numeric (it feeds `percentile_approx`); `tieBreak` must
    * make the order total or numbering is nondeterministic. Returns
    * the numbered frame plus the total row count (already known from
    * the offset pass — no extra job).
    */
  def withGlobalRowNumber(
      df: DataFrame,
      rangeCol: Column,
      descending: Boolean,
      tieBreak: Seq[Column],
      out: String,
      buckets: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val nb = if (buckets > 0) buckets
    else math.max(1, spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    // ~boundaries per bucket at modest sketch accuracy: balance is all
    // that's at stake. NULL result (empty input) → one bucket.
    val bounds0 = df
      .select(percentile_approx(rangeCol.cast("double"),
        array((1 until nb).map(i => lit(i.toDouble / nb)): _*),
        lit(10000)).as("b"))
      .first().getAs[scala.collection.Seq[Any]]("b")
    val bounds =
      if (bounds0 == null) Array.empty[Double]
      else bounds0.collect { case d: java.lang.Double => d.doubleValue() }
        .distinct.sorted.toArray
    // bucket = |{boundary beyond this row in sort direction}|: monotone
    // non-decreasing along the sort order in either direction.
    // NOTE for callers (measured on q167): CollapseProject inlines
    // rangeCol's FULL expression into every boundary comparison below
    // (plus the counts pass and the window order) — an expensive range
    // expression (an interpreted higher-order aggregate, a scoring
    // pipeline) is then re-evaluated ~`buckets`+2 times per row
    // (169 CPU-seconds in one q167 stage). Persist the input with the
    // range value MATERIALIZED as a plain column first; comparisons
    // against a cached double are codegen-cheap.
    val b = col("_grk_b")
    val bucketExpr = bounds.foldLeft(lit(0)) { (acc, bd) =>
      val beyond =
        if (descending) lit(bd) > rangeCol.cast("double")
        else lit(bd) < rangeCol.cast("double")
      acc + when(beyond, 1).otherwise(0)
    }
    val withB = df.withColumn("_grk_b", bucketExpr)
    val counts = withB.groupBy(b).agg(count(lit(1)).as("_c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = counts.valuesIterator.sum
    val offsets = (0 to bounds.length).scanLeft(0L) { (acc, i) =>
      acc + counts.getOrElse(i, 0L)
    }
    val offsetExpr = element_at(
      map_from_arrays(
        array((0 to bounds.length).map(lit): _*),
        array(offsets.take(bounds.length + 1).map(lit): _*)),
      b)
    val order = (if (descending) rangeCol.desc else rangeCol.asc) +:
      tieBreak.map(_.asc)
    val w = Window.partitionBy(b).orderBy(order: _*)
    val numbered = withB
      .withColumn(out, row_number().over(w).cast("long") + offsetExpr)
      .drop("_grk_b")
    (numbered, total)
  }

  /** Exact `ntile(k)` over the global (`rangeCol`, `tieBreak`) order,
    * partition-parallel: first `total % k` tiles hold
    * `total / k + 1` rows, the rest `total / k` — bit-identical to
    * the single-partition window's buckets, computed from the exact
    * global rank in closed form.
    */
  def ntileExact(
      df: DataFrame,
      k: Int,
      rangeCol: Column,
      descending: Boolean,
      tieBreak: Seq[Column],
      out: String,
      buckets: Int = 0): DataFrame = {
    require(k >= 1, s"ntile requires k >= 1, got $k")
    val rn = col("_grk_rn")
    val (numbered, total) =
      withGlobalRowNumber(df, rangeCol, descending, tieBreak, "_grk_rn", buckets)
    val base = total / k
    val rem = total % k
    val headRows = rem * (base + 1)
    val tile =
      if (base == 0L) (rn - 1L) / (base + 1L) + 1L
      else when(rn <= headRows, (rn - 1L) / (base + 1L) + 1L)
        .otherwise(lit(rem) + (rn - headRows - 1L) / base + 1L)
    numbered.withColumn(out, tile.cast("long")).drop("_grk_rn")
  }
}
