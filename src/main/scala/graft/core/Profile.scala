package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the `ANALYZE`/column-statistics report every
  * warehouse grows (null rates, cardinalities, value ranges) and every
  * data-quality gate reads before a table feeds a pipeline.
  *
  * Scale shape: ONE scan of the input computes every per-column
  * metric. The exact distinct counts plan through Catalyst's Expand
  * (one fused pass fans each row out per distinct aggregate, partial
  * aggregation map-side), so the input is never re-read per column —
  * at 100 TB the k-column profile costs one read plus a
  * distinct-key-bounded shuffle, not k reads. Swap
  * `approx_count_distinct` in via `exact = false` when cardinalities
  * are web-scale and ±2% is fine (sketch state per column instead of
  * the distinct key space).
  */
object Profile {

  /** Long-format profile: one row per field — total rows, nulls,
    * distinct count, min/max (stringified AFTER the typed min/max, so
    * numeric order is preserved and heterogeneous columns share one
    * output schema).
    *
    * @param fields (name, expression) pairs; an expression may be any
    *   typed column (cast/derived), not just a physical column.
    * @param exact  exact `count_distinct` (DuckDB-replayable) vs
    *   `approx_count_distinct` (HLL sketch, the 10^9-cardinality path)
    */
  def columnProfile(
      df: DataFrame,
      fields: Seq[(String, Column)],
      exact: Boolean = true): DataFrame = {
    require(fields.nonEmpty, "profile at least one field")
    val aggs = fields.zipWithIndex.flatMap { case ((_, c), i) =>
      Seq(
        count(c).as(s"__cnt_$i"),
        (if (exact) count_distinct(c) else approx_count_distinct(c))
          .as(s"__nd_$i"),
        min(c).cast("string").as(s"__min_$i"),
        max(c).cast("string").as(s"__max_$i"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = fields.zipWithIndex.map { case ((name, _), i) =>
      struct(
        lit(name).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$i")).as("n_nulls"),
        col(s"__nd_$i").as("n_distinct"),
        col(s"__min_$i").as("min_s"),
        col(s"__max_$i").as("max_s"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
