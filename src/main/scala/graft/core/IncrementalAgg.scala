package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental (algebraic) aggregate maintenance — the materialized-
  * rollup pattern that makes 100 TB dashboards cheap: history is kept
  * as mergeable per-group PARTIAL states, and each new batch folds in
  * with one delta-sized aggregation + one state-sized merge. The raw
  * history is never re-scanned.
  *
  * The partial state per group is the classic algebraic tuple
  * (count, sum, min, max) with the sum carried as DECIMAL(38,2) of the
  * 2-decimal value — exact and order-independent, so
  * `merge(partials(A), partials(B)) == partials(A ∪ B)` holds
  * bit-for-bit, not just approximately. That equation IS the operator's
  * contract (and its spec): a replayed full recompute and years of
  * folded increments are indistinguishable.
  *
  * Scale shape: `partials` is one hash aggregate over the batch
  * (map-side partial combine, shuffle carries one row per touched
  * group); `merge` is a hash aggregate over state ∪ delta-partials —
  * state-table-sized, never raw-history-sized. With the state stored
  * partitioned by a group-key prefix (e.g. day), merge touches only
  * the partitions the delta's groups land in.
  *
  * Average and other derived measures do NOT live in the state (they
  * are not mergeable); [[finalizeAgg]] computes them from the exact
  * partials at read time.
  */
object IncrementalAgg {

  /** Columns of the mergeable state (beyond the group keys). */
  val stateCols: Seq[String] = Seq("n", "sum_v", "min_v", "max_v")

  /** One mergeable partial row per group over `df`.
    *
    * @param value a 2-decimal double measure (money-like); summed as
    *   DECIMAL(38,2) so the state is exact and merge-order-free.
    */
  def partials(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    // merge/finalizeAgg recover the keys as "everything not named like
    // state" — a group key named n/sum_v/min_v/max_v would be silently
    // aggregated as state downstream, so fail fast here instead.
    require(keys.forall(!stateCols.contains(_)),
      s"group keys ${keys.mkString(",")} collide with reserved state columns ${stateCols.mkString(",")}")
    df.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(value.cast("decimal(38,2)")).as("sum_v"),
        min(value).as("min_v"),
        max(value).as("max_v"))
  }

  /** Fold any number of partial-state frames into one — groups present
    * in several inputs combine exactly; groups in one pass through.
    * Associative and commutative by construction.
    */
  def merge(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge requires at least one state frame")
    val keys = states.head.columns.filterNot(stateCols.contains).toSeq
    states.foreach { s =>
      val k = s.columns.filterNot(stateCols.contains).toSeq
      require(k == keys, s"state key mismatch: $keys vs $k")
    }
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))
  }

  /** Read-time view over a state: exact total (back in 2-decimal
    * double) plus the non-mergeable derived measures.
    */
  def finalizeAgg(state: DataFrame): DataFrame = {
    val keys = state.columns.filterNot(stateCols.contains).toSeq
    state.select(
      keys.map(col) ++ Seq(
        col("n"),
        col("sum_v").cast("double").as("total"),
        // one double division over the exactly-cast total, snapped to
        // the 1e-6 grid — engine-independent (decimal-division scale
        // rules differ across engines; this doesn't)
        (floor(col("sum_v").cast("double") / col("n") * lit(1e6)) / lit(1e6))
          .as("mean"),
        col("min_v"),
        col("max_v")): _*)
  }
}
