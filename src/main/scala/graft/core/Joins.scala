package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse ANY JOIN semantics (reference:
  * /root/reference/operations/internal_transactions.py:411-418,
  * examples/sql_balances/balances.sql:18-35): a join that takes at most
  * ONE matching right row per key — i.e. it never multiplies the left
  * side.
  *
  * Spark's joins multiply on duplicate right keys, so ANY JOIN is
  * modeled as "dedup the right side on the join keys, then join".
  * ClickHouse picks an arbitrary right row; for oracle-reproducible
  * results we pick a deterministic one via `tiebreak` ordering.
  */
object Joins {

  /** Keep the first row per key ordered by `order` ascending —
    * deterministic dedup.
    *
    * Implemented as `min(struct(order..., row))`, NOT a row_number
    * window: a hash aggregate combines partially map-side (one
    * candidate row per key per partition crosses the shuffle) and
    * needs no sort, where the window shuffles EVERY row and sorts each
    * partition — the difference between O(rows) shuffle and O(keys) at
    * 100 TB. Struct comparison is field-lexicographic with null
    * smallest, matching the window's asc-nulls-first; ties on `order`
    * fall through to the full row, so the pick is always deterministic.
    */
  def firstByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    pickByKey(df, keys, order, min)

  /** Same single-pass shape, greatest `order` wins (desc-nulls-last
    * analog: null order fields compare smallest, so max prefers
    * non-null versions).
    */
  def lastByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    pickByKey(df, keys, order, max)

  private def pickByKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
      pick: Column => Column): DataFrame = {
    val orderNames = order.map(_.toString)
    if (orderNames.forall(df.columns.contains)) {
      // Tiebreaks are plain row columns: pack them as the comparison
      // prefix and append only the REMAINING columns — keys ride the
      // groupBy and nothing crosses the shuffle twice. (The all-columns
      // fallback below ships every order column AND the full row; for a
      // tiebreak covering most of a table that doubles shuffle bytes.)
      val rest = df.columns.filterNot(c => keys.contains(c) || orderNames.contains(c))
      val packed = struct((orderNames ++ rest).distinct.map(col): _*)
      df.groupBy(keys.map(col): _*)
        .agg(pick(packed).as("__m"))
        .select(df.columns.toIndexedSeq.map(c =>
          if (keys.contains(c)) col(c) else col(s"__m.$c").as(c)): _*)
    } else {
      // Expression tiebreaks: carry them alongside the packed full row.
      val row = struct(df.columns.toIndexedSeq.map(col): _*).as("__row")
      val packed = struct(order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } :+ row: _*)
      df.groupBy(keys.map(col): _*)
        .agg(pick(packed).as("__m"))
        .select(col("__m.__row.*"))
    }
  }

  /** `left ANY [joinType] JOIN right USING keys`.
    *
    * @param tiebreak columns ordering the right side; the FIRST row in
    *                 this order wins. Empty = "any row" (cheapest:
    *                 map-side combine via dropDuplicates, but
    *                 nondeterministic — only for keys known unique).
    * @param broadcastRight hint when the deduped right side is small
    *                 (dimension-table pattern) so the join needs no
    *                 shuffle of the big left side.
    */
  def anyJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      joinType: String = "left",
      tiebreak: Seq[Column] = Seq.empty,
      broadcastRight: Boolean = false): DataFrame = {
    val deduped =
      if (tiebreak.isEmpty) right.dropDuplicates(keys)
      else firstByKey(right, keys, tiebreak)
    val r = if (broadcastRight) broadcast(deduped) else deduped
    left.join(r, keys, joinType)
  }
}
