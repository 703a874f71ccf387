package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    * deterministic dedup. One hash shuffle on `keys`; Spark's window
    * exec sorts within partitions only, no global sort.
    */
  def firstByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
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
