package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) maintenance. [[buildScd2]] turns
  * an event log into validity intervals (the q93 shape); [[mergeScd2]]
  * folds a NEW batch of events into an existing dimension without
  * re-reading history — the warehouse-scale story: the dimension is
  * maintained from deltas, and `mergeScd2(buildScd2(history), delta)
  * == buildScd2(history ∪ delta)` EXACTLY as long as the split
  * respects event-time order (nothing in the delta precedes anything
  * in the history). That equation is the operator's contract and its
  * spec.
  *
  * Scale shape: the merge change-detects only the DELTA (one per-key
  * window over delta-sized data), joins the dimension's OPEN rows
  * (one row per live key — dimension-sized, not history-sized) as the
  * boundary state, and unions three frames. History rows are never
  * touched except the open ones being closed.
  *
  * Input events need (key, orderCol, tsCol, stateCol); ties at one
  * timestamp break on orderCol, so the ordering is total and both
  * engines replay it identically.
  */
object Scd {

  /** Event log → SCD2 intervals: (key, state, valid_from, valid_to),
    * null valid_to = current.
    */
  def buildScd2(
      events: DataFrame,
      key: String, order: String, ts: String, state: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(order))
    val changes = events
      .select(col(key), col(order), col(ts), col(state))
      .withColumn("__prev", lag(col(state), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(state))
    changes
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .select(col(key), col(state), col(ts).as("valid_from"), col("valid_to"))
  }

  /** Fold `delta` (events strictly at-or-after everything already in
    * the dimension) into `dim`: closed rows pass through, each key's
    * open row closes at the key's first delta CHANGE (stays open if
    * the delta only repeats the current state), and the delta's own
    * change chain appends.
    */
  def mergeScd2(
      dim: DataFrame,
      delta: DataFrame,
      key: String, order: String, ts: String, state: String): DataFrame = {
    val closed = dim.filter(col("valid_to").isNotNull)
    val open = dim.filter(col("valid_to").isNull)
      .select(col(key), col(state).as("__cur"), col("valid_from").as("__from"))
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(order))
    val dchanges = delta
      .select(col(key), col(order), col(ts), col(state))
      .join(open.select(col(key), col("__cur")), Seq(key), "left")
      .withColumn("__prev", coalesce(lag(col(state), 1).over(w), col("__cur")))
      .filter(col("__prev").isNull || col("__prev") =!= col(state))
    val newRows = dchanges
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .select(col(key), col(state), col(ts).as("valid_from"), col("valid_to"))
    val firstChange = dchanges
      .groupBy(col(key)).agg(min(col(ts)).as("__close_at"))
    val updatedOpen = open
      .join(firstChange, Seq(key), "left")
      .select(col(key), col("__cur").as(state),
        col("__from").as("valid_from"), col("__close_at").as("valid_to"))
    closed
      .select(col(key), col(state), col("valid_from"), col("valid_to"))
      .unionByName(updatedOpen)
      .unionByName(newRows)
  }
}
