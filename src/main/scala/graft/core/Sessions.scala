package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: split each key's event stream into
  * sessions wherever consecutive events are further apart than
  * `gap`. The classic clickstream/telemetry operator, expressed as two
  * window functions over ONE partitioning — a single shuffle+sort of
  * the events, no self-join:
  *
  *   new_session = (ts - lag(ts)) > gap  OR  first row of key
  *   session_id  = running sum of new_session      (1-based per key)
  *
  * Both windows share (PARTITION BY keys ORDER BY ts, order…), so
  * Catalyst plans one Exchange + one Sort; the lag frame and the
  * running-sum frame are evaluated in the same pass over each
  * partition. At 100 TB this scales like any keyed shuffle — skew
  * follows the key distribution (one device spamming events lands on
  * one task), which is inherent to the operator's semantics: a key's
  * session numbering is a sequential scan of that key's timeline.
  */
object Sessions {

  /** Adds `session_id` (1-based per key) — a RESERVED output name: an
    * input column called session_id is replaced. `ts` must be an exact
    * integer clock (e.g. `unix_micros(timestamp)`) so gap arithmetic is
    * bit-deterministic across engines; `order` breaks equal-ts ties
    * (pass a unique id for reproducible numbering).
    */
  def sessionize(
      df: DataFrame,
      keys: Seq[String],
      ts: Column,
      order: Seq[Column],
      gap: Long): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ts +: order: _*)
    val prev = lag(ts, 1).over(w)
    val newSession = when(prev.isNull || ts - prev > gap, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: event count, first/last event clock, exact
    * DECIMAL-summed value. One aggregate over the sessionized frame;
    * the (keys, session_id) groupBy is already co-located by the
    * sessionize exchange, and map-side combine keeps the second
    * shuffle at one row per session.
    */
  def sessionStats(
      df: DataFrame,
      keys: Seq[String],
      ts: Column,
      order: Seq[Column],
      gap: Long,
      value: Column): DataFrame = {
    val t = Names.fresh(df, "__t")
    sessionize(df.withColumn(t, ts), keys, col(t), order, gap)
      .groupBy((keys :+ "session_id").map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        min(col(t)).as("t_start"),
        max(col(t)).as("t_end"),
        sum(value.cast("decimal(18,2)")).cast("double").as("sum_v"))
  }
}
