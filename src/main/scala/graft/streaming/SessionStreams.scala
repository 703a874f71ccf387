package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Streaming sessionization: the engine-managed session-window state
  * (`session_window`) instead of the batch lag+running-sum pass
  * ([[graft.core.Sessions]]) — windows merge as events arrive and
  * close when the watermark passes their end, so a 24/7 clickstream
  * keeps a bounded state store (open sessions only) instead of
  * re-scanning the timeline each refresh.
  *
  * Boundary semantics vs the batch operator: `session_window` extends a
  * session `gap` AFTER each event with an EXCLUSIVE end, so two events
  * exactly `gap` apart fall in different sessions, where
  * `Sessions.sessionize` splits only on strictly-greater-than-gap.
  * Equal semantics everywhere else; pick one convention per pipeline.
  *
  * The same expression plans on a static frame (Spark evaluates
  * `session_window` in batch too) — the spec pins stream == batch row
  * for row on the closed sessions.
  */
object SessionStreams {

  /** Per-(keys, session) rollup in append mode. `value` is summed
    * through DECIMAL(18,2) (the exact-money convention used by the
    * batch rollup, so stream and batch agree bit-for-bit).
    */
  def sessionStats(
      events: DataFrame,
      keys: Seq[String],
      tsCol: String,
      value: Column,
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    require(events.schema(tsCol).dataType == TimestampType,
      s"sessionStats needs a TimestampType event-time column; " +
        s"'$tsCol' is ${events.schema(tsCol).dataType.simpleString}")
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_events"),
        sum(value.cast("decimal(18,2)")).cast("double").as("sum_v"))
      .select(keys.map(col) ++ Seq(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_v")): _*)
  }
}
