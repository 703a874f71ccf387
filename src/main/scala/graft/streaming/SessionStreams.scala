package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.TimestampType

/** A funnel-stage advance for one key: `stage` is 1-based, `t` the
  * exact-integer clock of the event that completed it.
  */
case class FunnelProgress(key: Long, stage: Int, t: Long)

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

  /** Streaming funnel: the [[graft.core.Funnels.stageTimes]] state
    * machine as `flatMapGroupsWithState` — per-key state is one long
    * per stage (first completion clock), emitted as an append-safe
    * stage-advance row the moment a stage first completes, across
    * micro-batches. State is |stages| longs per ACTIVE key, bounded by
    * the key population, not stream length.
    *
    * Ordering contract: rows are event-time sorted WITHIN each batch;
    * across batches the machine is forward-only (a late event cannot
    * retro-improve an earlier stage time the way a batch recompute
    * would) — the standard streaming-funnel trade; run the batch
    * operator for the exact backfill.
    *
    * @param stream columns: key (long), t (exact-integer clock),
    *               stage type (string).
    */
  def funnelProgress(
      stream: DataFrame,
      keyCol: String,
      tCol: String,
      typeCol: String,
      stages: Seq[String]): Dataset[FunnelProgress] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val s = stream.sparkSession
    import s.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    stream
      .select(col(keyCol).cast("long"), col(tCol).cast("long"), col(typeCol))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, rows: Iterator[(Long, Long, String)], state: GroupState[Array[Long]]) => {
          val times = state.getOption.getOrElse(Array.fill(stages.size)(-1L))
          val out = Seq.newBuilder[FunnelProgress]
          // equal-ts ties process in STAGE order (signup before click
          // at the same instant), matching the batch operator's
          // inclusive >= bound — never by accidental stage-name
          // spelling. Non-stage events sort last and are ignored.
          rows.toArray
            .sortBy(r => (r._2, stageIdx.getOrElse(r._3, Int.MaxValue)))
            .foreach { case (_, t, tp) =>
            stageIdx.get(tp).foreach { i =>
              if (times(i) < 0L &&
                  (i == 0 || (times(i - 1) >= 0L && t >= times(i - 1)))) {
                times(i) = t
                out += FunnelProgress(key, i + 1, t)
              }
            }
          }
          state.update(times)
          out.result().iterator
        })
  }
}
