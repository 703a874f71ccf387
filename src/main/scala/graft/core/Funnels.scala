package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel and retention-cohort analytics — the event-plane
  * rollups a product dashboard runs over the same clickstream the
  * sessionizer consumes.
  *
  * Both operators are single-exchange shapes: the funnel is a chain of
  * window expressions over ONE (user, time) sort (no per-stage
  * self-joins — the classic k-way funnel join re-shuffles the event
  * table once per stage and melts down at 100 TB), and retention is
  * two user-keyed aggregations whose join reuses the first agg's
  * partitioning.
  */
object Funnels {

  /** First-completion time of each funnel stage per user, where stage
    * i counts only if it happens AT OR AFTER the user's first
    * qualifying stage i-1 event (inclusive bound, ties broken by
    * `order`).
    *
    * One window per stage, all over the same (keys, ts, order) spec —
    * Catalyst plans a single Exchange + Sort and evaluates the chained
    * running-mins in one pass per partition. Output: keys, t_<stage>
    * (exact-integer first-completion clock per stage, null = not
    * reached), stage_reached (0..n).
    */
  def stageTimes(
      events: DataFrame,
      keys: Seq[String],
      ts: Column,
      order: Seq[Column],
      typeCol: Column,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages,
      s"duplicate stage names would produce duplicate t_<stage> columns: $stages")
    // outputs are keys ++ t_<stage>... ++ stage_reached — a key named
    // like an output would collide silently
    val outNames = stages.map(s => s"t_$s") :+ "stage_reached"
    val clash = keys.filter(outNames.toSet)
    require(clash.isEmpty,
      s"key columns $clash collide with output names t_<stage>/stage_reached")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ts +: order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // collision-free temps (withColumn replaces same-named input cols)
    val cN = Names.fresh(events, stages.indices.map(i => s"__c$i"))
    val rN = Names.fresh(events, stages.indices.map(i => s"__r$i"))
    var df = events.withColumn(cN(0), when(typeCol === stages.head, ts))
    stages.indices.drop(1).foreach { i =>
      df = df
        .withColumn(rN(i - 1), min(col(cN(i - 1))).over(w))
        .withColumn(cN(i),
          when(typeCol === stages(i) && col(rN(i - 1)).isNotNull, ts))
    }

    val stageTimesAgg = stages.indices.map(i =>
      min(col(cN(i))).as(s"t_${stages(i)}"))
    // highest non-null stage wins: fold from stage 0 up so later
    // stages' `when` branches wrap (and beat) earlier ones.
    val reached = stages.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"t_${stages(i)}").isNotNull, lit(i + 1)).otherwise(acc)
    }

    df.groupBy(keys.map(col): _*)
      .agg(stageTimesAgg.head, stageTimesAgg.tail: _*)
      .withColumn("stage_reached", reached.cast("int"))
  }

  /** Classic retention matrix: users bucketed by first-seen day
    * (cohort), counted distinct per (cohort, day-offset) activity
    * cell. `countDistinct` is the standard two-phase exact distinct —
    * swap `approx_count_distinct` when cells hold 10^9+ users.
    */
  def retentionMatrix(
      events: DataFrame,
      userCol: String,
      ts: Column): DataFrame = {
    val day = date_trunc("day", ts)
    val withDay = events.select(col(userCol), day.as("__d"))
    val first = withDay.groupBy(col(userCol)).agg(min(col("__d")).as("__cohort"))
    withDay.join(first, userCol)
      .groupBy(
        date_format(col("__cohort"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("__d"), col("__cohort")).cast("int").as("day_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}
