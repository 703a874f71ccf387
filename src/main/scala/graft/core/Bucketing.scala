package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins: both sides of a
  * repeated big⋈big join written with the same `bucketBy` spec join
  * WITHOUT an exchange — the bucketed scan already satisfies the hash
  * distribution the join needs, so a nightly fact⋈fact reconciliation
  * pays the shuffle once at write time instead of on every query.
  *
  * This is the persistent complement to `repartition`: repartitioning
  * co-locates within one job; bucketing co-locates across jobs and
  * sessions. Bucket count is part of the layout contract — both tables
  * MUST use the same count, and it should be sized so one bucket of
  * the bigger table fits an executor's memory at target scale.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted external parquet table
    * registered in the session catalog (`saveAsTable` is required —
    * plain `parquet(path)` drops the bucket metadata the planner
    * needs).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      keys: Seq[String],
      numBuckets: Int): Unit = {
    require(keys.nonEmpty && numBuckets > 0)
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** The co-located join: both catalog tables must share the bucket
    * spec on the join keys. Returns the joined frame; PlanSpec-style
    * assertion of the no-exchange property lives in the spec.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      keys: Seq[String],
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)
}
