package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * One parquet directory per table; reads are plain `spark.read.parquet`
  * so Catalyst's column pruning + filter pushdown reach the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // The testdata dirs are immutable, but every spark.read.parquet call
  // re-lists the directory and re-reads footers to infer the schema —
  // a fixed driver-side cost paid once per table REFERENCE (a query
  // touching three tables pays it three times). Memoize the resolved
  // DataFrame per (session, path). DataFrames strongly reference
  // their session, so stopped sessions' entries are purged on the
  // next load (the map is tiny — a handful of paths per session) to
  // keep a long-lived multi-session JVM from accumulating dead plans.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      (k: (SparkSession, String)) => doLoad(k._1, k._2))
  }

  private def doLoad(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    // events.ts is parquet TIMESTAMP(NANOS), which Spark only reads as
    // Long (spark.sql.legacy.parquet.nanosAsLong=true, set in every
    // session builder here). The data is µs-resolution, so converting
    // nanos→micros is lossless.
    df.schema.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        // INTEGER division (`div`), not `/`: long `/` promotes to double,
        // and doubles can't hold epoch-nanos (~1.7e18 > 2^53) — the
        // round-trip drifts the last microsecond digit vs DuckDB's
        // exact epoch_us truncation.
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case None => df
    }
  }

  /** Register every table as a temp view named after itself, so query
    * code can use `spark.sql` with the same table names the DuckDB
    * oracle sees.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
