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

  // NOTE (round-12 optimization, measured and REJECTED): repartitioning
  // narrow single-file scans to defaultParallelism right after the read
  // (guide §2.5's "unsplittable input" remedy) was A/B-benched across
  // 30 queries on an idle machine — it pays only where the first stage
  // is genuinely CPU-bound per row (media synthesis/decode: q218 2.0 s
  // → 0.55 s) and LOSES 0.3-0.5 s on ordinary tokenize/aggregate
  // queries, because pre-spreading the scan defeats map-side partial
  // aggregation (1 partition collapses duplicate keys before the
  // exchange; 32 partitions ship ~32× the partials) and pins
  // 32-task stages where AQE would coalesce. The guard now lives only
  // at the media-synthesis entry points (graft.multimodal.Multimodal),
  // where rows are independent and no aggregation follows.
  private def doLoad(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = spark.read.parquet(path)
    // The driver has regenerated events.parquet with different physical
    // ts types across rounds; normalize them all to the session-TZ
    // (UTC) TIMESTAMP type here, at the single load point, so every
    // query can use `unix_micros(ts)` etc. without caring which
    // generation of testdata it reads.
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        // parquet TIMESTAMP(NANOS) read as Long
        // (spark.sql.legacy.parquet.nanosAsLong=true, set in every
        // session builder here); the data is µs-resolution so
        // nanos→micros is lossless. INTEGER division (`div`), not `/`:
        // long `/` promotes to double, and doubles can't hold
        // epoch-nanos (~1.7e18 > 2^53) — the round-trip drifts the last
        // microsecond digit vs DuckDB's exact epoch_us truncation.
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        // parquet timestamp[us] WITHOUT isAdjustedToUTC reads as
        // TIMESTAMP_NTZ, which unix_micros rejects. Under the UTC
        // session timezone (set in every builder here) the cast keeps
        // the wall clock — identical epoch micros to DuckDB's epoch_us
        // on the same naive value.
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view named after itself, so query
    * code can use `spark.sql` with the same table names the DuckDB
    * oracle sees.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
