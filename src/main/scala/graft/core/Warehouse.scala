package graft.core

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Warehouse-connector seam — the delivery leg of the architecture:
  * the engine computes over parquet and pushes serving tables to an
  * external OLAP warehouse, where the reference keeps ALL its tables
  * (reference: operations/clickhouse.py bulk inserts via
  * clients/custom_clickhouse.py). Keeping it behind a trait makes the
  * warehouse a pluggable endpoint: the pipeline code writes through
  * [[WarehouseSink]] and never names a vendor.
  */
trait WarehouseSink {

  /** Deliver `df` into warehouse table `table`. */
  def write(df: DataFrame, table: String, mode: SaveMode): Unit

  /** Read a serving table back (verification, incremental marks). */
  def read(spark: SparkSession, table: String): DataFrame
}

/** JDBC-backed warehouse sink. With a ClickHouse JDBC driver on the
  * classpath, `new JdbcWarehouseSink("jdbc:clickhouse://host:8123/db")`
  * is the reference's ClickHouse delivery path verbatim; the in-repo
  * spec exercises the identical code against the Derby driver Spark
  * bundles (no warehouse server in the sandbox).
  *
  * Scale shape: Spark's JDBC relation writes PER PARTITION — each
  * partition opens one connection and streams its rows as
  * `batchsize`-row batched inserts, so a wide cluster write fans into
  * the warehouse at controlled parallelism (cap connections with the
  * `numPartitions` option, or `df.coalesce(n)` upstream); nothing is
  * collected on the driver. Reads partition on `partitionColumn` /
  * `lowerBound` / `upperBound` when supplied in `options`.
  */
final class JdbcWarehouseSink(
    url: String,
    options: Map[String, String] = Map.empty) extends WarehouseSink {

  private def props: Properties = {
    val p = new Properties()
    options.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  override def write(df: DataFrame, table: String, mode: SaveMode): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.jdbc(url, table, props)
}
