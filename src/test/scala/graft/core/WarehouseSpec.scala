package graft.core

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end contract of the JDBC warehouse seam, run for real against
  * the Derby driver bundled with Spark (in-memory database) — the same
  * code path a ClickHouse JDBC URL would take in production.
  */
class WarehouseSpec extends SparkSpec {

  private def sink(db: String) =
    new JdbcWarehouseSink(s"jdbc:derby:memory:$db;create=true")

  private def rows = {
    val s = spark
    import s.implicits._
    Seq((1L, "alpha", 1.5), (2L, "beta", -2.0), (3L, "gamma", 0.0))
      .toDF("id", "name", "score")
  }

  test("write creates the table and read round-trips values") {
    val w = sink("wh_roundtrip")
    w.write(rows, "t", SaveMode.ErrorIfExists)
    val back = w.read(spark, "t").orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(back.toSeq === Seq((1L, "alpha", 1.5), (2L, "beta", -2.0), (3L, "gamma", 0.0)))
  }

  test("append accumulates, overwrite replaces") {
    val w = sink("wh_modes")
    w.write(rows, "t", SaveMode.Append)
    w.write(rows, "t", SaveMode.Append)
    assert(w.read(spark, "t").count() === 6)
    w.write(rows.filter(col("id") === 1), "t", SaveMode.Overwrite)
    assert(w.read(spark, "t").count() === 1)
  }

  test("distributed write: multi-partition frame lands complete") {
    val w = sink("wh_parts")
    val big = spark.range(0, 1000).repartition(8)
      .select(col("id"), (col("id") % 7).as("bucket"))
    w.write(big, "t", SaveMode.ErrorIfExists)
    val got = w.read(spark, "t")
    assert(got.count() === 1000)
    assert(got.agg(sum(col("id"))).head.getLong(0) === 499500L)
  }
}
