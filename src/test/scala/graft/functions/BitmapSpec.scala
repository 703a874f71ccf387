package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BitmapSpec extends SparkSpec {
  import spark.implicits._
  import BitmapFunctions._

  test("bitmap_ids is exact and merge-order-independent across partitionings") {
    val ids = Seq(0L, 5L, 63L, 64L, 65L, 1000L, 5L, 0L)
    val one = ids.toDF("id").coalesce(1)
      .agg(bitmap_ids(col("id")).as("bm"))
      .select(bitmap_count(col("bm"))).head().getLong(0)
    val many = ids.toDF("id").repartition(7)
      .agg(bitmap_ids(col("id")).as("bm"))
      .select(bitmap_count(col("bm"))).head().getLong(0)
    assert(one === 6L && many === 6L)
    // byte-identical bitmaps regardless of partitioning
    val b1 = ids.toDF("id").coalesce(1).agg(bitmap_ids(col("id")).as("bm"))
      .head().getAs[Array[Byte]]("bm")
    val b2 = ids.toDF("id").repartition(7).agg(bitmap_ids(col("id")).as("bm"))
      .head().getAs[Array[Byte]]("bm")
    assert(java.util.Arrays.equals(b1, b2))
  }

  test("bitmap_ids Column API accepts non-Long integral ids (casts like the SQL path)") {
    // Regression: the Column entry point used to skip the Cast the SQL
    // registration applies, so an IntegerType id crashed update()'s
    // asInstanceOf[Long] at runtime.
    val n = Seq(1, 2, 3, 2).toDF("id") // IntegerType
      .agg(bitmap_ids(col("id")).as("bm"))
      .select(bitmap_count(col("bm"))).head().getLong(0)
    assert(n === 3L)
  }

  test("set algebra kernels: and/or/andnot counts") {
    val a = java.util.BitSet.valueOf(Array.empty[Long])
    Seq(1, 2, 3, 100).foreach(a.set)
    val b = java.util.BitSet.valueOf(Array.empty[Long])
    Seq(2, 3, 4).foreach(b.set)
    val ab = (a.toByteArray, b.toByteArray)
    assert(BitmapOps.andCount(ab._1, ab._2) === 2L)
    assert(BitmapOps.orCount(ab._1, ab._2) === 5L)
    assert(BitmapOps.andNotCount(ab._1, ab._2) === 2L) // {1, 100}
    assert(BitmapOps.count(ab._1) === 4L)
  }

  test("SQL surface and universe guard") {
    graft.GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT bitmap_and_count(a, b) AS ab, bitmap_count(a) AS na FROM (
           SELECT bitmap_ids(CASE WHEN id < 6 THEN id ELSE id - 3 END) AS a,
                  bitmap_ids(id) AS b
           FROM range(10))""").head()
    // a = bits {0..5} ∪ {4..6} = {0..6} (7), b = {0..9}
    assert(r.getLong(1) === 7L)
    assert(r.getLong(0) === 7L)
    val err = intercept[Exception] {
      Seq(-1L).toDF("id").agg(bitmap_ids(col("id"))).collect()
    }
    assert(err.getMessage.contains("bitmap_ids") ||
      Option(err.getCause).exists(_.getMessage.contains("bitmap_ids")))
  }
}
