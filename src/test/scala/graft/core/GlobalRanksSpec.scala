package graft.core

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GlobalRanksSpec extends SparkSpec {
  import spark.implicits._

  private def check(rows: Seq[(String, Double)], k: Int): Unit = {
    val df = rows.toDF("id", "v").repartition(4)
    val expected = df
      .withColumn("tile",
        ntile(k).over(Window.orderBy(col("v").desc, col("id"))).cast("long"))
      .select("id", "tile").as[(String, Long)].collect().toMap
    val got = GlobalRanks
      .ntileExact(df, k, col("v"), descending = true,
        tieBreak = Seq(col("id")), out = "tile", buckets = 4)
      .select("id", "tile").as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("ntileExact matches the single-partition ntile window (uneven tiles)") {
    val rows = (1 to 103).map(i => (f"u$i%03d", (i * 37 % 41).toDouble))
    check(rows, 10)
  }

  test("ntileExact handles heavy value ties across tile edges") {
    val rows = (1 to 50).map(i => (f"u$i%03d", (i % 3).toDouble))
    check(rows, 7)
  }

  test("ntileExact with fewer rows than tiles (base = 0)") {
    check(Seq(("a", 3.0), ("b", 1.0), ("c", 2.0)), 10)
  }

  test("ntileExact on a single row and an exact multiple") {
    check(Seq(("only", 1.0)), 4)
    check((1 to 20).map(i => (f"u$i%02d", i.toDouble)), 5)
  }

  test("withGlobalRowNumber is the exact global rank, ascending") {
    val df = (1 to 200).map(i => (f"u$i%03d", (i * 13 % 97).toDouble))
      .toDF("id", "v").repartition(4)
    val expected = df
      .withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      .select("id", "rn").as[(String, Long)].collect().toMap
    val (numbered, total) = GlobalRanks.withGlobalRowNumber(
      df, col("v"), descending = false, tieBreak = Seq(col("id")),
      out = "rn", buckets = 4)
    assert(total == 200L)
    val got = numbered.select("id", "rn").as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("ntileExact on empty input returns empty") {
    val df = Seq.empty[(String, Double)].toDF("id", "v")
    val out = GlobalRanks.ntileExact(df, 10, col("v"), descending = true,
      tieBreak = Seq(col("id")), out = "tile")
    assert(out.count() == 0L)
  }
}
