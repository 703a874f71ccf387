package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val qs = if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names.toSeq
    qs.foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      if (sys.env.contains("SCRATCH_EXPLAIN")) df.explain("formatted")
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"$q run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
