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
    if (args.lift(1).contains("simstats")) {
      import org.apache.spark.sql.functions._
      val docs = Tables.load(spark, dir, "documents")
      val sk = docs.select(col("doc_id"),
        graft.dedup.Dedup.simhash60(graft.text.TextFunctions.shingles(col("text"), 3)).as("sim"))
      sk.cache().count()
      println("distinct sims: " + sk.select(col("sim")).distinct().count())
      sk.groupBy(col("sim")).count().orderBy(col("count").desc).show(10)
      // piece bucket sizes at width 16
      val pieces = sk.select(explode(array((0 until 4).map(p =>
        concat_ws(":", lit(p), shiftrightunsigned(col("sim"), p * 15).bitwiseAND(0x7fffL))): _*)).as("piece"))
      pieces.groupBy(col("piece")).count().orderBy(col("count").desc).show(10)
      spark.stop(); return
    }
    if (sys.env.contains("SCRATCH_DEBUGLOG")) spark.sparkContext.setLogLevel("DEBUG")
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
