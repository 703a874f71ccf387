package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall times at
  * SPARK_GRAFT_SF_DIR. Each query is warmed once at sf0.001 first so
  * the timings measure the engine, not JVM/codegen JIT warm-up.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Debug aid (mirrors Verify): SPARK_GRAFT_ONLY=q141_...,q23_...
    // times a subset; committed artifacts always come from full runs.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    def timeOnce(name: String): (Double, Boolean) = {
      // clear BEFORE timing, outside the clock: operators that persist
      // an intermediate (the dedup survivor maps) leak their cache
      // entries by design, and ~50 queries of accumulated storage
      // in front of a measurement inflates it up to 7x (r6's q50/q45/
      // q73 artifacts). Every measurement starts cache-cold and
      // storage-empty, so the committed minimum reproduces standalone.
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    // best of three measured passes per query: single runs swing up
    // to 4x under co-tenant load (r5 caught q53 at 4.4x its warm
    // cost with best-of-two); the min is the engine's actual cost.
    // A query that throws in ANY pass is a FAILURE: it is excluded
    // from the per-query map (an analysis error takes ~2 ms and would
    // masquerade as a 100x speedup — r8's five dead event queries) and
    // forces a nonzero exit so the driver records a failed run, not a
    // smaller-but-plausible success artifact.
    val passes = (1 to 3).map(_ => names.map(n => n -> timeOnce(n)).toMap)
    val failed = names.filter(n => passes.exists(p => !p(n)._2))
    val results = names.filterNot(failed.contains)
      .map(n => n -> passes.map(_(n)._1).min)
    // millisecond precision; Locale.ROOT: the f-interpolator honors
    // the default locale, and a comma decimal separator would corrupt
    // the JSON.
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val failedArr = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Full-name per-query map goes to a FILE (committed with the repo).
    val fullPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json"))
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"failed":$failedArr,"queries":$qs,"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(fullPath, fullLine)
    // stdout gets a COMPACT line sized for the driver's bounded tail
    // capture: every BENCH_r{1..8}.json has a 2000-char tail and
    // parsed:null — the ~3.6 KB full-name map never fit, and sbt's
    // trailing "[success] Total time" line eats ~70 more chars. Short
    // keys (the unique qNN prefix) keep 121 queries ≈1.6 KB, so the
    // whole line survives inside the window; past 1850 chars fall back
    // to the totals-only line rather than risk mid-line truncation.
    val shortQs = results
      .map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val compact =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"failed":$failedArr,"queries":$shortQs,"queries_file":"${fullPath.toString}","sf":"$sfDir"}"""
    val line = if (compact.length <= 1850) compact
      else s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"failed":$failedArr,"queries_file":"${fullPath.toString}","sf":"$sfDir"}"""
    println(line)
    System.out.flush()
    spark.stop()
    // Incomplete coverage IS a run failure: the driver must never
    // record a green artifact over a bench where queries died.
    if (failed.nonEmpty) sys.exit(1)
  }
}
