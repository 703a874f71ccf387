package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TopKByAgg (mergeable bounded-heap per-group top-k) and
  * QuantileSketchAgg (mergeable deterministic quantile summary):
  * exactness regimes, tie rules, partitioning independence, bounded
  * error past capacity, SQL registration.
  */
class TopKQuantileSpec extends SparkSpec {

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int): Seq[(String, Double)] =
    df.agg(AggregateFunctions.topKBy(col("k"), col("v"), k).as("tk"))
      .select(explode(col("tk")).as("e"))
      .collect().map { r =>
        val e = r.getStruct(0)
        (e.getString(0), e.getDouble(1))
      }.toSeq

  test("topKBy keeps the k best under (v desc, key asc), ties keep the smaller key") {
    val s = spark
    import s.implicits._
    val rows = Seq(("d1", 5.0), ("d2", 9.0), ("d3", 5.0), ("d4", 1.0), ("d5", 9.0))
      .toDF("k", "v")
    // top-3: 9.0 ties -> d2 before d5; 5.0 tie at the boundary -> d1 (smaller key) kept
    assert(topk(rows, 3) === Seq(("d2", 9.0), ("d5", 9.0), ("d1", 5.0)))
    // k larger than the input returns everything, fully sorted
    assert(topk(rows, 10).map(_._1) === Seq("d2", "d5", "d1", "d3", "d4"))
  }

  test("topKBy is partitioning-independent (merge correctness)") {
    val s = spark
    import s.implicits._
    val rows = (1 to 500).map(i => (s"id$i", (i * 37 % 101).toDouble)).toDF("k", "v")
    val one = topk(rows.repartition(1), 7)
    val many = topk(rows.repartition(13), 7)
    assert(one === many)
    // equals the window formulation it replaces
    val win = rows.collect().map(r => (r.getString(0), r.getDouble(1)))
      .sortBy { case (k, v) => (-v, k) }.take(7).toSeq
    assert(one === win)
  }

  test("topKBy per group ships at most k rows per group and skips NULLs") {
    val s = spark
    import s.implicits._
    val rows = Seq(("a", Some("x1"), Some(3.0)), ("a", Some("x2"), Some(8.0)),
      ("a", None, Some(9.0)), ("a", Some("x3"), None),
      ("b", Some("y1"), Some(2.0))).toDF("g", "k", "v")
    val got = rows.groupBy(col("g"))
      .agg(AggregateFunctions.topKBy(col("k"), col("v"), 1).as("tk"))
      .select(col("g"), explode(col("tk")).as("e"))
      .collect().map(r => (r.getString(0), r.getStruct(1).getString(0))).toMap
    assert(got === Map("a" -> "x2", "b" -> "y1"))
  }

  private def quants(df: org.apache.spark.sql.DataFrame, cap: Int,
      ps: Seq[Double]): Seq[(Double, Double)] =
    df.agg(AggregateFunctions.quantileSketch(col("v"), cap, ps).as("qs"))
      .select(explode(col("qs")).as("e"))
      .collect().map { r =>
        val e = r.getStruct(0)
        (e.getDouble(0), e.getDouble(1))
      }.toSeq

  test("quantileSketch exact regime matches quantile_disc rank semantics") {
    val s = spark
    import s.implicits._
    val vals = (1 to 100).map(_.toDouble).toDF("v")
    // DuckDB-verified: n=100 -> 0.25->25, 0.5->50, 0.75->75, 0.9->90
    assert(quants(vals, cap = 256, Seq(0.25, 0.5, 0.75, 0.9))
      === Seq((0.25, 25.0), (0.5, 50.0), (0.75, 75.0), (0.9, 90.0)))
    // n=4 boundary cases (DuckDB-verified): 0.74 -> 3, 0.76 -> 4
    val four = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    assert(quants(four, 64, Seq(0.0, 0.25, 0.74, 0.76, 1.0))
      === Seq((0.0, 1.0), (0.25, 1.0), (0.74, 3.0), (0.76, 4.0), (1.0, 4.0)))
  }

  test("quantileSketch exact regime is partitioning-independent") {
    val s = spark
    import s.implicits._
    val vals = (1 to 900).map(i => (i * 7919 % 1000).toDouble).toDF("v")
    val one = quants(vals.repartition(1), cap = 1024, Seq(0.25, 0.5, 0.75))
    val many = quants(vals.repartition(17), cap = 1024, Seq(0.25, 0.5, 0.75))
    assert(one === many)
  }

  test("quantileSketch past capacity: bounded memory, bounded rank error") {
    val s = spark
    import s.implicits._
    val n = 20000
    val vals = (1 to n).map(_.toDouble).toDF("v").repartition(9)
    val cap = 128
    val got = quants(vals, cap, Seq(0.25, 0.5, 0.75)).toMap
    // each reported value's true rank must sit within 10% of target —
    // loose enough to be stable, tight enough to catch a broken
    // compactor (weight loss shifts ranks wildly)
    Seq(0.25, 0.5, 0.75).foreach { p =>
      val v = got(p)
      val trueRank = v // values are 1..n, rank == value
      val target = p * n
      assert(math.abs(trueRank - target) <= n * 0.10,
        s"p=$p reported $v, target rank $target")
    }
  }

  test("quantileSketch conserves total weight through compaction") {
    val sk = new QuantileSketch(16)
    (1 to 1000).foreach(i => sk.insert(i.toDouble))
    assert(sk.weightedItems().map(_._2).sum === 1000L)
    val sk2 = new QuantileSketch(16)
    (1 to 777).foreach(i => sk2.insert((i * 3).toDouble))
    sk.mergeWith(sk2)
    assert(sk.weightedItems().map(_._2).sum === 1777L)
  }

  test("kmvMinima: exact regime is the full distinct hash set, duplicate/partitioning independent") {
    val s = spark
    import s.implicits._
    val vals = ((1 to 50) ++ (1 to 50) ++ (1 to 50)).map(i => s"v$i").toDF("x")
    def mins(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
      df.agg(AggregateFunctions.kmvMinima(col("x"), k).as("m"))
        .head().getSeq[Long](0)
    val one = mins(vals.repartition(1), 128)
    val many = mins(vals.repartition(11), 128)
    assert(one === many)
    assert(one.size === 50, "under k, the sketch holds every distinct hash once")
    assert(graft.functions.KmvSketchAgg.estimateDistinct(one.toArray, 128) === 50.0)
    // unsigned-ascending output order
    val flipped = one.map(_ ^ java.lang.Long.MIN_VALUE)
    assert(flipped === flipped.sorted)
  }

  test("kmvMinima: past k the estimate lands within the ~1/sqrt(k) band") {
    val s = spark
    import s.implicits._
    val n = 20000
    val vals = (1 to n).map(i => s"item-$i").toDF("x").repartition(7)
    val m = vals.agg(AggregateFunctions.kmvMinima(col("x"), 256).as("m"))
      .head().getSeq[Long](0)
    assert(m.size === 256)
    val est = graft.functions.KmvSketchAgg.estimateDistinct(m.toArray, 256)
    assert(math.abs(est - n) / n < 0.25, s"estimate $est vs true $n")
  }

  test("corpusOverlapApprox == corpusOverlap in the exact regime") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val exact = graft.curation.Curation.corpusOverlap(docs, "text", "source", 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    val approx = graft.curation.Curation.corpusOverlapApprox(docs, "text", "source", 3, 16384)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(approx === exact)
  }

  test("SQL registration: topk_by and quantile_sketch work from spark.sql") {
    val s = spark
    graft.GraftExtensions.registerAll(s)
    import s.implicits._
    Seq(("a", 1.0), ("b", 5.0), ("c", 3.0)).toDF("k", "v")
      .createOrReplaceTempView("tkq")
    val tk = s.sql("SELECT topk_by(k, v, 2) AS tk FROM tkq").head()
      .getSeq[Row](0).map(r => r.getString(0))
    assert(tk === Seq("b", "c"))
    val qs = s.sql("SELECT quantile_sketch(v, 64, 0.5) AS qs FROM tkq").head()
      .getSeq[Row](0).map(r => (r.getDouble(0), r.getDouble(1)))
    assert(qs === Seq((0.5, 3.0)))
    val km = s.sql("SELECT size(kmv_minima(k, 16)) AS n FROM tkq").head().getInt(0)
    assert(km === 3)
  }
}
