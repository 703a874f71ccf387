package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CmsSketchAgg: counter-grid replay against a local reference,
  * estimate guarantees (never undercounts; exact without collisions),
  * and merge/partitioning independence.
  */
class CmsSpec extends SparkSpec {

  private val depth = 3
  private val width = 32

  private def corpus = {
    val s = spark
    import s.implicits._
    val words = Seq.fill(40)("spark") ++ Seq.fill(25)("join") ++
      Seq.fill(9)("window") ++ (1 to 30).map(i => s"tail$i")
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
  }

  private def sketch(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.agg(CmsFunctions.cmsSketch(col("w"), depth, width).as("c"))
      .head().getSeq[Long](0).toSeq

  test("sketch counters equal a local replay of the md5 bucket derivation") {
    val got = sketch(corpus)
    val want = new Array[Long](depth * width)
    corpus.collect().map(_.getString(1)).foreach { w =>
      (0 until depth).foreach(j =>
        want(j * width + CmsSketchAgg.bucket(j, w, width)) += 1L)
    }
    assert(got == want.toSeq)
    // every row's counters sum to the input size (adds are total)
    (0 until depth).foreach { j =>
      assert(got.slice(j * width, (j + 1) * width).sum == 104L)
    }
  }

  test("estimates never undercount and are exact for heavy keys here") {
    val s = spark
    import s.implicits._
    val sk = corpus.agg(CmsFunctions.cmsSketch(col("w"), depth, width).as("c"))
    val probes = Seq("spark", "join", "window", "absent").toDF("w")
    val est = probes.crossJoin(sk)
      .select(col("w"),
        CmsFunctions.cmsEstimate(col("c"), col("w"), depth, width).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Map("spark" -> 40L, "join" -> 25L, "window" -> 9L, "absent" -> 0L)
    exact.foreach { case (w, c) =>
      assert(est(w) >= c, s"$w undercounted: ${est(w)} < $c") }
    // collision mass is bounded: overcount ≤ ~2N/width (here 104 rows,
    // width 32 → single-digit slack; 41-for-40 style, never 2x)
    exact.foreach { case (w, c) =>
      assert(est(w) - c <= 7, s"$w overcount ${est(w)} vs $c exceeds the CMS bound") }
  }

  test("sketch is a pure function of the multiset (partitioning/merge independent)") {
    assert(sketch(corpus.repartition(13)) == sketch(corpus))
    assert(sketch(corpus.repartition(1)) == sketch(corpus))
  }
}
