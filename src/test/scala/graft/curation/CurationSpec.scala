package graft.curation

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CurationSpec extends SparkSpec {

  test("hashSample: deterministic, content-keyed, fraction roughly honored") {
    val s = spark
    import s.implicits._
    val df = (0L until 2000L).toDF("id")
    val a = Curation.hashSample(df, "id", 0.25).collect().map(_.getLong(0)).toSet
    val b = Curation.hashSample(df, "id", 0.25).collect().map(_.getLong(0)).toSet
    assert(a === b) // pure function of id — no RNG state
    assert(math.abs(a.size - 500) < 100, s"got ${a.size} of expected ~500")
    // repartitioning cannot change the sample (unlike df.sample)
    val c = Curation.hashSample(df.repartition(13), "id", 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(c === a)
    // monotone: a smaller fraction's sample nests inside a larger one's
    val half = Curation.hashSample(df, "id", 0.5).collect().map(_.getLong(0)).toSet
    assert(a.subsetOf(half))
  }

  test("stratifiedHashSample applies per-stratum fractions with default") {
    val s = spark
    import s.implicits._
    val df = (0L until 3000L).map(i => (i, Seq("x", "y", "z")((i % 3).toInt)))
      .toDF("id", "stratum")
    val got = Curation.stratifiedHashSample(df, "id", "stratum",
      Map("x" -> 1.0, "y" -> 0.0), defaultFraction = 0.5)
    val byStratum = got.groupBy(col("stratum")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byStratum("x") === 1000L) // fraction 1.0 keeps everything
    assert(!byStratum.contains("y")) // fraction 0.0 keeps nothing
    assert(byStratum("z") > 300L && byStratum("z") < 700L) // ~50%
  }

  test("curateCorpus drops exact dups, near dups, off-language and low quality") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps of the lazy dog in the river bank today"),
      (1L, "the quick brown fox jumps of the lazy dog in the river bank today"), // exact dup -> drop
      (2L, "the quick brown fox jumps of the lazy dog in the river bank tonight"), // near dup -> drop
      (3L, "der hund und die katze das ist gut und der tag ist lang"), // German -> drop
      (4L, "a completely different text the parquet files of the spark engine and the shuffles")) // keeps
      .toDF("doc_id", "text")
    val got = Curation.curateCorpus(docs, "doc_id", "text",
      n = 3, tau = 0.5, minQuality = 0.3, lang = "en")
      .orderBy(col("doc_id")).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(0L, 4L))
    got.foreach { r =>
      assert(r.getString(1) === "en")
      assert(r.getDouble(2) >= 0.3)
      assert(r.getLong(3) > 0L)
    }
  }
}
