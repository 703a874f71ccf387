package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  test("cosine: known values, deterministic rounding") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0), 1.0),
      (Seq(1.0, 0.0), Seq(0.0, 1.0), 0.0),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0), -1.0),
      (Seq(3.0, 4.0), Seq(4.0, 3.0), 0.96))
      .toDF("a", "b", "want")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("c"), col("want"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("bruteForceTopK ranks by cosine desc with id tiebreak") {
    val s = spark
    import s.implicits._
    val queries = Seq((100L, Seq(1.0, 0.0))).toDF("q_id", "q_emb")
    val corpus = Seq(
      (1L, Seq(1.0, 0.0)), // cos 1.0
      (2L, Seq(1.0, 1.0)), // cos ~0.707
      (3L, Seq(0.0, 1.0)), // cos 0
      (4L, Seq(2.0, 0.0))) // cos 1.0 — ties with 1, id breaks
      .toDF("c_id", "c_emb")
    val got = Similarity.bruteForceTopK(queries, corpus, k = 3)
      .orderBy(col("rank")).collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq === Seq((1L, 1), (4L, 2), (2L, 3)))
  }

  test("lshTopK returns well-formed ranks and real neighbors at full recall when planes=0 bucket is shared") {
    val s = spark
    import s.implicits._
    // planes=1: two buckets; vectors on the same side of the hyperplane
    // collide. Check output shape + that found neighbors carry correct
    // cosine scores (subset of brute-force universe).
    val queries = Seq((100L, Seq(1.0, 0.2, 0.1))).toDF("q_id", "q_emb")
    val corpus = (1L to 20L).map(i =>
      (i, Seq(math.cos(i * 0.3), math.sin(i * 0.3), 0.1 * (i % 3))))
      .toDF("c_id", "c_emb")
    val bf = Similarity.bruteForceTopK(queries, corpus, k = 20)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    val lsh = Similarity.lshTopK(queries, corpus, k = 5, planes = 1)
      .collect()
    assert(lsh.nonEmpty && lsh.length <= 5)
    lsh.foreach { r =>
      assert(bf(r.getLong(1)) === r.getDouble(2)) // same scores as exact
    }
    val ranks = lsh.map(_.getInt(3)).toSeq
    assert(ranks === (1 to lsh.length))
  }

  test("cosinePairs finds mutually-close vectors above tau only") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Seq(1.0, 0.01)),
      (2L, Seq(1.0, 0.02)), // ~same direction as 1
      (3L, Seq(0.0, 1.0))) // orthogonal
      .toDF("vec_id", "emb")
    val got = Similarity.cosinePairs(df, "vec_id", "emb", tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L)))
  }
}
