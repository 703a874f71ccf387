package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RankingEvalSpec extends SparkSpec {
  import spark.implicits._

  test("evalRanking: hand-computed nDCG/MRR/recall on a tiny run") {
    // query A: truth {d1:rel3, d2:rel1, d9:rel2}; run ranks d5,d1,d2
    // query B: truth {d7:rel1}; run has no relevant docs in top-k
    val runs = Seq(
      ("A", 5L, 1L), ("A", 1L, 2L), ("A", 2L, 3L),
      ("B", 1L, 1L), ("B", 2L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val truth = Seq(
      ("A", 1L, 3L), ("A", 2L, 1L), ("A", 9L, 2L),
      ("B", 7L, 1L))
      .toDF("query_id", "doc_id", "rel")
    val got = Search.evalRanking(runs, truth, "doc_id", k = 3)
      .orderBy("query_id").collect()

    // A: DCG items: d1 at rank2 -> floor(7/log2(3)*1e9), d2 at rank3 -> floor(1/2*1e9)
    val dcgA = math.floor(7.0 / (math.log(3) / math.log(2)) * 1e9).toLong +
      math.floor(1.0 / 2.0 * 1e9).toLong
    // ideal: rel 3,2,1 at ranks 1,2,3
    val idcgA = math.floor(7.0 * 1e9).toLong +
      math.floor(3.0 / (math.log(3) / math.log(2)) * 1e9).toLong +
      math.floor(1.0 / 2.0 * 1e9).toLong
    val a = got(0)
    assert(a.getAs[Long]("n_rel") === 3L)
    assert(a.getAs[Long]("n_hits") === 2L)
    assert(a.getAs[Double]("ndcg") === (dcgA * 1000000L / idcgA).toDouble / 1e6)
    assert(a.getAs[Double]("mrr") === 0.5)
    assert(a.getAs[Double]("recall") === 0.666666)

    val b = got(1)
    assert(b.getAs[Long]("n_rel") === 1L)
    assert(b.getAs[Long]("n_hits") === 0L)
    assert(b.getAs[Double]("ndcg") === 0.0)
    assert(b.getAs[Double]("mrr") === 0.0)
    assert(b.getAs[Double]("recall") === 0.0)
  }

  test("bm25Runs one-pass multi-query matches per-query bm25TopK rankings") {
    val docs = Seq(
      (1L, "spark join window join"),
      (2L, "hash merge sort sort sort"),
      (3L, "spark window window hash"),
      (4L, "join join join merge"),
      (5L, "window"),
      (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val qs = Seq("a" -> Seq("spark", "join"), "b" -> Seq("hash", "sort"))
    val multi = Search.bm25Runs(docs, "doc_id", "text", qs, k = 3)
      .orderBy("query_id", "rank")
      .select("query_id", "doc_id", "score_fx").as[(String, Long, Long)]
      .collect().toSeq
    val single = qs.flatMap { case (q, terms) =>
      Search.bm25TopK(docs, "doc_id", "text", terms, k = 3)
        .select(col("doc_id"), col("score_fx")).as[(Long, Long)]
        .collect().toSeq.map { case (d, fx) => (q, d, fx) }
    }
    assert(multi === single)
  }
}
