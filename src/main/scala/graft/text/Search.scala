package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval over a document corpus — the inverted-index
  * ranking a training-data pipeline uses for targeted corpus probes
  * ("find the docs most about X") and retrieval-based decontamination.
  *
  * Scale shape: the corpus is tokenized and FILTERED TO THE QUERY TERMS
  * before anything aggregates — the posting list that shuffles is
  * O(docs containing a query term), not O(corpus tokens). Corpus-level
  * scalars (N, avgdl) and the per-term document frequencies (≤ |query|
  * rows) ride broadcast joins, so the big side shuffles exactly once,
  * on doc_id, for the per-doc score sum.
  *
  * Determinism: tf/df/dl are exact integers; each (doc, term) partial
  * score is a pure double expression over them, fixed to 1e-9 via
  * floor, and summed as int64 — the cross-engine-exact idiom used by
  * the LM scorers (Curation.lmCrossEntropy).
  */
object Search {

  /** Okapi BM25 defaults. */
  val K1 = 1.2
  val B = 0.75

  /** Top-`k` docs by BM25 score for `queryTerms`, ties broken by
    * ascending id. Output: idCol, score (1e-6-floored double),
    * score_fx (the exact int64 fixed-point the ranking sorts on).
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int): DataFrame = {
    // NULL text must not poison the corpus stats: size(NULL tokens) is
    // -1 under legacy sizeOfNull, which would subtract from sum(dl)
    // while count(*) still counts the row. Such docs carry no terms and
    // can never score — drop them before anything aggregates.
    val toks = docs.filter(col(textCol).isNotNull).select(
      col(idCol),
      TextFunctions.tokens(col(textCol)).as("__t"))
    val withDl = toks.select(col(idCol), size(col("__t")).cast("long").as("dl"), col("__t"))

    // One row of corpus stats; broadcast, never collected.
    val stats = withDl.agg(
      count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))

    // Posting list: only query-term occurrences survive the explode.
    val posting = withDl
      .select(col(idCol), col("dl"), explode(col("__t")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))

    scoreAndTopK(posting, stats, idCol, k)
  }

  /** The BM25 scoring tail shared by [[bm25TopK]] and
    * [[SearchIndex.query]] — ONE implementation so the on-disk index
    * provably scores bit-identically to the in-memory path (df from
    * the posting rows, broadcast stats, fixed-point per-term scores
    * summed in int64).
    */
  private[text] def scoreAndTopK(
      posting: DataFrame, // (idCol, dl, term, tf) unique per (doc, term)
      stats: DataFrame, // one row: (n, avgdl)
      idCol: String,
      k: Int): DataFrame = {
    // posting is already unique per (doc, term), so df is a plain
    // count — no count-distinct expand needed.
    val dfs = posting.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))

    val scored = posting
      .join(broadcast(dfs), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__fx",
        floor(
          log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
            (col("tf") * lit(K1 + 1.0)) /
            (col("tf") + lit(K1) * (lit(1.0) - lit(B) + lit(B) * (col("dl") / col("avgdl")))) *
            lit(1e9)).cast("long"))

    scored.groupBy(col(idCol))
      .agg(sum(col("__fx")).as("score_fx"))
      .orderBy(col("score_fx").desc, col(idCol))
      .limit(k)
      .select(col(idCol),
        (floor(col("score_fx").cast("double") / lit(1000.0)) / lit(1e6)).as("score"),
        col("score_fx"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) — the standard
    * hybrid-retrieval combiner for a lexical (BM25) and a vector (ANN)
    * shortlist, score-scale-free by construction: each list
    * contributes `1/(kRrf + rank)` per doc, encoded as the exact
    * int64 `RrfScale div (kRrf + rank)` so the fused ordering is
    * engine-exact (no float-sum order dependence).
    *
    * Scale shape: shortlists are top-k-sized (k·|lists| rows total,
    * NOT corpus-sized) — union + one tiny groupBy; a doc absent from
    * a list simply contributes nothing (the standard RRF treatment).
    *
    * @param rankings shortlists carrying (idCol, rank 1-based); ranks
    *   beyond each list's own length never appear by construction.
    * @return (idCol, rrf_fx) top `k` by (rrf_fx desc, id).
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, kRrf: Int, k: Int): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse requires at least one ranking")
    val contribs = rankings
      .map(_.select(col(idCol),
        expr(s"${RrfScale}L div (${kRrf}L + rank)").as("__c")))
      .reduce(_ unionByName _)
    contribs.groupBy(col(idCol))
      .agg(sum(col("__c")).as("rrf_fx"))
      .orderBy(col("rrf_fx").desc, col(idCol))
      .limit(k)
  }

  /** Fixed-point scale for [[rrfFuse]] contributions. */
  val RrfScale: Long = 1000000000L

  /** Multi-query BM25 in ONE corpus pass: all queries' terms filter
    * the posting list together, document frequencies are computed once
    * per TERM (query-independent), and the query fan-out happens on
    * the already-term-filtered posting rows via a broadcast
    * (query, term) map — so N queries cost one tokenize + one shuffle,
    * not N corpus scans. Per-query ranks come from a window
    * PARTITIONED by query (parallel across queries).
    *
    * @param queries (query_id, terms) — the whole batch.
    * @return (query_id, idCol, score_fx, rank 1-based) rows with
    *   rank <= k, exact int64 scoring as [[bm25TopK]].
    */
  def bm25Runs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(String, Seq[String])],
      k: Int): DataFrame = {
    require(queries.nonEmpty, "bm25Runs requires at least one query")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.filter(col(textCol).isNotNull).select(
      col(idCol), TextFunctions.tokens(col(textCol)).as("__t"))
    val withDl = toks.select(col(idCol), size(col("__t")).cast("long").as("dl"), col("__t"))
    val stats = withDl.agg(
      count(lit(1)).as("n"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val allTerms = queries.flatMap(_._2).distinct
    val posting0 = withDl
      .select(col(idCol), col("dl"), explode(col("__t")).as("term"))
      .filter(col("term").isin(allTerms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val dfs = posting0.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qterms = queries
      .flatMap { case (q, ts) => ts.distinct.map(tm => (q, tm)) }
      .toDF("query_id", "term")
    val scored = posting0
      .join(broadcast(dfs), "term")
      .join(broadcast(qterms), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__fx",
        floor(
          log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
            (col("tf") * lit(K1 + 1.0)) /
            (col("tf") + lit(K1) * (lit(1.0) - lit(B) + lit(B) * (col("dl") / col("avgdl")))) *
            lit(1e9)).cast("long"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("__fx")).as("score_fx"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_fx").desc, col(idCol))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("score_fx"), col("rank"))
  }

  /** Ranking-quality metrics — nDCG@k, MRR@k, recall@k per query —
    * over a run table and a graded ground-truth table: the evaluation
    * loop every retrieval/embedding change ships through before it
    * touches the production index.
    *
    * Exactness: each DCG item (2^rel − 1)/log2(rank+1) is floored to
    * an int64 at 1e9 and summed as int64 (the BM25 discipline — no
    * float-sum order dependence); nDCG/MRR/recall then come from
    * int64 divisions onto the 1e-6 grid. Scale shape: runs are
    * (queries × k)-sized, truth is relevance-sized; everything joins
    * on (query, doc) and aggregates per query — nothing corpus-sized.
    *
    * @param runs (query_id, idCol, rank 1-based) — e.g. [[bm25Runs]].
    * @param truth (query_id, idCol, rel) with rel >= 1 integer grades;
    *   docs absent from truth are irrelevant.
    * @return per query: n_rel, n_hits (relevant in top-k), ndcg, mrr,
    *   recall (all on the 1e-6 grid; queries with no truth rows give
    *   ndcg/recall 0).
    */
  def evalRanking(
      runs: DataFrame,
      truth: DataFrame,
      idCol: String,
      k: Int): DataFrame = {
    val gainFx = (rel: Column, rank: Column) =>
      floor((pow(lit(2.0), rel) - lit(1.0)) / log2(rank + lit(1)) * lit(1e9))
        .cast("long")
    val hits = runs.filter(col("rank") <= k)
      .join(truth, Seq("query_id", idCol))
    val perQ = hits.groupBy(col("query_id")).agg(
      count(lit(1)).as("n_hits"),
      sum(gainFx(col("rel"), col("rank"))).as("dcg_fx"),
      min(col("rank")).as("first_rel"))
    // ideal DCG: truth sorted by grade desc (tie: id) — top k items
    val iw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rel").desc, col(idCol))
    val ideal = truth
      .withColumn("__irk", row_number().over(iw).cast("long"))
      .filter(col("__irk") <= k)
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("__dummy"),
        sum(gainFx(col("rel"), col("__irk"))).as("idcg_fx"))
      .drop("__dummy")
    val nRel = truth.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    nRel
      .join(ideal, Seq("query_id"), "left")
      .join(perQ, Seq("query_id"), "left")
      .select(
        col("query_id"),
        col("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("dcg_fx"), lit(0L)).as("__dcg"),
        coalesce(col("idcg_fx"), lit(0L)).as("__idcg"),
        col("first_rel"))
      // INTEGER div end-to-end: dcg_fx·1e6 can exceed 2^53, so a
      // double division here would silently lose the low digits the
      // oracle's exact `//` keeps.
      .select(
        col("query_id"), col("n_rel"), col("n_hits"),
        (when(col("__idcg") > 0,
          expr("(__dcg * 1000000L) div __idcg")).otherwise(lit(0L))
          .cast("double") / lit(1e6)).as("ndcg"),
        (when(col("first_rel").isNotNull, expr("1000000L div first_rel"))
          .otherwise(lit(0L)).cast("double") / lit(1e6)).as("mrr"),
        (expr("(n_hits * 1000000L) div n_rel")
          .cast("double") / lit(1e6)).as("recall"))
  }
}
