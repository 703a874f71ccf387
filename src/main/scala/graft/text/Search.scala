package graft.text

import org.apache.spark.sql.DataFrame
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
}
