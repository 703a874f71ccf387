package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics — the precursor a tokenizer-training /
  * stop-list-mining pass runs over the whole corpus.
  *
  * Scale shape (100 TB): explode to words, then ONE keyed aggregation
  * whose key space is the vocabulary (≪ corpus) — map-side partial
  * combine means the exchange carries (term, partial-count) rows, not
  * word occurrences. Per-doc distinctness for document frequency rides
  * the same explode via `array_distinct` before it, so no second pass.
  */
object Vocab {

  /** (term, doc_freq, term_freq): in how many documents and how often
    * overall each whitespace token occurs. Pure integer arithmetic —
    * engine-exact.
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = df.select(col(idCol).as("doc"),
        TextFunctions.tokens(col(textCol)).as("ws"))
      .select(col("doc"), array_distinct(col("ws")).as("distinct_ws"), col("ws"))
    // one explode for total counts, one for per-doc presence; both
    // aggregate on the bounded vocabulary key
    val tf = words.select(explode(col("ws")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("term_freq"))
    val dfreq = words.select(explode(col("distinct_ws")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    dfreq.join(tf, Seq("term"))
      .select(col("term"), col("doc_freq"), col("term_freq"))
  }

  /** Approximate heavy-hitter terms via the engine's `approx_top_k`
    * sketch aggregate (SpaceSaving-family, mergeable) — the 100 TB
    * alternative to a full [[vocabulary]] aggregation when only the
    * head of the distribution matters: sketch memory is
    * O(maxItemsTracked) per partition instead of O(|vocab|) shuffle
    * state, and counts are EXACT whenever the tracked capacity covers
    * the live vocabulary (asserted in TextSpec against [[vocabulary]]).
    * Ties at the k boundary resolve sketch-internally, so this is a
    * rows-only operator by design — the exact q58 path is the oracle
    * surface.
    */
  def approxTopTerms(df: DataFrame, textCol: String, k: Int,
      maxItemsTracked: Int = 10000): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("term"))
      .agg(expr(s"approx_top_k(term, $k, $maxItemsTracked)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("term"), col("e.count").as("term_freq"))

  /** BPE merge-pair statistics — the quantity a byte-pair-encoding
    * tokenizer trainer maximizes at every merge step: for each
    * adjacent character pair, the total number of occurrences across
    * the corpus (word frequency × within-word occurrences). The
    * highest-count pair is the next merge; rerun on re-segmented text
    * for subsequent steps (the iteration is a driver loop by nature —
    * each step is one of these jobs).
    *
    * Scale shape: the pair explode runs over the DISTINCT word table
    * (vocab ≪ corpus) with frequencies riding along, so corpus size
    * only affects the first vocab-keyed count; both aggregations have
    * map-side partials. Integer-exact.
    */
  def bpePairCounts(df: DataFrame, textCol: String): DataFrame = {
    val vocab = df.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    vocab
      .select(col("freq"), explode(expr(
        "IF(length(w) < 2, array(), transform(sequence(1, length(w) - 1), i -> substring(w, i, 2)))"))
        .as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
  }

  /** Smooth IDF: ln((N + 1) / (doc_freq + 1)) + 1. */
  def idf(docFreq: Column, corpusSize: Long): Column =
    log((lit(corpusSize + 1d)) / (docFreq + lit(1d))) + lit(1d)

  /** Per-document top-k distinctive terms by TF-IDF (score rounded to
    * 6 decimals; ties broken by term). The vocabulary's doc-frequency
    * side is aggregated first (vocab-sized) and joined back to the
    * exploded terms — a bounded-key join, never doc × vocab.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = df.count()
    val terms = df.select(col(idCol).as("doc"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = terms.select(col("term"), col("doc")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    val w = Window.partitionBy(col("doc"))
      .orderBy(col("score").desc, col("term"))
    terms.join(dfreq, Seq("term"))
      .withColumn("score", round(col("tf") * idf(col("doc_freq"), n), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc"), col("term"), col("score"), col("rank"))
  }
}
