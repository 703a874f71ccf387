package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextFunctions

/** Corpus-curation operators: deterministic sampling and the composed
  * end-to-end filter chain a training-data pipeline runs before
  * tokenization.
  *
  * Scale notes (100 TB): hash sampling is map-only — no RNG state, no
  * shuffle, no per-partition order dependence — and is reproducible
  * across engines, runs, and cluster sizes (the key derives from
  * CONTENT, so adding executors or reordering splits cannot change the
  * sample). `curateCorpus` composes only bounded-key joins (content
  * hash, shingle postings) and semi/anti joins; nothing quadratic.
  */
object Curation {

  /** 60-bit md5-derived sample key of `id` — uniform on [0, 2^60),
    * identical to DuckDB's `('0x'||substr(md5(id::VARCHAR),1,15))::BIGINT`
    * (same engine-agnostic derivation as SketchOps.md5Top60).
    */
  def hashSampleKey(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** The `fraction` → key-threshold mapping shared with the oracles. */
  def sampleThreshold(fraction: Double): Long =
    (fraction * (1L << 60).toDouble).toLong

  /** Deterministic Bernoulli-style sample: keeps rows whose hash key
    * falls under `fraction` of the key space. Unlike `df.sample`
    * (seeded RNG walked in partition order), the decision is a pure
    * function of the row's id.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(hashSampleKey(col(idCol)) < lit(sampleThreshold(fraction)))

  /** Stratified deterministic sample: per-stratum fractions with a
    * default for unlisted strata. One map-only filter — the per-stratum
    * threshold is a CASE over the stratum column, so no split/union and
    * no extra pass per stratum.
    */
  def stratifiedHashSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    val threshold = fractions.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (stratum, f)) =>
        acc.when(col(strataCol) === stratum, lit(sampleThreshold(f)))
    }.otherwise(lit(sampleThreshold(defaultFraction)))
    df.filter(hashSampleKey(col(idCol)) < threshold)
  }

  /** End-to-end corpus curation — the composition run before training:
    *
    *  1. exact dedup: one survivor (min id) per distinct content hash;
    *  2. near-dup collapse: n-gram Jaccard pairs (>= tau) over the
    *     exact survivors, every doc paired with a smaller doc drops
    *     (greedy min-keeper, exact for clusters of diameter <= 2 —
    *     see Dedup.collapsePairs);
    *  3. quality gate: language-ID == `lang` and composite quality
    *     score >= `minQuality`.
    *
    * Returns surviving `(id, lang_pred, quality, wc)` rows. Every stage
    * is a bounded-key join or a map-only filter; the near-dup stage is
    * the inverted-index Jaccard join (never |D|^2).
    */
  def curateCorpus(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      tau: Double = 0.5,
      minQuality: Double = 0.5,
      lang: String = "en"): DataFrame = {
    val survivors = Dedup.exactDedupSurvivors(docs, idCol, textCol)
      .select(col("survivor_id").as(idCol))
    val exactKept = docs.join(survivors, Seq(idCol), "left_semi")
    val pairs = Dedup.jaccardPairs(exactKept, idCol, textCol, n, tau)
    val drops = Dedup.collapsePairs(pairs).select(col("drop").as(idCol))
    val kept = exactKept.join(drops, Seq(idCol), "left_anti")
    kept.select(
      col(idCol),
      TextFunctions.langId(col(textCol)).as("lang_pred"),
      TextFunctions.qualityScore(col(textCol)).as("quality"),
      TextFunctions.tokenCountWs(col(textCol)).cast("long").as("wc"))
      .filter(col("lang_pred") === lang && col("quality") >= minQuality)
  }
}
