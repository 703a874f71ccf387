package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-level lexical statistics per document — the quality
  * features a curation gate reads that SCALAR passes can't produce:
  * character-entropy (noise/gibberish and encoding-mojibake detector),
  * type-token ratio and hapax ratio (vocabulary richness vs template
  * repetition). Low entropy = repeated filler; low TTR + low hapax =
  * boilerplate; high entropy + high hapax = natural prose (or noise —
  * the two features separate those).
  *
  * Scale shape: two explode→count chains (token-sized and char-sized,
  * the Vocab/collocation shuffle family, keyed by (doc, unit) then
  * doc) joined per doc — nothing corpus-global, no windows, no
  * driver-side state.
  *
  * Exactness: ratios are exact integer divisions onto the 1e-6 grid;
  * entropy terms (c/n)·ln(n/c) are floored to int64 at 1e9 and summed
  * as int64 (no float-sum order dependence), reported in NATS — `ln`
  * is the cross-engine-exact primitive this repo's oracles already
  * rely on (BM25, JS-divergence).
  */
object Lexical {

  def lexicalStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val d = docs.filter(col(textCol).isNotNull)
    val words = d
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        sum(col("c")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        count(when(col("c") === 1, 1)).as("n_hapax"))
    val lens = d.select(col(idCol), length(col(textCol)).cast("long").as("n"))
    val ent = d
      .select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .groupBy(col(idCol), col("ch"))
      .agg(count(lit(1)).as("c"))
      .join(lens, idCol)
      .groupBy(col(idCol))
      .agg(sum(
        floor((col("c") / col("n")) * log(col("n") / col("c")) * lit(1e9))
          .cast("long")).as("ent_fx"))
    words
      .join(ent, Seq(idCol), "left")
      .select(
        col(idCol), col("n_words"), col("n_distinct"), col("n_hapax"),
        (expr("(n_distinct * 1000000L) div n_words").cast("double") / lit(1e6))
          .as("ttr"),
        (expr("(n_hapax * 1000000L) div n_distinct").cast("double") / lit(1e6))
          .as("hapax_ratio"),
        (expr("coalesce(ent_fx, 0L) div 1000").cast("double") / lit(1e6))
          .as("char_entropy"))
  }
}
