package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The standard four-gate quality-signal bundle (Gopher heuristics,
  * blocklist, repetition, composite quality) — ONE definition shared
  * by the q195 dataset-card rollup and `TrainCli.taggers`, so the CLI
  * audit table and the per-source report can never disagree on what a
  * gate means.
  */
object QualityGates {

  /** Per-document pass flags + the all-gates `keep` decision, keeping
    * every column of `docs`. Three gates are map-side column
    * expressions; repetition is the one (doc, gram)-keyed aggregate,
    * joined back doc-keyed.
    *
    * Total on any input: a document that produces no n-gram row (NULL
    * text) still gets a row — `rep_pass` defaults to true (nothing
    * repeats in nothing) via the left join, the text-derived flags are
    * NULL, and `keep` coalesces to false, so an unauditable document
    * is visibly rejected rather than silently dropped from the audit.
    */
  def qualityFlags(
      docs: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String] = Seq.empty,
      minQuality: Double = 0.5,
      maxDupFrac: Double = 0.2,
      maxTopFrac: Double = 0.1): DataFrame = {
    val rep = Repetition.repetitionStats(docs, idCol, textCol, n = 2)
      .select(col(idCol),
        (col("dup_gram_frac") <= maxDupFrac &&
          col("top_gram_frac") <= maxTopFrac).as("__rep"))
    val blockPass =
      if (blocklist.isEmpty) lit(true)
      else !TextFunctions.containsBlocklisted(col(textCol), blocklist)
    docs
      .withColumn("gopher_pass",
        TextFunctions.gopherStats(col(textCol)).getField("pass"))
      .withColumn("block_pass", blockPass)
      .withColumn("qual_pass",
        TextFunctions.qualityScore(col(textCol)) >= minQuality)
      .join(rep, Seq(idCol), "left")
      .withColumn("rep_pass", coalesce(col("__rep"), lit(true)))
      .drop("__rep")
      .withColumn("keep",
        coalesce(col("gopher_pass") && col("block_pass") &&
          col("rep_pass") && col("qual_pass"), lit(false)))
  }
}
