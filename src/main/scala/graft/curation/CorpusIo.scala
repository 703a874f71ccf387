package graft.curation

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL corpus interchange — the format public training corpora
  * actually ship in (one JSON object per line, usually gzipped:
  * C4, The Pile, RedPajama, Dolma all distribute this way). Parquet
  * stays the internal format (columnar pruning, statistics); these are
  * the boundary adapters.
  *
  * Scale rules baked in:
  *  - the reader takes an EXPLICIT schema — Spark's schema inference
  *    reads the whole input once before the real scan, which at 100 TB
  *    is a full extra pass; corrupt lines land in a quarantine column
  *    instead of killing the job (PERMISSIVE + columnNameOfCorruptRecord)
  *    so one bad shard of a million can't stop ingestion;
  *  - the writer emits a DETERMINISTIC field order (the frame's column
  *    order) via to_json over a struct, one line per row — hadoop
  *    codecs (.gz etc.) apply per file; shard count is the frame's
  *    partitioning, so writers control file size with the same
  *    repartition/maxRecordsPerFile knobs as every other sink.
  */
object CorpusIo {

  /** Read a JSONL directory/glob with a pinned schema. Lines that do
    * not parse land whole in `_corrupt` (NULL everywhere else) so the
    * caller can count/quarantine them; `dropCorrupt = true` filters
    * them out after counting is no longer wanted.
    *
    * Parsed as `text` + `from_json` (the same Jackson parser the json
    * datasource uses) rather than `spark.read.json`: the datasource
    * refuses any query whose referenced columns are only the corrupt
    * record (`UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN`),
    * which is exactly the quarantine-count query this column exists
    * for. Blank lines are skipped like the datasource does.
    */
  def readJsonl(
      spark: SparkSession,
      path: String,
      schema: StructType,
      dropCorrupt: Boolean = false): DataFrame = {
    val withQuarantine = schema.add("_corrupt", "string")
    val df = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(from_json(col("value"), withQuarantine,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt")).as("j"))
      .select(col("j.*"))
    if (dropCorrupt) df.filter(col("_corrupt").isNull).drop("_corrupt")
    else df
  }

  /** Write a frame as JSONL, one object per row, fields in the frame's
    * column order. `codec` is any Hadoop compression codec short name
    * ("gzip", "none", …); `maxRecordsPerFile` bounds shard size.
    */
  def writeJsonl(
      df: DataFrame,
      path: String,
      codec: String = "gzip",
      maxRecordsPerFile: Long = 0L): Unit = {
    val line = to_json(struct(df.columns.map(col).toIndexedSeq: _*))
    df.select(line.as("value"))
      .write.mode("overwrite")
      .option("compression", codec)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .text(path)
  }

  /** ORC boundary adapters — the other columnar format corpora arrive
    * in (Hive-era warehouses ship ORC the way lakehouses ship
    * parquet). Spark's ORC support is native and columnar, so unlike
    * JSONL there is no schema-inference tax — the footer carries the
    * schema — and predicate pushdown / column pruning work exactly as
    * on parquet; these exist so ingestion from an ORC-shaped upstream
    * is one call, not a format detour through JSONL.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(
      df: DataFrame, path: String, maxRecordsPerFile: Long = 0L): Unit =
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .orc(path)
}
