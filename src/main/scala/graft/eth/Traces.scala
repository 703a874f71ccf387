package graft.eth

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Internal-transaction (trace) dataflow operators — the Spark
  * re-expression of the reference's trace ETL
  * (/root/reference/operations/internal_transactions.py):
  *
  *  - B8 flatten: splice nested action/result structs to top level,
  *    hex→float conversions (lines 276-303)
  *  - B5 enrich: copy gasUsed/gasPrice from chain transactions
  *    (lines 98-131)
  *  - B6 id assignment: "{txHash}.{posInTrace}" (lines 235-251)
  *  - B7 parent-error propagation (lines 253-274)
  *  - B9 genesis bootstrap (lines 342-361)
  *
  * All operators are narrow or key-partitioned: per-transaction logic
  * shuffles on the transaction hash only, never globally.
  */
object Traces {

  /** B8: splice `action`/`result` struct fields into the top level
    * (struct fields win over same-named top-level ones, matching
    * dict.update semantics), then convert hex value/gasPrice to ETH
    * doubles (/1e18) and gasUsed to a long via the reference's exact
    * double round-trip `int(int(hex,0)/1e18*1e18)`.
    */
  def flatten(raw: DataFrame): DataFrame = {
    val structCols = Seq("action", "result").filter(raw.columns.contains)
    val spliced = structCols.foldLeft(raw) { (df, sc) =>
      val fields = df.schema(sc).dataType
        .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
      fields.foldLeft(df) { (d, f) =>
        d.withColumn(f, coalesce(col(s"$sc.$f"),
          if (d.columns.contains(f) && !structCols.contains(f)) col(f) else lit(null)))
      }.drop(sc)
    }
    val withValue =
      if (spliced.columns.contains("value"))
        spliced.withColumn("value",
          when(col("value").isNull, lit(null).cast("double"))
            .otherwise(GraftFunctions.hex_to_double(col("value")) / 1e18))
      else spliced
    if (withValue.columns.contains("gasUsed"))
      withValue.withColumn("gasUsed",
        when(col("gasUsed").isNull, lit(null).cast("long"))
          .otherwise((GraftFunctions.hex_to_double(col("gasUsed")) / 1e18 * 1e18).cast("long")))
    else withValue
  }

  /** B5: hash-join traces to chain transactions on
    * (transactionHash, blockHash), copying gasPrice (hex → ETH double,
    * the whitelist fields of lines 98-131).
    */
  def enrich(traces: DataFrame, transactions: DataFrame): DataFrame = {
    val txs = transactions.select(
      col("transactionHash"), col("blockHash"),
      (GraftFunctions.hex_to_double(col("gasPrice")) / 1e18).as("gasPrice"))
    traces.join(broadcastIfSmall(txs), Seq("transactionHash", "blockHash"), "left")
  }

  private def broadcastIfSmall(df: DataFrame): DataFrame = df // AQE decides; hook point

  /** B6: id = "{transactionHash|blockHash}.{position}" with position =
    * per-transaction arrival order. The reference numbers traces in RPC
    * arrival order; the deterministic Spark equivalent orders by
    * traceAddress lexicographically (parity emits depth-first order,
    * which traceAddress encodes).
    */
  def assignIds(df: DataFrame): DataFrame = {
    val key = coalesce(col("transactionHash"), col("blockHash"))
    val w = Window.partitionBy(key).orderBy(col("traceAddress"))
    df.withColumn("id", concat(key, lit("."), (row_number().over(w) - 1).cast("string")))
  }

  /** B7: mark every strict descendant of a failed trace with
    * parent_error=true (NULL otherwise — the contracts MV filters on
    * `parent_error IS NULL`). Descendant test: some errored
    * traceAddress is a PREFIX of this row's traceAddress, and this row
    * is not itself an errored node (pygtrie shortest_prefix/has_key
    * semantics of the reference).
    */
  def propagateParentErrors(df: DataFrame): DataFrame = {
    val errors = df.filter(col("error").isNotNull && col("transactionHash").isNotNull)
      .groupBy(col("transactionHash").as("__tx"))
      .agg(collect_list(col("traceAddress")).as("__errs"))
    val isPrefix: Column = exists(col("__errs"),
      e => size(col("traceAddress")) >= size(e) &&
        slice(col("traceAddress"), lit(1), size(e)) === e)
    val isErrNode: Column = exists(col("__errs"), e => e === col("traceAddress"))
    df.join(errors, col("transactionHash") === col("__tx"), "left")
      .withColumn("parent_error",
        when(col("__errs").isNotNull && isPrefix && !isErrNode, lit(true))
          .otherwise(lit(null).cast("boolean")))
      .drop("__tx", "__errs")
  }

  /** B9: genesis allocations → pseudo-transactions in block 0
    * (id/hash "GENESIS_{address}", value already in ETH).
    */
  def genesisTransactions(allocations: DataFrame): DataFrame =
    allocations.select(
      lit(0L).as("blockNumber"),
      col("address").as("to"),
      col("value").cast("double").as("value"),
      lit("genesis").as("type"),
      concat(lit("GENESIS_"), col("address")).as("id"))

  /** Full normalize chain for one batch of raw traces + transactions. */
  def normalize(rawTraces: DataFrame, transactions: DataFrame): DataFrame =
    propagateParentErrors(assignIds(enrich(flatten(rawTraces), transactions)))
}
