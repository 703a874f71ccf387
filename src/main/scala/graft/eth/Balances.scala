package graft.eth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Joins

/** The balances query surface — exact formulas of the reference's
  * balances API (/root/reference/examples/balances_api/actions/
  * balances.py:3-83 and token_balances.py:3-35) and the batch
  * balances.sql archetype.
  *
  * Spark-first shape: instead of five separate SQL round-trips merged
  * in app code, the five role-aggregates are computed over scans of the
  * same table and full-outer-combined in one plan; the final formula is
  * max(income - outcome + reward - fee + fee_reward, 0).
  */
object Balances {

  /** ETH balances for a set of addresses. `internalTransactions` is
    * the FINAL (deduped) internal_transaction table.
    */
  def ethBalances(spark: SparkSession, internalTransactions: DataFrame,
      addresses: Seq[String]): DataFrame = {
    import spark.implicits._
    val addrs = addresses.toDF("address")
    val itx = internalTransactions

    // income: to-side, non-reward
    val income = itx.filter(col("type") =!= "reward" && col("to").isin(addresses: _*))
      .groupBy(col("to").as("address")).agg(sum(col("value")).as("income"))
    // outcome: from-side, non-reward
    val outcome = itx.filter(col("type") =!= "reward" && col("from").isin(addresses: _*))
      .groupBy(col("from").as("address")).agg(sum(col("value")).as("outcome"))
    // reward: author-side mining rewards
    val reward = itx.filter(col("type") === "reward" && col("author").isin(addresses: _*))
      .groupBy(col("author").as("address")).agg(sum(col("value")).as("reward"))
    // fee: gas spent by the sender (all rows, as in FEE_SQL)
    val fee = itx.filter(col("from").isin(addresses: _*))
      .groupBy(col("from").as("address"))
      .agg(sum(col("gasPrice") * col("gasUsed")).as("fee"))
    // fee_reward: per-block total fees credited to the block author
    val blockFees = itx.groupBy(col("blockNumber"))
      .agg(sum(col("gasPrice") * col("gasUsed")).as("block_fee"))
    val authors = itx.filter(
      col("type") === "reward" && col("rewardType") === "block" &&
        col("author").isin(addresses: _*))
      .select(col("author").as("address"), col("blockNumber"))
    val feeReward = Joins.anyJoin(authors, blockFees, Seq("blockNumber"), "inner")
      .groupBy(col("address")).agg(sum(col("block_fee")).as("fee_reward"))

    addrs
      .join(income, Seq("address"), "left")
      .join(outcome, Seq("address"), "left")
      .join(reward, Seq("address"), "left")
      .join(fee, Seq("address"), "left")
      .join(feeReward, Seq("address"), "left")
      .select(
        col("address"),
        greatest(lit(0.0),
          coalesce(col("income"), lit(0.0))
            - coalesce(col("outcome"), lit(0.0))
            + coalesce(col("reward"), lit(0.0))
            - coalesce(col("fee"), lit(0.0))
            + coalesce(col("fee_reward"), lit(0.0))).as("balance"))
  }

  /** Token balances for a set of addresses in one token:
    * max(income - outcome, 0) over token_transaction.
    */
  def tokenBalances(spark: SparkSession, tokenTransactions: DataFrame,
      addresses: Seq[String], token: String): DataFrame = {
    import spark.implicits._
    val addrs = addresses.toDF("address")
    val tt = tokenTransactions.filter(col("token") === token)
    val income = tt.filter(col("to").isin(addresses: _*))
      .groupBy(col("to").as("address")).agg(sum(col("value")).as("income"))
    val outcome = tt.filter(col("from").isin(addresses: _*))
      .groupBy(col("from").as("address")).agg(sum(col("value")).as("outcome"))
    addrs
      .join(income, Seq("address"), "left")
      .join(outcome, Seq("address"), "left")
      .select(
        col("address"),
        greatest(lit(0.0),
          coalesce(col("income"), lit(0.0)) - coalesce(col("outcome"), lit(0.0)))
          .as("balance"))
  }

  /** The batch balances.sql address universe: to ∪ from ∪ author
    * (examples/sql_balances/balances.sql:9-15).
    */
  def addressUniverse(internalTransactions: DataFrame): DataFrame =
    internalTransactions.select(col("to").as("address"))
      .unionByName(internalTransactions.select(col("from").as("address")))
      .unionByName(internalTransactions.select(col("author").as("address")))
      .filter(col("address").isNotNull)
      .distinct()
}
