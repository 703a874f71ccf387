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

  /** The five per-address aggregates of the balances API — one row per
    * requested address with income / outcome / reward / fee /
    * fee_reward (missing components 0, mirroring the reference's
    * `dict.get(address, 0)`) — INCOME_SQL through FEE_REWARD_SQL of
    * actions/balances.py:3-49 in one plan.
    */
  def balanceComponents(spark: SparkSession, internalTransactions: DataFrame,
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
      .select(col("address"),
        coalesce(col("income"), lit(0.0)).as("income"),
        coalesce(col("outcome"), lit(0.0)).as("outcome"),
        coalesce(col("reward"), lit(0.0)).as("reward"),
        coalesce(col("fee"), lit(0.0)).as("fee"),
        coalesce(col("fee_reward"), lit(0.0)).as("fee_reward"))
  }

  /** ETH balances for a set of addresses. `internalTransactions` is
    * the FINAL (deduped) internal_transaction table.
    */
  def ethBalances(spark: SparkSession, internalTransactions: DataFrame,
      addresses: Seq[String]): DataFrame =
    balanceComponents(spark, internalTransactions, addresses)
      .select(
        col("address"),
        greatest(lit(0.0),
          col("income") - col("outcome") + col("reward")
            - col("fee") + col("fee_reward")).as("balance"))

  /** The serving contract of `POST /balances/` (server.py:8-12): the
    * address → clamped-balance map, every requested address present.
    * The collect is bounded by the request payload, not the chain.
    */
  def ethBalanceMap(spark: SparkSession, internalTransactions: DataFrame,
      addresses: Seq[String]): Map[String, Double] =
    ethBalances(spark, internalTransactions, addresses)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  /** The serving contract of `POST /token_balances/<token>`
    * (server.py:14-18).
    */
  def tokenBalanceMap(spark: SparkSession, tokenTransactions: DataFrame,
      addresses: Seq[String], token: String): Map[String, Double] =
    tokenBalances(spark, tokenTransactions, addresses, token)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

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

  /** The exact batch `balances.sql` formula
    * (examples/sql_balances/balances.sql:1-63) for EVERY address in the
    * universe. This intentionally diverges from the API formula
    * ([[ethBalances]]) where the reference's two archetypes diverge:
    *
    *  - block fees credit FIRST traces only (`id LIKE '%.0'`, line 24)
    *    where the API sums fees over all traces of the block;
    *  - fee and outcome come from ONE un-type-filtered `from`-grouping
    *    (lines 37-41) — no `type != 'reward'` guard;
    *  - income requires `value > 0` (lines 57-60);
    *  - there is NO zero clamp — balances can go negative.
    *
    * Every aggregate's key is unique by construction (post-groupBy), so
    * the SQL's ANY LEFT JOINs reduce to plain left joins; the one place
    * ANY semantics bite (one author row per block, line 27-34) goes
    * through [[Joins.anyJoin]]. All five aggregates are partial
    * (map-side combine) and shuffle on their keys only.
    */
  def batchBalances(internalTransactions: DataFrame): DataFrame = {
    val itx = internalTransactions
    val blockFees = itx.filter(col("id").endsWith(".0"))
      .groupBy(col("blockNumber"))
      .agg(sum(col("gasPrice") * col("gasUsed")).as("block_fee"))
    val authors = itx
      .filter(col("type") === "reward" && col("rewardType") === "block")
      .select(col("author").as("address"), col("blockNumber"))
    val feeReward = Joins.anyJoin(blockFees, authors, Seq("blockNumber"), "inner")
      .groupBy(col("address")).agg(sum(col("block_fee")).as("fee_reward"))
    val fromAgg = itx.groupBy(col("from").as("address"))
      .agg(sum(col("gasPrice") * col("gasUsed")).as("fee"),
        sum(col("value")).as("outcome"))
    val rewardAgg = itx.filter(col("type") === "reward")
      .groupBy(col("author").as("address")).agg(sum(col("value")).as("reward"))
    val incomeAgg = itx.filter(col("value") > 0 && col("type") =!= "reward")
      .groupBy(col("to").as("address")).agg(sum(col("value")).as("income"))
    addressUniverse(itx)
      .join(feeReward, Seq("address"), "left")
      .join(fromAgg, Seq("address"), "left")
      .join(rewardAgg, Seq("address"), "left")
      .join(incomeAgg, Seq("address"), "left")
      .select(
        col("address"),
        (coalesce(col("fee_reward"), lit(0.0))
          - coalesce(col("fee"), lit(0.0))
          - coalesce(col("outcome"), lit(0.0))
          + coalesce(col("reward"), lit(0.0))
          + coalesce(col("income"), lit(0.0))).as("balance"))
  }

  /** balances.sql's `INTO OUTFILE 'balances.csv' FORMAT CSVWithNames`
    * tail (lines 61-63): the full universe balance dump as headered CSV.
    */
  def batchBalancesCsv(internalTransactions: DataFrame, path: String): Unit =
    graft.core.Sinks.writeCsv(batchBalances(internalTransactions), path,
      singleFile = true)
}
