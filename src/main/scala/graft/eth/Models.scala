package graft.eth

import java.sql.Timestamp

/** Case-class models for the chain tables — the typed core promised in
  * SURVEY §1.1: `Dataset[T]` where compile-time field safety helps
  * (pipeline internals, tests), `DataFrame` at the dynamic SQL
  * boundary. Field names/types mirror [[Schemas]] exactly (reference
  * schema: /root/reference/schema/schema.py:1-82); Scala keywords are
  * backticked, nullable columns are Options.
  */
object Models {

  case class Block(number: Long, timestamp: Option[Timestamp], id: String)

  case class BlockFlag(id: String, name: String, value: Option[Short])

  case class ContractBlock(id: String, name: String, value: Option[Long])

  case class ContractAbi(id: String, abi: Option[String],
      abi_extracted: Option[Boolean])

  case class Event(
      `type`: Option[String],
      logIndex: Option[Int],
      transactionLogIndex: Option[Int],
      data: Option[String],
      transactionIndex: Option[Int],
      address: Option[String],
      transactionHash: Option[String],
      blockHash: Option[String],
      blockNumber: Option[Long],
      topics: Option[Seq[String]],
      id: String)

  case class TokenTransaction(
      `from`: Option[String],
      to: Option[String],
      value: Option[Double],
      id: String,
      token: Option[String],
      transactionHash: Option[String],
      blockNumber: Option[Long])

  case class DecodedParam(`type`: Option[String], value: Option[String])

  case class DecodedInput(
      id: String,
      name: Option[String],
      params: Option[Seq[DecodedParam]],
      blockNumber: Option[Long])

  case class Contract(
      id: String,
      blockNumber: Option[Long],
      address: Option[String],
      owner: Option[String],
      bytecode: Option[String],
      standard_erc20: Option[Short],
      standard_erc223: Option[Short],
      standard_bancor_converter: Option[Short])

  case class ContractDescription(
      token_name: Option[String],
      token_symbol: Option[String],
      decimals: Option[Short],
      total_supply: Option[Long],
      token_owner: Option[String],
      cmc_id: Option[String],
      website_slug: Option[String],
      id: String)

  case class Price(
      address: Option[String],
      USD: Option[Double],
      BTC: Option[Double],
      ETH: Option[Double],
      timestamp: Option[Timestamp],
      id: String)

  case class InternalTransaction(
      blockNumber: Option[Long],
      `from`: Option[String],
      to: Option[String],
      value: Option[Double],
      input: Option[String],
      output: Option[String],
      gas: Option[String],
      gasUsed: Option[Long],
      gasPrice: Option[Double],
      blockHash: Option[String],
      transactionHash: Option[String],
      transactionPosition: Option[Int],
      subtraces: Option[Int],
      traceAddress: Option[Seq[Int]],
      `type`: Option[String],
      callType: Option[String],
      address: Option[String],
      code: Option[String],
      init: Option[String],
      refundAddress: Option[String],
      error: Option[String],
      parent_error: Option[Boolean],
      balance: Option[String],
      author: Option[String],
      rewardType: Option[String],
      result: Option[String],
      id: String)
}
