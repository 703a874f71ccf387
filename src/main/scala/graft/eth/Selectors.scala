package graft.eth

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** EVM method selectors for the `standard_*` contract-classification
  * flags (reference: /root/reference/operations/contract_transactions.py:29-75).
  * Selectors are computed once at class-load from the public method
  * signatures via our Keccak-256.
  */
object Selectors {

  val erc20: Map[String, String] = Map(
    "totalSupply" -> Keccak256.selector("totalSupply()"),
    "balanceOf" -> Keccak256.selector("balanceOf(address)"),
    "allowance" -> Keccak256.selector("allowance(address,address)"),
    "transfer" -> Keccak256.selector("transfer(address,uint256)"),
    "transferFrom" -> Keccak256.selector("transferFrom(address,address,uint256)"),
    "approve" -> Keccak256.selector("approve(address,uint256)"))

  val erc223: Map[String, String] = Map(
    "tokenFallback" -> Keccak256.selector("tokenFallback(address,uint256,bytes)"))

  val bancorConverter: Map[String, String] = Map(
    "convert" -> Keccak256.selector("convert(address,address,uint256,uint256)"))

  val standards: Map[String, Map[String, String]] = Map(
    "standard_erc20" -> erc20,
    "standard_erc223" -> erc223,
    "standard_bancor_converter" -> bancorConverter)

  /** `bytecode LIKE '%sig%' AND ...` for every selector of a standard,
    * as a 0/1 ShortType column (UInt8 in the reference schema).
    */
  def standardFlag(bytecode: Column, selectors: Map[String, String]): Column =
    selectors.values.toSeq.sorted
      .map(sig => bytecode.contains(sig))
      .reduce(_ && _).cast("short")

  /** All three standard_* flag columns. */
  def standardFlags(bytecode: Column): Seq[Column] =
    standards.toSeq.sortBy(_._1).map { case (name, sigs) =>
      standardFlag(bytecode, sigs).as(name)
    }
}
