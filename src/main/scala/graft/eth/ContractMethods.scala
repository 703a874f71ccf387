package graft.eth

import java.math.BigInteger
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** eth_call boundary for constant-method probing. Production backs
  * this with a JSON-RPC client; tests use map-backed fixtures (the
  * reference tests probe a local parity the same way).
  */
trait EthCallSource extends Serializable {
  /** Hex-encoded return data of `eth_call {to, data}`, or None on
    * revert / no code / transport error.
    */
  def ethCall(to: String, data: String): Option[String]
}

/** ABI-registry boundary (the reference's etherscan `getabi`,
  * /root/reference/operations/contracts.py:9-35).
  */
trait AbiSource extends Serializable {
  def fetchAbi(address: String): Option[String]
}

/** B12/B13/B14 — the contract-metadata plane (reference:
  * /root/reference/operations/contract_methods.py:33-51,93-187 and
  * operations/contracts.py:55-72,112-122):
  *
  *  - probe each contract's ERC-20 constants (`name`,`symbol`,
  *    `decimals`,`totalSupply`,`owner`), trying `string` then `bytes32`
  *    for the text fields, with the reference's defaults
  *    ('', '', 18, 0, None);
  *  - scale totalSupply by 10^decimals and cap it — the reference caps
  *    at `1<<63-1`, which Python parses as `1<<(63-1)` = 2^62; the
  *    precedence artifact is PRESERVED for output parity;
  *  - join static token metadata (website_slug, cmc_id) from a
  *    tokens.json-shaped table (broadcast — it is a small dimension);
  *  - fetch ABIs per address; failures record `abi = NULL,
  *    abi_extracted = true` so the address is not retried.
  *
  * Shape at scale: one `mapPartitions` pass per adapter — the source
  * handle is initialized once per partition and addresses stream
  * through it (the Spark analog of the reference's Pool(10) fan-out).
  */
object ContractMethods {

  /** 2^62 — the reference's `1<<63-1` under Python precedence
    * (operations/contract_methods.py:12).
    */
  val TotalSupplyCap: Long = 1L << 62

  case class TokenProps(
      id: String,
      token_name: String,
      token_symbol: String,
      decimals: Short,
      total_supply: Long,
      token_owner: String)

  private def selector(name: String): String =
    "0x" + Abi.methodId(name, Seq.empty)

  private[eth] def hexToBytes(s0: String): Array[Byte] = {
    val s1 = if (s0.startsWith("0x")) s0.substring(2) else s0
    val s = if (s1.length % 2 == 1) "0" + s1 else s1
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  /** Decode a text return: dynamic `string` head/tail when the data is
    * long enough and offsets parse; else a `bytes32` with trailing
    * zeros trimmed (the two types the reference tries,
    * contract_methods.py:33-41).
    */
  private[eth] def decodeText(hex: String): Option[String] = {
    val bytes = hexToBytes(hex)
    if (bytes.isEmpty) return None
    def asDynamicString: Option[String] =
      try {
        val off = new BigInteger(1, java.util.Arrays.copyOfRange(bytes, 0, 32)).intValueExact()
        val len = new BigInteger(1, java.util.Arrays.copyOfRange(bytes, off, off + 32)).intValueExact()
        if (off + 32 + len > bytes.length) None
        else Some(new String(bytes, off + 32, len, StandardCharsets.UTF_8))
      } catch { case scala.util.control.NonFatal(_) => None }
    def asBytes32: Option[String] = {
      val w = java.util.Arrays.copyOf(bytes, 32)
      val end = w.lastIndexWhere(_ != 0) + 1
      if (end <= 0) None else Some(new String(w, 0, end, StandardCharsets.UTF_8))
    }
    if (bytes.length >= 64) asDynamicString.orElse(asBytes32) else asBytes32
  }

  private[eth] def decodeUint(hex: String): Option[BigInt] = {
    val bytes = hexToBytes(hex)
    if (bytes.isEmpty) None else Some(BigInt(new BigInteger(1, bytes)))
  }

  private[eth] def decodeAddress(hex: String): Option[String] = {
    val bytes = hexToBytes(hex)
    if (bytes.length < 32) None
    else {
      val addr = java.util.Arrays.copyOfRange(bytes, 12, 32)
      if (addr.forall(_ == 0)) None
      else Some("0x" + addr.map("%02x".format(_)).mkString)
    }
  }

  /** Probe one contract's ERC-20 constants with the reference's
    * defaults and totalSupply scaling/cap.
    */
  def probe(source: EthCallSource, address: String): TokenProps = {
    def call(method: String): Option[String] = source.ethCall(address, selector(method))
    val name = call("name").flatMap(decodeText).getOrElse("")
    val symbol = call("symbol").flatMap(decodeText).getOrElse("")
    val decimals = call("decimals").flatMap(decodeUint)
      .map(_.toShort).getOrElse(18.toShort)
    val supply = call("totalSupply").flatMap(decodeUint).map { raw =>
      val scaled = BigDecimal(raw) / BigDecimal(10).pow(decimals.toInt)
      if (scaled > BigDecimal(TotalSupplyCap)) TotalSupplyCap else scaled.toLong
    }.getOrElse(0L)
    val owner = call("owner").flatMap(decodeAddress).orNull
    TokenProps(address, name, symbol, decimals, supply, owner)
  }

  /** B12: contract_description rows for every address — one streamed
    * mapPartitions pass over the adapter.
    */
  def describeContracts(spark: SparkSession, addresses: DataFrame,
      source: EthCallSource): DataFrame = {
    import spark.implicits._
    addresses.select(col(addresses.columns.head).cast("string")).as[String]
      .mapPartitions { it => it.map(probe(source, _)) }
      .toDF()
  }

  /** B13: attach static token metadata (tokens.json shape: address,
    * website_slug, cmc_id) to contract descriptions. The metadata is a
    * small static dimension — broadcast, never shuffled.
    */
  def withTokenMetadata(descriptions: DataFrame, tokens: DataFrame): DataFrame = {
    val meta = tokens.select(
      col("address").as("id"), col("website_slug"), col("cmc_id"))
    descriptions.drop("website_slug", "cmc_id")
      .join(broadcast(meta), Seq("id"), "left")
  }

  /** B14: contract_abi rows; a failed fetch records abi = NULL with
    * abi_extracted = true so the address is never retried
    * (contracts.py:112-122).
    */
  def fetchAbis(spark: SparkSession, addresses: DataFrame,
      source: AbiSource): DataFrame = {
    import spark.implicits._
    addresses.select(col(addresses.columns.head).cast("string")).as[String]
      .mapPartitions { it =>
        it.map(a => (a, source.fetchAbi(a).orNull, true))
      }
      .toDF("id", "abi", "abi_extracted")
  }
}
