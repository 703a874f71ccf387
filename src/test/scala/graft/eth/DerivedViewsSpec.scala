package graft.eth

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden cases ported from the reference's MV tests
  * (tests/token_holders_tests.py:60-105,
  * tests/contract_transactions_tests.py:53-78).
  */
class DerivedViewsSpec extends SparkSpec {

  private val transferTopic = DerivedViews.TransferTopic

  private def topicAddr(n: Int): String = "0x" + "%064x".format(n)
  private def dataWord(v: BigInt): String = "0x" + "%064x".format(v)

  test("tokenTransfers: decimals=17 scales 100e18 to 1000 (golden)") {
    val s = spark
    import s.implicits._
    val events = Seq(
      ("0x1.0", "0x1.0", 10L, Seq(transferTopic, topicAddr(1), topicAddr(2)),
        dataWord(BigInt(100) * BigInt(10).pow(18)), "0x01"),
      // non-Transfer event must be filtered out
      ("0x1.1", "0x", 1L, Seq("0x"), "0x", "0x01"))
      .toDF("id", "transactionHash", "blockNumber", "topics", "data", "address")
    val contracts = Seq(("0x01", Some(17))).toDF("id", "decimals")
    val got = DerivedViews.tokenTransfers(events, contracts).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[String]("from") === "0x" + "%040x".format(1))
    assert(r.getAs[String]("to") === "0x" + "%040x".format(2))
    assert(r.getAs[Double]("value") === 1000.0)
    assert(r.getAs[String]("token") === "0x01")
    assert(r.getAs[Long]("blockNumber") === 10L)
    assert(r.getAs[String]("id") === "0x1.0")
  }

  test("tokenTransfers: missing decimals falls back to 18") {
    val s = spark
    import s.implicits._
    val events = Seq(
      ("0x2.0", "0x2.0", 11L, Seq(transferTopic, topicAddr(3), topicAddr(4)),
        dataWord(BigInt(10).pow(18)), "0x02"))
      .toDF("id", "transactionHash", "blockNumber", "topics", "data", "address")
    val contracts = Seq(("0x02", None: Option[Int])).toDF("id", "decimals")
    val got = DerivedViews.tokenTransfers(events, contracts).head()
    assert(got.getAs[Double]("value") === 1.0)
  }

  test("tokenTransfers: ANY INNER join drops events without a contract") {
    val s = spark
    import s.implicits._
    val events = Seq(
      ("0x3.0", "0x3.0", 12L, Seq(transferTopic, topicAddr(5), topicAddr(6)),
        dataWord(1), "0xunknown"))
      .toDF("id", "transactionHash", "blockNumber", "topics", "data", "address")
    val contracts = Seq(("0x02", Some(18))).toDF("id", "decimals")
    assert(DerivedViews.tokenTransfers(events, contracts).count() === 0)
  }

  test("contracts MV: standard flags need EVERY selector in bytecode") {
    val s = spark
    import s.implicits._
    val allErc20 = Selectors.erc20.values.mkString("6060", "", "")
    val missingOne = Selectors.erc20.values.toSeq.drop(1).mkString("6060", "", "")
    val itx = Seq(
      ("0xc1", "create", null, "0xaddr1", "0xowner1", allErc20, 5L),
      ("0xc2", "create", null, "0xaddr2", "0xowner2", missingOne, 6L),
      ("0xc3", "call", null, "0xaddr3", "0xowner3", allErc20, 7L), // not a create
      ("0xc4", "create", "Out of gas", "0xaddr4", "0xowner4", allErc20, 8L)) // failed
      .toDF("id", "type", "error", "address", "from", "code", "blockNumber")
      .withColumn("parent_error", lit(null).cast("boolean"))
    val got = DerivedViews.contracts(itx).collect()
      .map(r => r.getAs[String]("id") -> r.getAs[Short]("standard_erc20")).toMap
    assert(got === Map("0xaddr1" -> 1.toShort, "0xaddr2" -> 0.toShort))
  }

  test("bancorTrades: data slices decode with per-token decimals") {
    val s = spark
    import s.implicits._
    // data = 0x + word1 (amount) + word2 (return)
    val amount = BigInt(5) * BigInt(10).pow(18)
    val ret = BigInt(3) * BigInt(10).pow(17)
    val data = "0x" + "%064x".format(amount) + "%064x".format(ret)
    val events = Seq(
      ("0xe.0", "0xe.0", 9L,
        Seq(DerivedViews.ConversionTopic, topicAddr(11), topicAddr(12), topicAddr(13)),
        data, "0xconv"))
      .toDF("id", "transactionHash", "blockNumber", "topics", "data", "address")
    val contracts = Seq(("0xconv", "0xconv", 1.toShort))
      .toDF("id", "address", "standard_bancor_converter")
    val fromToken = "0x" + "%040x".format(11)
    val toToken = "0x" + "%040x".format(12)
    val descriptions = Seq(
      (fromToken, Some(18)), (toToken, Some(17)))
      .toDF("id", "decimals")
    val got = DerivedViews.bancorTrades(events, contracts, descriptions).head()
    assert(got.getAs[String]("from_token") === fromToken)
    assert(got.getAs[String]("to_token") === toToken)
    assert(got.getAs[String]("trader") === "0x" + "%040x".format(13))
    // amount word is sliced to 64 chars then low-30-hex decoded: 5e18
    // fits in 120 bits, so the quirk is invisible for realistic values
    assert(got.getAs[Double]("amount") === 5.0)
    assert(got.getAs[Double]("return") === 3.0) // 3e17 / 10^17
  }

  test("bancorTrades: non-converter contracts are excluded") {
    val s = spark
    import s.implicits._
    val events = Seq(
      ("0xe.1", "0xe.1", 9L,
        Seq(DerivedViews.ConversionTopic, topicAddr(11), topicAddr(12), topicAddr(13)),
        "0x" + "0" * 128, "0xnotconv"))
      .toDF("id", "transactionHash", "blockNumber", "topics", "data", "address")
    val contracts = Seq(("0xnotconv", "0xnotconv", 0.toShort))
      .toDF("id", "address", "standard_bancor_converter")
    val descriptions = Seq(("0x0b", Some(18))).toDF("id", "decimals")
    assert(DerivedViews.bancorTrades(events, contracts, descriptions).count() === 0)
  }
}
