package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.GraftFunctions._

/** Golden values ported from the reference's decoder tests
  * (/root/reference/tests/token_holders_tests.py:34-58) plus
  * seeded-random property tests against a BigInt model.
  */
class Uint256Spec extends SparkSpec {

  private def word(v: BigInt): String =
    "0x" + v.toString(16).reverse.padTo(64, '0').reverse

  test("golden: 22418.8 tokens at 18 decimals") {
    // 0x...04bf53596c1b5f580000 = 22418800000000000000000
    val v = BigInt("22418800000000000000000")
    assert(HexOps.uint256Lo128(
      org.apache.spark.unsafe.types.UTF8String.fromString(word(v)), 18) === 22418.8)
  }

  test("golden: smallest unit 1e-18") {
    assert(HexOps.uint256Lo128(
      org.apache.spark.unsafe.types.UTF8String.fromString(word(BigInt(1))), 18) === 1e-18)
  }

  test("golden: 2^124 at 0 decimals") {
    val v = BigInt(1) << 124
    assert(HexOps.uint256Lo128(
      org.apache.spark.unsafe.types.UTF8String.fromString(word(v)), 0)
      === math.pow(2, 124))
  }

  test("low-128-bit truncation: bits above 128 are dropped") {
    val v = (BigInt(1) << 129) + BigInt(42)
    assert(HexOps.uint256Lo128(
      org.apache.spark.unsafe.types.UTF8String.fromString(word(v)), 0) === 42.0)
  }

  test("expression evaluates in a DataFrame (codegen path)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (word(BigInt("22418800000000000000000")), 18),
      (word(BigInt(1)), 18),
      (word(BigInt(1) << 124), 0))
      .toDF("w", "d")
      .select(uint256_lo128(col("w"), col("d")).as("v"))
    assert(df.collect().map(_.getDouble(0)).toSeq ===
      Seq(22418.8, 1e-18, math.pow(2, 124)))
  }

  test("property: matches BigInt model for values < 2^128") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val v = BigInt(rnd.nextLong().abs) << 64 | BigInt(rnd.nextLong().abs)
      val d = rnd.nextInt(31)
      val got = HexOps.uint256Lo128(
        org.apache.spark.unsafe.types.UTF8String.fromString(word(v)), d)
      val expect = v.doubleValue / math.pow(10, d)
      assert(got === expect, s"v=$v d=$d")
    }
  }

  test("hex_be_to_long parses big-endian and takes low 64 bits") {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    assert(HexOps.hexBeToLong(u("ff")) === 255L)
    assert(HexOps.hexBeToLong(u("")) === 0L)
    assert(HexOps.hexBeToLong(u("0000000000000001ff")) === 511L) // low 64 bits
    assert(HexOps.hexBeToLong(u("ffffffffffffffff")) === -1L)    // reinterpret wrap
  }

  test("empty / short words decode to 0") {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    assert(HexOps.uint256Lo128(u("0x"), 18) === 0.0)
    assert(HexOps.uint256Lo128(u(""), 18) === 0.0)
  }
}
