package graft.functions

import java.math.BigInteger

import org.apache.spark.unsafe.types.UTF8String

/** Scalar kernels for the hex/uint256 family. Static methods so the
  * generated (whole-stage codegen) Java can call them directly —
  * keeping these expressions inside codegen spans instead of falling
  * back to interpreted eval.
  *
  * Semantics model ClickHouse `generate_sql_for_value`
  * (/root/reference/utils.py:5-20): take the LOW 128 bits of a 0x-
  * prefixed 32-byte hex word, widen to Decimal128, convert once to
  * Float64, divide by 10^decimals.
  */
object HexOps {

  private val TWO_64 = BigInteger.ONE.shiftLeft(64)

  /** Parse a hex string (no 0x prefix) as an unsigned big-endian
    * integer; empty → 0. Equivalent to ClickHouse
    * `reinterpretAsUInt64(reverse(unhex(s)))` generalized past 64 bits.
    */
  def parseHexUnsigned(s: String): BigInteger =
    if (s.isEmpty) BigInteger.ZERO else new BigInteger(s, 16)

  /** reinterpretAsUInt64(reverse(unhex(s))): big-endian hex (≤16 chars,
    * longer inputs use the LAST 16 chars, i.e. the low 64 bits) → Long
    * bit pattern (unsigned beyond Long.MaxValue wraps to negative, as
    * reinterpret does).
    */
  def hexBeToLong(u: UTF8String): Long = {
    val s0 = u.toString
    val s = if (s0.length > 16) s0.substring(s0.length - 16) else s0
    if (s.isEmpty) 0L else java.lang.Long.parseUnsignedLong(s, 16)
  }

  /** Low-128-bit uint256 decode: `word` is the raw event/data field
    * ("0x" + 64 hex chars for a canonical 32-byte word; the reference
    * drops the first 34 chars unconditionally, utils.py:13). Returns
    * (high64 * 2^64 + low64) rounded ONCE to Double, then divided by
    * 10^decimals — bit-matching toFloat64(Decimal128)/POW(10,d).
    */
  def uint256Lo128(word: UTF8String, decimals: Int): Double = {
    val s = word.toString
    val partial = if (s.length <= 34) "" else s.substring(34)
    uint256FromHex(partial, decimals)
  }

  /** Same decode for an already-sliced hex fragment (no 0x handling) —
    * used by the Bancor path which slices `data` into two words first
    * (/root/reference/operations/bancor_trades.py:27-39).
    */
  def uint256FromHex(partial: String, decimals: Int): Double = {
    val n = partial.length
    val v =
      if (n == 0) BigInteger.ZERO
      else if (n <= 16) parseHexUnsigned(partial)
      else {
        val high = parseHexUnsigned(partial.substring(0, n - 16))
        val low = parseHexUnsigned(partial.substring(n - 16))
        high.multiply(TWO_64).add(low)
      }
    v.doubleValue() / math.pow(10d, decimals.toDouble)
  }

  def uint256FromHex(partial: UTF8String, decimals: Int): Double =
    uint256FromHex(partial.toString, decimals)

  /** Full-precision unsigned hex ("0x..." or bare) → Double, no 128-bit
    * truncation — the trace-flatten path (`int(value_string, 0)` in
    * /root/reference/operations/internal_transactions.py:297-301, which
    * is arbitrary-precision then float-divided). Empty/0x → 0.
    */
  def hexToDouble(u: UTF8String): Double = {
    val s0 = u.toString
    val s = if (s0.startsWith("0x") || s0.startsWith("0X")) s0.substring(2) else s0
    if (s.isEmpty) 0d else new BigInteger(s, 16).doubleValue()
  }
}
