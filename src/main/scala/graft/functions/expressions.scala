package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType}

/** Custom scalar expressions (SURVEY §2.C). Each is a native Catalyst
  * `Expression` with `doGenCode` so it stays inside whole-stage codegen
  * — no UDF boxing, no codegen fallback in the hot decode path.
  */

/** `uint256_lo128(word, decimals)` — low-128-bit decode of a 0x-prefixed
  * 32-byte hex word into Double scaled by 10^-decimals.
  * Reference: /root/reference/utils.py:5-20 (generate_sql_for_value).
  */
case class Uint256Lo128(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(word: Any, decimals: Any): Any =
    HexOps.uint256Lo128(
      word.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      decimals.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, d) => s"graft.functions.HexOps.uint256Lo128($w, $d)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "uint256_lo128"
}

/** `uint256_hex(fragment, decimals)` — same decode over an already-
  * sliced hex fragment (no "0x"+word framing), for the Bancor two-word
  * `data` slices (/root/reference/operations/bancor_trades.py:27-39).
  */
case class Uint256FromHex(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(frag: Any, decimals: Any): Any =
    HexOps.uint256FromHex(
      frag.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      decimals.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (f, d) => s"graft.functions.HexOps.uint256FromHex($f, $d)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "uint256_hex"
}

/** `hex_be_to_long(s)` — parse big-endian hex (low 64 bits if longer)
  * into a Long, i.e. ClickHouse `reinterpretAsUInt64(reverse(unhex(s)))`
  * (/root/reference/utils.py:16-18).
  */
case class HexBeToLong(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(s: Any): Any =
    HexOps.hexBeToLong(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.HexOps.hexBeToLong($s)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "hex_be_to_long"
}

/** `hex_to_double(s)` — full-precision unsigned hex (optional 0x) to
  * Double, for trace value/gas fields (no low-128 truncation).
  */
case class HexToDouble(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(s: Any): Any =
    HexOps.hexToDouble(s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.HexOps.hexToDouble($s)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "hex_to_double"
}

/** Column-API entry points (the library's public scalar surface). */
object GraftFunctions {
  import GraftBridge.{column => toCol, expression => toExpr}

  def uint256_lo128(word: Column, decimals: Column): Column =
    toCol(Uint256Lo128(toExpr(word), toExpr(decimals)))
  def uint256_hex(fragment: Column, decimals: Column): Column =
    toCol(Uint256FromHex(toExpr(fragment), toExpr(decimals)))
  def hex_be_to_long(s: Column): Column =
    toCol(HexBeToLong(toExpr(s)))
  def hex_to_double(s: Column): Column =
    toCol(HexToDouble(toExpr(s)))
}
