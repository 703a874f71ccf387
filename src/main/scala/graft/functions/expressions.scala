package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
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

/** Bit-interleave kernels for space-filling-curve layout keys. */
object ZOps {
  /** Spread the low 31 bits of `v` onto even bit positions (0,2,…,60)
    * — the classic mask-and-shift Morton spread; 31 bits per dim keeps
    * the interleaved key strictly positive in signed int64 on every
    * engine (no overflow semantics in play).
    */
  def part1by1(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton/Z-value of (x, y): x on even bits, y on odd. */
  def interleave(x: Long, y: Long): Long =
    part1by1(x) | (part1by1(y) << 1)

  /** Spread the low 21 bits of `v` onto every third bit position
    * (0,3,…,60) — the 3-D Morton spread; 21 bits/dim keeps the
    * 63-bit key strictly positive in signed int64.
    */
  def part1by2(v: Long): Long = {
    var x = v & 0x1FFFFFL
    x = (x | (x << 32)) & 0x1F00000000FFFFL
    x = (x | (x << 16)) & 0x1F0000FF0000FFL
    x = (x | (x << 8)) & 0x100F00F00F00F00FL
    x = (x | (x << 4)) & 0x10C30C30C30C30C3L
    x = (x | (x << 2)) & 0x1249249249249249L
    x
  }

  /** 3-D Morton/Z-value of (x, y, z). */
  def interleave3(x: Long, y: Long, z: Long): Long =
    part1by2(x) | (part1by2(y) << 1) | (part1by2(z) << 2)
}

/** `z_interleave(x, y)` — Morton-interleave the low 31 bits of two
  * int64 dimension keys into one Z-curve layout key (codegen'd; the
  * sort key for multi-dimensional data clustering — see
  * [[graft.core.Layout]]).
  */
case class ZInterleave(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any, y: Any): Any =
    ZOps.interleave(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.ZOps.interleave($x, $y)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "z_interleave"
}

/** `z_interleave3(x, y, z)` — 3-D Morton key of three int64 dimension
  * keys (21 bits each; codegen'd): the layout key for tables filtered
  * on THREE columns at once (tenant × time × key is the common shape),
  * where a 2-D curve leaves the third dimension unpruned.
  */
case class ZInterleave3(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, LongType, LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any, y: Any, z: Any): Any =
    ZOps.interleave3(x.asInstanceOf[Long], y.asInstanceOf[Long],
      z.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (x, y, z) => s"graft.functions.ZOps.interleave3($x, $y, $z)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "z_interleave3"
}

/** Static kernel for [[RangeLookup]] — the binary search lives here so
  * both `eval` and the generated code call the same compiled method.
  */
object RangeLookupOps {
  /** Index of the interval `[los(i), his(i))` containing `p`, or -1.
    * Requires `los` ascending and intervals non-overlapping (validated
    * once where the dictionary is built, not per row).
    */
  def find(los: Array[Long], his: Array[Long], p: Long): Int = {
    var i = java.util.Arrays.binarySearch(los, p)
    if (i < 0) i = -i - 2 // insertion point - 1 = last lo <= p
    if (i >= 0 && p < his(i)) i else -1
  }
}

/** `range_lookup(point)` against a BROADCAST sorted interval dictionary
  * — the map-side O(log m) plan for point-in-interval enrichment (IP →
  * geo block, ts → maintenance window, id → tier) when the dictionary
  * fits in memory. The alternatives Catalyst would pick from a DECLARED
  * `p >= lo AND p < hi` join are a BroadcastNestedLoopJoin (O(m) per
  * row) or, via [[graft.plans.IntervalJoinRewrite]], a bucketed
  * equi-join (a shuffle + explode fan-out); for a dimension-sized
  * dictionary this expression does the same work with NO join operator
  * at all, inside whole-stage codegen.
  *
  * The sorted bound/id arrays ride along as REFERENCE OBJECTS in the
  * generated code (not source literals), so dictionary size never
  * blows up codegen; they ship to executors once per task binary, the
  * same way any broadcast hash relation does. Returns the matching
  * interval's id, or NULL when no interval contains the point —
  * callers choose inner (filter) or left (keep null) semantics.
  * Build through [[graft.core.Joins.rangeDictJoin]], which validates
  * sortedness/non-overlap once.
  */
case class RangeLookup(child: Expression,
    los: Array[Long], his: Array[Long], ids: Array[Long])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(p: Any): Any = {
    val i = RangeLookupOps.find(los, his, p.asInstanceOf[Long])
    if (i < 0) null else ids(i)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val losRef = ctx.addReferenceObj("rangeLos", los, "long[]")
    val hisRef = ctx.addReferenceObj("rangeHis", his, "long[]")
    val idsRef = ctx.addReferenceObj("rangeIds", ids, "long[]")
    val idx = ctx.freshName("rangeIdx")
    nullSafeCodeGen(ctx, ev, p => s"""
      int $idx = graft.functions.RangeLookupOps.find($losRef, $hisRef, $p);
      if ($idx < 0) { ${ev.isNull} = true; } else { ${ev.value} = $idsRef[$idx]; }
    """)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "range_lookup"
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
  def z_interleave(x: Column, y: Column): Column =
    toCol(ZInterleave(toExpr(x), toExpr(y)))
  def z_interleave3(x: Column, y: Column, z: Column): Column =
    toCol(ZInterleave3(toExpr(x), toExpr(y), toExpr(z)))
  def range_lookup(point: Column,
      los: Array[Long], his: Array[Long], ids: Array[Long]): Column =
    toCol(RangeLookup(toExpr(point), los, his, ids))
}
