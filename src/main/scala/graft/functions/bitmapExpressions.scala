package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Bitmap id-set aggregation — the ClickHouse `groupBitmap` /
  * Druid-segment idiom for cohort analytics over a BOUNDED integer id
  * universe: each group aggregates its member ids into one bitmap
  * (mergeable: OR), and set algebra between cohorts (who did A and B,
  * A but not B, …) becomes map-side byte-array intersection on rows
  * the size of the GROUP COUNT — no re-shuffle of the raw events, no
  * count-distinct expand per question asked.
  *
  * At 100 TB the bitmap is the materialized-audience pattern: build
  * once per (segment, day) partition, answer every pairwise cohort
  * question from the bitmaps alone. A dense `java.util.BitSet` backs
  * the buffer — exact, deterministic bytes (trailing zeros trimmed),
  * ~125 KB per million-id universe; ids must be 0 <= id < maxId with
  * maxId capped at 2^26 (8 MB buffer) to keep a mis-typed key from
  * allocating the world (roaring-style sparse compression is the
  * documented upgrade path for sparse universes).
  */
object BitmapOps {
  val MaxUniverse: Long = 1L << 26

  def count(b: Array[Byte]): Long =
    java.util.BitSet.valueOf(b).cardinality().toLong

  def andCount(a: Array[Byte], b: Array[Byte]): Long = {
    val x = java.util.BitSet.valueOf(a)
    x.and(java.util.BitSet.valueOf(b))
    x.cardinality().toLong
  }

  def orCount(a: Array[Byte], b: Array[Byte]): Long = {
    val x = java.util.BitSet.valueOf(a)
    x.or(java.util.BitSet.valueOf(b))
    x.cardinality().toLong
  }

  def andNotCount(a: Array[Byte], b: Array[Byte]): Long = {
    val x = java.util.BitSet.valueOf(a)
    x.andNot(java.util.BitSet.valueOf(b))
    x.cardinality().toLong
  }
}

/** `bitmap_ids(id)` — aggregate a group's int64 ids (0 <= id < 2^26)
  * into a bitmap (BinaryType, BitSet layout). Mergeable by OR.
  */
case class BitmapIdsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.BitSet] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): java.util.BitSet = new java.util.BitSet()

  override def update(buffer: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      require(id >= 0L && id < BitmapOps.MaxUniverse,
        s"bitmap_ids: id $id outside [0, ${BitmapOps.MaxUniverse})")
      buffer.set(id.toInt)
    }
    buffer
  }

  override def merge(buffer: java.util.BitSet, other: java.util.BitSet): java.util.BitSet = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: java.util.BitSet): Any = buffer.toByteArray

  override def serialize(buffer: java.util.BitSet): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): java.util.BitSet =
    java.util.BitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapIdsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapIdsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "bitmap_ids"
}

/** `bitmap_count(b)` — cardinality of a bitmap. Codegen'd kernel call. */
case class BitmapCount(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullSafeEval(b: Any): Any =
    BitmapOps.count(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.BitmapOps.count($b)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "bitmap_count"
}

/** `bitmap_and_count(a, b)` — |A ∩ B| without materializing the
  * intersection bitmap.
  */
case class BitmapAndCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    BitmapOps.andCount(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BitmapOps.andCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "bitmap_and_count"
}

/** `bitmap_or_count(a, b)` — |A ∪ B|. */
case class BitmapOrCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    BitmapOps.orCount(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BitmapOps.orCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "bitmap_or_count"
}

/** `bitmap_andnot_count(a, b)` — |A \ B| (did A, never did B). */
case class BitmapAndNotCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    BitmapOps.andNotCount(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BitmapOps.andNotCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "bitmap_andnot_count"
}

/** Column-API entry points for the bitmap family. */
object BitmapFunctions {
  import GraftBridge.{column => toCol, expression => toExpr}

  def bitmap_ids(id: Column): Column =
    // Cast to LongType mirrors the SQL registration in GraftExtensions:
    // without it an IntegerType id column reaches update()'s
    // asInstanceOf[Long] and fails at runtime.
    toCol(BitmapIdsAgg(
      org.apache.spark.sql.catalyst.expressions.Cast(toExpr(id), LongType)
    ).toAggregateExpression())
  def bitmap_count(b: Column): Column = toCol(BitmapCount(toExpr(b)))
  def bitmap_and_count(a: Column, b: Column): Column =
    toCol(BitmapAndCount(toExpr(a), toExpr(b)))
  def bitmap_or_count(a: Column, b: Column): Column =
    toCol(BitmapOrCount(toExpr(a), toExpr(b)))
  def bitmap_andnot_count(a: Column, b: Column): Column =
    toCol(BitmapAndNotCount(toExpr(a), toExpr(b)))
}
