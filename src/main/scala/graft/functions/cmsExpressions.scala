package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode & Muthukrishnan '05) as a native
  * mergeable aggregate: `depth` hash rows × `width` int64 counters;
  * every value increments one counter per row, point estimates are the
  * MIN over rows — overcounts (by collision mass ≤ 2N/width at the
  * usual 1/e confidence grid), never undercounts. Completes the
  * mergeable-summary family beside `misra_gries` (which keeps only the
  * head) with full-domain frequency estimates in `depth·width` longs —
  * the shuffle payload is the fixed grid, not the value universe.
  *
  * Hashes are md5-derived (`row j: parse first 15 hex chars of
  * md5("j:" + value) as int64, mod width`) — the same public
  * derivation the LogisticRegression bucketer uses, so an independent
  * SQL engine REPLAYS the sketch counter-for-counter (the q151 oracle
  * does exactly that; no rows-only downgrade for an approximate
  * operator).
  *
  * Determinism: the counter grid is a pure function of the input
  * MULTISET — update order, partitioning, and merge shape are
  * invisible (integer adds commute) — so the aggregate is
  * hash-compare-safe at any scale.
  */
case class CmsSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, "cms depth must be in [1,16]")
  require(width >= 1, "cms width must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var j = 0
      while (j < depth) {
        buffer(j * width + CmsSketchAgg.bucket(j, s, width)) += 1L
        j += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    new GenericArrayData(buffer.map(Long.box).asInstanceOf[Array[Any]])

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "cms_sketch"
}

object CmsSketchAgg {
  // one digest per thread: getInstance per call measured 13.7 s for
  // q151 at sf0.1 (750k digests); reuse + byte math brings the kernel
  // to digest cost alone
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue() = java.security.MessageDigest.getInstance("MD5")
  }

  /** Row-j bucket of a value: first 15 md5 hex chars of `"j:" + v`
    * (60 bits, fits int64 non-negative) mod width — replayable in SQL
    * as `('0x' || substr(md5(j || ':' || v), 1, 15))::BIGINT % width`.
    * Computed without hex formatting: the first 15 hex chars ARE the
    * top 60 bits of the digest, i.e. big-endian(bytes 0..7) >>> 4.
    */
  def bucket(j: Int, v: String, width: Int): Int = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(s"$j:$v".getBytes("UTF-8"))
    var top = 0L
    var i = 0
    while (i < 8) { top = (top << 8) | (bytes(i) & 0xffL); i += 1 }
    ((top >>> 4) % width).toInt
  }
}

/** Column-level entry points for the CMS family. */
object CmsFunctions {

  /** The sketch: array<bigint> of `depth·width` counters, row-major. */
  def cmsSketch(c: Column, depth: Int, width: Int): Column =
    GraftBridge.column(
      CmsSketchAgg(GraftBridge.eagerExpression(c.cast("string")), depth, width)
        .toAggregateExpression())

  /** Point estimate from a sketch column: min over rows of each row's
    * bucket counter for `value` — composed from codegen'd built-ins
    * (md5/conv/element_at), no UDF. Overcounts, never undercounts.
    */
  def cmsEstimate(sketch: Column, value: Column, depth: Int, width: Int): Column = {
    val v = value.cast("string")
    val perRow = (0 until depth).map { j =>
      val b = pmod(
        conv(substring(md5(concat(lit(s"$j:"), v)), 1, 15), 16, 10).cast("long"),
        lit(width.toLong))
      element_at(sketch, (lit(j * width) + b + 1).cast("int"))
    }
    least(perRow: _*)
  }
}
