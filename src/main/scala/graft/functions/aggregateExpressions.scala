package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a native aggregate — the
  * bounded-memory, MERGEABLE frequency sketch (Agarwal et al.,
  * "Mergeable Summaries", PODS'12) for token/host/key frequency over
  * corpora whose exact distinct-count aggregate would not fit: each
  * partial keeps at most `capacity` counters, merges sum counter maps
  * then re-reduce, and every reported count is exact-to-within
  * N/(capacity+1) (an UNDERCOUNT, never an overcount). With
  * `capacity >= |distinct|` no reduction ever fires and the summary
  * IS the exact count table — the regime the DuckDB oracle checks;
  * the error bound is the 100 TB regime.
  *
  * Output: array<struct<token, c>> sorted (c desc, token asc) —
  * deterministic, explode-ready.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity >= 1, "heavy-hitters capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  /** The mergeable-summaries reduction: subtract the (capacity+1)-th
    * largest count from every counter, evict the non-positive. After
    * an update this is the classic decrement-all-by-one; after a merge
    * it is the batched equivalent with the same error guarantee.
    */
  private def reduce(m: mutable.HashMap[String, Long]): Unit = {
    if (m.size > capacity) {
      // the update path overflows by exactly one, so the
      // (capacity+1)-th largest IS the minimum — one allocation-free
      // scan instead of a sort per inserted new key; only a merge can
      // overflow further and pay the sort
      val sub =
        if (m.size == capacity + 1) m.valuesIterator.min
        else {
          val counts = m.values.toArray
          java.util.Arrays.sort(counts)
          counts(counts.length - (capacity + 1))
        }
      val dead = m.iterator.filter(_._2 <= sub).map(_._1).toList
      dead.foreach(m.remove)
      if (sub > 0L) m.mapValuesInPlace((_, v) => v - sub)
    }
  }

  override def update(
      buffer: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buffer.update(key, buffer.getOrElse(key, 0L) + 1L)
      reduce(buffer)
    }
    buffer
  }

  override def merge(
      buffer: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, v) =>
      buffer.update(k, buffer.getOrElse(k, 0L) + v)
    }
    reduce(buffer)
    buffer
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val sorted = buffer.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), c))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (k, v) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      m.update(new String(kb, "UTF-8"), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "misra_gries"
}

/** Column wrappers for the custom aggregates. */
object AggregateFunctions {

  /** Heavy hitters over a string column: at most `capacity` counters
    * per partial, mergeable, counts undercount by at most
    * N/(capacity+1). Returns array<struct<token, c>> sorted by
    * (c desc, token asc).
    */
  def heavyHitters(c: Column, capacity: Int): Column =
    GraftBridge.column(
      MisraGriesAgg(GraftBridge.eagerExpression(c.cast("string")), capacity)
        .toAggregateExpression())
}
