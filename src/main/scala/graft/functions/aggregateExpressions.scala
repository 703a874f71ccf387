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

/** Per-group top-k as a native MERGEABLE aggregate — the bounded-heap
  * replacement for the `row_number() OVER (PARTITION BY g ORDER BY v
  * DESC) <= k` idiom. The window form materializes and SORTS every
  * group in full on the reduce side; this aggregate ships at most `k`
  * rows per group out of each map partition (partial aggregation cuts
  * the shuffle to ≤ k·partitions rows per group) and never sorts more
  * than a k-sized heap. At 100 TB the difference is a full-corpus
  * sort exchange vs a top-k-sized one.
  *
  * Deterministic total order: (v desc, key asc) — ties at the
  * boundary keep the smaller key, so the result is independent of
  * partitioning and merge order (spec-checked). Output:
  * array<struct<token, v>> sorted (v desc, token asc), length ≤ k.
  */
case class TopKByAgg(
    key: Expression,
    ord: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(String, Double)]] {

  require(k >= 1, "top-k size must be positive")

  override def children: Seq[Expression] = Seq(key, ord)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)

  // worst-first ordering: the queue head is the element to evict —
  // lowest v, and among equal v the LARGEST key (so min-key wins ties)
  private val worstFirst: Ordering[(String, Double)] =
    new Ordering[(String, Double)] {
      override def compare(a: (String, Double), b: (String, Double)): Int = {
        val c = java.lang.Double.compare(b._2, a._2) // smaller v = "greater" = evicted first
        if (c != 0) c else a._1.compareTo(b._1) // larger key = evicted first
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, Double)] =
    mutable.PriorityQueue.empty[(String, Double)](worstFirst)

  private def offer(
      buf: mutable.PriorityQueue[(String, Double)],
      item: (String, Double)): Unit = {
    if (buf.size < k) buf.enqueue(item)
    else if (worstFirst.compare(item, buf.head) < 0) { // item better than current worst
      buf.dequeue()
      buf.enqueue(item)
    }
  }

  override def update(
      buffer: mutable.PriorityQueue[(String, Double)],
      input: InternalRow): mutable.PriorityQueue[(String, Double)] = {
    val kv = key.eval(input)
    val ov = ord.eval(input)
    if (kv != null && ov != null) {
      val d = ov.asInstanceOf[Double]
      if (!java.lang.Double.isNaN(d)) offer(buffer, (kv.asInstanceOf[UTF8String].toString, d))
    }
    buffer
  }

  override def merge(
      buffer: mutable.PriorityQueue[(String, Double)],
      other: mutable.PriorityQueue[(String, Double)]): mutable.PriorityQueue[(String, Double)] = {
    other.foreach(offer(buffer, _))
    buffer
  }

  override def eval(buffer: mutable.PriorityQueue[(String, Double)]): Any = {
    val sorted = buffer.toArray.sortBy { case (t, v) => (-v, t) }
    new GenericArrayData(sorted.map { case (t, v) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(t), v))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: mutable.PriorityQueue[(String, Double)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (t, v) =>
      val tb = t.getBytes("UTF-8")
      out.writeInt(tb.length)
      out.write(tb)
      out.writeDouble(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, Double)] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val tb = new Array[Byte](in.readInt())
      in.readFully(tb)
      buf.enqueue((new String(tb, "UTF-8"), in.readDouble()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), ord = newChildren(1))
  override def prettyName: String = "topk_by"
}

/** The deterministic KLL-shaped compactor hierarchy behind
  * [[QuantileSketchAgg]]: level `l` holds items of weight `2^l`; a
  * level reaching `capacity` sorts, promotes every other element (the
  * survivors carry doubled weight) to level `l+1`, and leaves at most
  * one odd leftover behind — weight is conserved exactly, so ranks
  * are never biased by lost mass. The selection offset alternates per
  * level per compaction (the deterministic stand-in for KLL's coin
  * flip — Manku et al.'s NEW/COLLAPSE policy has the same shape), so
  * the summary is a pure function of the merge tree. Memory is
  * O(capacity · log(n/capacity)).
  */
final class QuantileSketch(val capacity: Int) extends Serializable {
  val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Double]] =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Double])
  val toggles: mutable.ArrayBuffer[Boolean] = mutable.ArrayBuffer(false)

  private def ensureLevel(l: Int): Unit =
    while (levels.size <= l) {
      levels += mutable.ArrayBuffer.empty[Double]
      toggles += false
    }

  def insert(v: Double): Unit = {
    levels(0) += v
    if (levels(0).size >= capacity) compactFrom(0)
  }

  private def compactFrom(start: Int): Unit = {
    var l = start
    while (l < levels.size && levels(l).size >= capacity) {
      val buf = levels(l)
      val arr = buf.toArray
      java.util.Arrays.sort(arr)
      val even = arr.length - (arr.length % 2)
      val offset = if (toggles(l)) 1 else 0
      toggles(l) = !toggles(l)
      ensureLevel(l + 1)
      var i = offset
      while (i < even) { levels(l + 1) += arr(i); i += 2 }
      buf.clear()
      if (even < arr.length) buf += arr(even) // the odd max stays at this level
      l += 1
    }
  }

  def mergeWith(other: QuantileSketch): Unit = {
    var l = 0
    while (l < other.levels.size) {
      ensureLevel(l)
      levels(l) ++= other.levels(l)
      l += 1
    }
    compactFrom(0)
    // a deeper level may have crossed capacity without level 0 doing so
    var m = 1
    while (m < levels.size) {
      if (levels(m).size >= capacity) compactFrom(m)
      m += 1
    }
  }

  /** All (value, weight) items, sorted by value. */
  def weightedItems(): Array[(Double, Long)] = {
    val out = mutable.ArrayBuffer.empty[(Double, Long)]
    var l = 0
    while (l < levels.size) {
      val w = 1L << l
      levels(l).foreach(v => out += ((v, w)))
      l += 1
    }
    out.sortBy(_._1).toArray
  }

  /** Discrete quantile at probability `p` under DuckDB/Postgres
    * `quantile_disc` semantics: the smallest value whose cumulative
    * weight reaches `max(1, ceil(p·N))`. `BigDecimal.valueOf` keeps
    * `ceil` exact for short-decimal probabilities (0.9·500 in IEEE is
    * 450.000…06 — ceiling to 451 would be off by one).
    */
  def quantile(items: Array[(Double, Long)], p: Double): Double = {
    val n = items.map(_._2).sum
    val target = math.max(BigDecimal.valueOf(p)
      .*(BigDecimal(n)).setScale(0, BigDecimal.RoundingMode.CEILING).toLong, 1L)
    var cum = 0L
    var i = 0
    while (i < items.length) {
      cum += items(i)._2
      if (cum >= target) return items(i)._1
      i += 1
    }
    if (items.isEmpty) Double.NaN else items(items.length - 1)._1
  }
}

/** Mergeable quantile summary as a native aggregate — the
  * bounded-memory companion to exact rank windows for 100 TB order
  * statistics: map-side partials are `capacity·log`-sized sketches,
  * merged associatively, so no global sort and no full-column
  * materialization ever happens (`percentile_approx` is Spark's
  * built-in analogue; this one is deterministic given the plan and
  * EXACT whenever a group's row count stays under `capacity` — the
  * regime the DuckDB `quantile_disc` oracle checks bit-for-bit, as
  * with `misra_gries`'s exact regime). Output: array<struct<p, v>>
  * in the probability order requested.
  */
case class QuantileSketchAgg(
    child: Expression,
    capacity: Int,
    probabilities: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketch] {

  require(capacity >= 8, "sketch capacity must be at least 8")
  require(probabilities.nonEmpty && probabilities.forall(p => p >= 0.0 && p <= 1.0),
    "probabilities must be within [0, 1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("p", DoubleType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): QuantileSketch = new QuantileSketch(capacity)

  override def update(buffer: QuantileSketch, input: InternalRow): QuantileSketch = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (!java.lang.Double.isNaN(d)) buffer.insert(d)
    }
    buffer
  }

  override def merge(buffer: QuantileSketch, other: QuantileSketch): QuantileSketch = {
    buffer.mergeWith(other)
    buffer
  }

  override def eval(buffer: QuantileSketch): Any = {
    val items = buffer.weightedItems()
    new GenericArrayData(probabilities.map { p =>
      new GenericInternalRow(Array[Any](p, buffer.quantile(items, p)))
    }.toArray.asInstanceOf[Array[Any]])
  }

  override def serialize(buffer: QuantileSketch): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.levels.size)
    var l = 0
    while (l < buffer.levels.size) {
      out.writeBoolean(buffer.toggles(l))
      val lv = buffer.levels(l)
      out.writeInt(lv.size)
      lv.foreach(out.writeDouble)
      l += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QuantileSketch = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val s = new QuantileSketch(capacity)
    val nLevels = in.readInt()
    var l = 0
    while (l < nLevels) {
      val tog = in.readBoolean()
      val n = in.readInt()
      if (l >= s.levels.size) {
        s.levels += mutable.ArrayBuffer.empty[Double]
        s.toggles += false
      }
      s.toggles(l) = tog
      var i = 0
      while (i < n) { s.levels(l) += in.readDouble(); i += 1 }
      l += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "quantile_sketch"
}

/** K-minimum-values distinct/overlap sketch as a native aggregate —
  * the mergeable set summary (Beyer et al. SIGMOD'07; the theta-sketch
  * family) behind approximate corpus-overlap at 100 TB: each partial
  * keeps the k smallest md5-derived 64-bit hashes of the DISTINCT
  * values seen (a pure function of the value SET — duplicates and
  * merge order cannot change it), so a source's shingle universe
  * crosses the shuffle as k longs instead of its distinct rows.
  * Distinct count estimates as `(k−1)·2^64 / kth-min` with ~1/√k
  * relative error; set operations (Jaccard, intersections) combine
  * sketches directly. With `k > |distinct|` the sketch IS the full
  * hash set — exact distinct counts and exact Jaccard, the regime the
  * DuckDB oracle checks (as with `misra_gries` / `quantile_sketch`).
  *
  * Output: array<bigint> of the retained hashes in unsigned-ascending
  * order (the k minima of the hash space).
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 16, "KMV sketch size must be at least 16")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // hashes are stored sign-flipped so the TreeSet's natural (signed)
  // order IS the unsigned hash order; flip back on output
  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def offer(buf: java.util.TreeSet[java.lang.Long], flipped: Long): Unit = {
    if (buf.size < k) { buf.add(flipped); () }
    else if (flipped < buf.last()) {
      if (buf.add(flipped)) buf.pollLast()
      ()
    }
  }

  override def update(
      buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(buffer, KmvSketchAgg.hash64(v.asInstanceOf[UTF8String].toString))
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) offer(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue() ^ java.lang.Long.MIN_VALUE; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) out.writeLong(it.next().longValue())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_minima"
}

object KmvSketchAgg {
  /** md5-derived 64-bit hash, SIGN-FLIPPED so signed order == unsigned
    * hash order (the buffer's storage representation). Public so
    * engine-side set combinators ([[graft.curation.Curation
    * .corpusOverlapApprox]]) re-derive identical hashes.
    */
  def hash64(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h ^ java.lang.Long.MIN_VALUE
  }

  /** Merge two sketches (unsigned-ascending minima arrays, as
    * [[KmvSketchAgg]] outputs): distinct union, k smallest — the
    * associative/commutative fold a STANDING per-group sketch table
    * needs ([[graft.streaming.SketchStateStreams]]): merging a day's
    * delta sketch into the stored day sketch equals sketching the
    * union of the raw sets, so state never has to re-see raw history.
    */
  def mergeMinima(a: Array[Long], b: Array[Long], k: Int): Array[Long] = {
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    var last = 0L; var any = false
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length ||
        (i < a.length && java.lang.Long.compareUnsigned(a(i), b(j)) <= 0)
      val v = if (takeA) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (!any || v != last) { out(n) = v; n = n + 1; last = v; any = true }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Distinct-count estimate from unsigned-ascending minima (as
    * [[KmvSketchAgg]] outputs): exact when the sketch never filled.
    */
  def estimateDistinct(minima: Array[Long], k: Int): Double =
    if (minima.length < k) minima.length.toDouble
    else {
      // unsigned fraction of hash space covered by the kth minimum
      val u = (minima(k - 1) ^ java.lang.Long.MIN_VALUE).toDouble + 9.223372036854776e18
      (k - 1).toDouble * 1.8446744073709552e19 / (u + 1.0)
    }
}

/** Column wrappers for the custom aggregates. */
/** Bloom-filter summary of a group's value set as a native aggregate —
  * the per-group form of `DataFrameStatFunctions.bloomFilter` (which
  * only summarizes a whole frame): each partial keeps one fixed-size
  * bit array, merge is bitwise OR (Spark's `BloomFilter.mergeInPlace`),
  * eval emits the serialized sketch as `binary`. Built for per-FILE
  * bloom manifests ([[graft.core.Layout.writeBloomManifest]]): zone
  * maps prune range predicates, but a point lookup on a high-
  * cardinality key that is ~uniform across files (any hash-distributed
  * id) intersects every min/max box — a per-file Bloom answers
  * "can this file contain id X?" in one probe with no false negatives.
  * Values are hashed in string space (same canonicalization as
  * [[graft.core.Joins.bloomPrunedJoin]]) so one sketch form serves any
  * key type.
  */
case class BloomFilterAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.spark.util.sketch.BloomFilter] {

  require(expectedItems > 0 && fpp > 0 && fpp < 1,
    s"bloom_agg needs expectedItems > 0 and fpp in (0,1): $expectedItems, $fpp")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)

  override def update(
      buffer: org.apache.spark.util.sketch.BloomFilter,
      input: InternalRow): org.apache.spark.util.sketch.BloomFilter = {
    val v = child.eval(input)
    if (v != null) buffer.putString(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(
      buffer: org.apache.spark.util.sketch.BloomFilter,
      other: org.apache.spark.util.sketch.BloomFilter): org.apache.spark.util.sketch.BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: org.apache.spark.util.sketch.BloomFilter): Any =
    serialize(buffer)

  override def serialize(
      buffer: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    buffer.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "bloom_agg"
}

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

  /** Per-group top-k by a double-valued order column: bounded k-sized
    * heap per partial, mergeable, deterministic (v desc, key asc with
    * min-key tie wins). Returns array<struct<token, v>> sorted
    * (v desc, token asc) — the shuffle-light replacement for the
    * partitioned row_number window.
    */
  def topKBy(key: Column, ord: Column, k: Int): Column =
    GraftBridge.column(
      TopKByAgg(
        GraftBridge.eagerExpression(key.cast("string")),
        GraftBridge.eagerExpression(ord.cast("double")), k)
        .toAggregateExpression())

  /** KMV distinct/overlap sketch: the k smallest md5 hashes of the
    * distinct values — a pure function of the value set (duplicate-,
    * order-, and partitioning-independent). Exact distinct counts and
    * set operations when `k > |distinct|`; ~1/√k relative error past
    * it. Returns array<bigint>, unsigned-ascending.
    */
  def kmvMinima(c: Column, k: Int): Column =
    GraftBridge.column(
      KmvSketchAgg(GraftBridge.eagerExpression(c.cast("string")), k)
        .toAggregateExpression())

  /** Mergeable quantile summary: `capacity·log`-bounded sketch per
    * partial, EXACT while the group stays under `capacity` rows
    * (DuckDB `quantile_disc` semantics), rank error bounded by the
    * compaction weights past it. Returns array<struct<p, v>> in the
    * requested probability order.
    */
  def quantileSketch(c: Column, capacity: Int, probabilities: Seq[Double]): Column =
    GraftBridge.column(
      QuantileSketchAgg(GraftBridge.eagerExpression(c.cast("double")),
        capacity, probabilities)
        .toAggregateExpression())

  /** Per-group Bloom summary (serialized `binary`): no false
    * negatives, `fpp` false positives at `expectedItems` — the
    * membership sketch behind per-file bloom manifests.
    */
  def bloomAgg(c: Column, expectedItems: Long, fpp: Double): Column =
    GraftBridge.column(
      BloomFilterAgg(GraftBridge.eagerExpression(c.cast("string")),
        expectedItems, fpp)
        .toAggregateExpression())
}
