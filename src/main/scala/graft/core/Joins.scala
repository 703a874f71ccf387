package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse ANY JOIN semantics (reference:
  * /root/reference/operations/internal_transactions.py:411-418,
  * examples/sql_balances/balances.sql:18-35): a join that takes at most
  * ONE matching right row per key — i.e. it never multiplies the left
  * side.
  *
  * Spark's joins multiply on duplicate right keys, so ANY JOIN is
  * modeled as "dedup the right side on the join keys, then join".
  * ClickHouse picks an arbitrary right row; for oracle-reproducible
  * results we pick a deterministic one via `tiebreak` ordering.
  */
object Joins {

  /** Keep the first row per key ordered by `order` ascending —
    * deterministic dedup.
    *
    * Implemented as `min(struct(order..., row))`, NOT a row_number
    * window: a hash aggregate combines partially map-side (one
    * candidate row per key per partition crosses the shuffle) and
    * needs no sort, where the window shuffles EVERY row and sorts each
    * partition — the difference between O(rows) shuffle and O(keys) at
    * 100 TB. Struct comparison is field-lexicographic with null
    * smallest, matching the window's asc-nulls-first; ties on `order`
    * fall through to the full row, so the pick is always deterministic.
    */
  def firstByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    pickByKey(df, keys, order, min)

  /** Same single-pass shape, greatest `order` wins (desc-nulls-last
    * analog: null order fields compare smallest, so max prefers
    * non-null versions).
    */
  def lastByKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    pickByKey(df, keys, order, max)

  private def pickByKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
      pick: Column => Column): DataFrame = {
    val orderNames = order.map(_.toString)
    if (orderNames.forall(df.columns.contains)) {
      // Tiebreaks are plain row columns: pack them as the comparison
      // prefix and append only the REMAINING columns — keys ride the
      // groupBy and nothing crosses the shuffle twice. (The all-columns
      // fallback below ships every order column AND the full row; for a
      // tiebreak covering most of a table that doubles shuffle bytes.)
      val rest = df.columns.filterNot(c => keys.contains(c) || orderNames.contains(c))
      val packed = struct((orderNames ++ rest).distinct.map(col): _*)
      df.groupBy(keys.map(col): _*)
        .agg(pick(packed).as("__m"))
        .select(df.columns.toIndexedSeq.map(c =>
          if (keys.contains(c)) col(c) else col(s"__m.$c").as(c)): _*)
    } else {
      // Expression tiebreaks: carry them alongside the packed full row.
      val row = struct(df.columns.toIndexedSeq.map(col): _*).as("__row")
      val packed = struct(order.zipWithIndex.map { case (c, i) => c.as(s"__o$i") } :+ row: _*)
      df.groupBy(keys.map(col): _*)
        .agg(pick(packed).as("__m"))
        .select(col("__m.__row.*"))
    }
  }

  /** `left ANY [joinType] JOIN right USING keys`.
    *
    * @param tiebreak columns ordering the right side; the FIRST row in
    *                 this order wins. Empty = "any row" (cheapest:
    *                 map-side combine via dropDuplicates, but
    *                 nondeterministic — only for keys known unique).
    * @param broadcastRight hint when the deduped right side is small
    *                 (dimension-table pattern) so the join needs no
    *                 shuffle of the big left side.
    */
  def anyJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      joinType: String = "left",
      tiebreak: Seq[Column] = Seq.empty,
      broadcastRight: Boolean = false): DataFrame = {
    val deduped =
      if (tiebreak.isEmpty) right.dropDuplicates(keys)
      else firstByKey(right, keys, tiebreak)
    val r = if (broadcastRight) broadcast(deduped) else deduped
    left.join(r, keys, joinType)
  }

  /** AS-OF LEFT JOIN: attach to each left row the single most recent
    * right row with equal `keys` and right `tsCol` <= left `tsCol`
    * (DuckDB `ASOF LEFT JOIN` / kdb `aj` semantics).
    *
    * Join-free implementation: tag both sides, union, and carry the
    * right payload forward with `last(_, ignoreNulls)` over
    * `(PARTITION BY keys ORDER BY ts, side ROWS UNBOUNDED PRECEDING)`.
    * One shuffle+sort of |L|+|R| rows, partitioned by the equi-keys
    * exactly like a hash join would be. The naive formulation — a
    * range-condition join + max-per-left-row — plans as a theta join
    * (per-key cartesian) and melts down on hot keys at scale; the
    * window form is linear after the sort and skews only as much as
    * the key distribution itself.
    *
    * Right rows order BEFORE left rows at equal ts (side 0 < 1), so the
    * bound is inclusive (`>=`). The payload is carried as ONE struct,
    * not per-column: a genuinely-NULL payload field in the latest right
    * row must not fall through to an older row.
    *
    * @param right     projected right side: `keys`, `tsCol`, payload —
    *                  payload names must not collide with left columns.
    * @param tiebreak  orders right rows sharing (keys, ts); the LAST
    *                  row in this order wins (deterministic). Empty =
    *                  right already unique per (keys, ts).
    * @param rightTsAs output column holding the matched right ts
    *                  (null when no right row precedes the left row).
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tiebreak: Seq[Column] = Seq.empty,
      rightTsAs: String = "asof_ts"): DataFrame = {
    val reserved = Set("__ts", "__side", "__lrow", "__pay", "__m")
    require(!keys.exists(reserved), s"key names may not be in $reserved")
    val payload = right.columns.filterNot(c => keys.contains(c) || c == tsCol).toIndexedSeq
    // the output is left.columns ++ rightTsAs ++ payload — enforce the
    // scaladoc's disjointness instead of emitting ambiguous columns
    val payClash = payload.filter(left.columns.toSet)
    require(payClash.isEmpty,
      s"right payload columns $payClash collide with left columns; rename before joining")
    require(!payload.contains(rightTsAs) && !left.columns.contains(rightTsAs),
      s"rightTsAs '$rightTsAs' collides with an output column; pick another name")
    // A NULL right ts would sort nulls-first — "earlier than
    // everything" — and leak its payload into every left row. ASOF
    // semantics (p.ts >= q.ts) never match NULL: drop such rows.
    val rightNonNull = right.filter(col(tsCol).isNotNull)
    val rightOne =
      if (tiebreak.isEmpty) rightNonNull
      else lastByKey(rightNonNull, keys :+ tsCol, tiebreak)

    val lCols = left.columns.toIndexedSeq
    val leftStruct = org.apache.spark.sql.types.StructType(left.schema.fields)
    val payStruct = org.apache.spark.sql.types.StructType(
      rightOne.schema.fields.filter(f => payload.contains(f.name) || f.name == tsCol))

    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(1).as("__side"),
        struct(lCols.map(col): _*).as("__lrow"),
        lit(null).cast(payStruct).as("__pay")): _*)
    val rTagged = rightOne.select(
      keys.map(col) ++ Seq(
        col(tsCol).as("__ts"), lit(0).as("__side"),
        lit(null).cast(leftStruct).as("__lrow"),
        struct(payStruct.fieldNames.toIndexedSeq.map(col): _*).as("__pay")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(c => col(s"__lrow.$c").as(c)) ++
        Seq(col(s"__m.$tsCol").as(rightTsAs)) ++
        payload.map(p => col(s"__m.$p").as(p)): _*)
  }

  /** Forward AS-OF LEFT JOIN: each left row matched to the EARLIEST
    * right at-or-after it (the "time to next conversion" direction).
    * Implemented as [[asofJoin]] on NEGATED integer timestamps —
    * forward-asof(t) ≡ backward-asof(−t), so the two directions share
    * one carry window implementation (and one set of guarantees:
    * single shuffle, no range join, inclusive at equal ts).
    * `tsCol` must be a numeric epoch column on both sides.
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tiebreak: Seq[Column] = Seq.empty,
      rightTsAs: String = "asof_ts"): DataFrame =
    asofJoin(
      left.withColumn(tsCol, -col(tsCol)),
      right.withColumn(tsCol, -col(tsCol)),
      keys, tsCol, tiebreak, rightTsAs)
      .withColumn(tsCol, -col(tsCol))
      .withColumn(rightTsAs, -col(rightTsAs))

  /** Bloom-pruned inner equi-join — the classic big⋈selective-big
    * technique (a.k.a. bloom join / sideways information passing):
    * build a Bloom filter of the RIGHT side's join keys (one
    * aggregate, sketch-sized result), broadcast it, and drop left
    * rows map-side BEFORE the shuffle. A Bloom filter has no false
    * negatives, so the result is EXACTLY the plain join; `fpp` only
    * controls how much non-matching left volume still pays the
    * shuffle. At 100 TB this is the difference between shuffling the
    * whole fact table and shuffling the ~matching slice when the right
    * side is too big to broadcast but its key set is summarizable
    * (~1.2 bytes/key at 1% fpp). Keys are compared in string space so
    * one sketch form serves any key type; both sides hash the same
    * canonical form.
    */
  def bloomPrunedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame = {
    val bloom = right.select(col(key).cast("string").as("__k"))
      .stat.bloomFilter(col("__k"), expectedItems, fpp)
    val bc = left.sparkSession.sparkContext.broadcast(bloom)
    // a UDF is the right tool here (same argument as
    // Dedup.dedupAgainstBloom): membership against a broadcast sketch
    // has no Column-function form; the probe is one hash per row and
    // the cast argument stays codegen'd.
    val mightContain = udf((k: String) => k != null && bc.value.mightContainString(k))
    left.filter(mightContain(col(key).cast("string"))).join(right, key)
  }

  /** AS-OF LEFT JOIN with a match-window bound (pandas
    * `merge_asof(tolerance=...)`, kdb `wj` with a window): the latest
    * right at-or-before each left row counts ONLY if it is within
    * `tolerance` time units — a year-old price is not "the price as
    * of" today's trade. Rows whose nearest match is staler get NULLs,
    * exactly as if no right row existed (cf. `orders/prices.py:42`:
    * the reference's moving-average join treats stale price points as
    * absent rather than carrying them forward indefinitely).
    *
    * Same plan as [[asofJoin]] — one equi-key shuffle, no range
    * join — plus a map-side staleness test over the carried match.
    * `tsCol` must be a numeric epoch column on both sides (the
    * tolerance compare needs subtraction).
    */
  def asofJoinTolerance(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tolerance: Long,
      tiebreak: Seq[Column] = Seq.empty,
      rightTsAs: String = "asof_ts"): DataFrame = {
    require(tolerance >= 0L, s"tolerance must be >= 0, got $tolerance")
    val joined = asofJoin(left, right, keys, tsCol, tiebreak, rightTsAs)
    val payload = right.columns
      .filterNot(c => keys.contains(c) || c == tsCol).toIndexedSeq
    val stale = col(rightTsAs).isNull ||
      (col(tsCol) - col(rightTsAs)) > lit(tolerance)
    joined.select(
      left.columns.toIndexedSeq.map(col) ++
        ((rightTsAs +: payload).map(c =>
          when(stale, lit(null)).otherwise(col(c)).as(c))): _*)
  }

  /** Point-in-interval DICTIONARY enrichment with no join operator at
    * all: the interval table (id, [lo, hi) bounds, LongType) is
    * collected once, validated sorted/non-overlapping, and compiled
    * into a [[graft.functions.RangeLookup]] binary-search expression —
    * O(log m) per row inside whole-stage codegen, zero shuffle, zero
    * explode. The map-side sibling of [[graft.plans.IntervalJoinRewrite]]:
    * the rewrite is for interval sides too big to hold in memory; this
    * is the strictly better plan when they are dimension-sized (geo/IP
    * blocks, maintenance windows, tier tables — the usual case).
    *
    * Adds `asCol` = the containing interval's id, NULL when no
    * interval contains the point (filter for inner semantics, keep for
    * left). `maxRows` bounds the driver-side collect LOUDLY — the same
    * explicit budget a broadcast-hash-join threshold encodes.
    *
    * Overlapping intervals are rejected, not resolved: a dictionary
    * with two answers for one point is a data bug upstream.
    */
  def rangeDictJoin(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, idCol: String, loCol: String, hiCol: String,
      asCol: String, maxRows: Int = 4 << 20): DataFrame = {
    val rows = intervals
      .select(col(loCol).cast("long"), col(hiCol).cast("long"),
        col(idCol).cast("long"))
      .limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"range dictionary exceeds maxRows=$maxRows — broadcast enrichment " +
        "is for dimension-sized interval tables; use Ranges.intervalJoin " +
        "or IntervalJoinRewrite for fact-sized interval sides")
    val sorted = rows.map { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2),
        "range dictionary bounds and ids must be non-null")
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }.sortBy(_._1)
    sorted.foreach { case (lo, hi, id) =>
      require(lo < hi, s"empty interval [$lo, $hi) for id $id") }
    sorted.sliding(2).foreach {
      case Array((lo1, hi1, id1), (lo2, _, id2)) =>
        require(hi1 <= lo2,
          s"overlapping intervals: id $id1 [$lo1, $hi1) and id $id2 [$lo2, …)")
      case _ => ()
    }
    points.withColumn(asCol,
      graft.functions.GraftFunctions.range_lookup(
        col(pointCol).cast("long"),
        sorted.map(_._1), sorted.map(_._2), sorted.map(_._3)))
  }
}
