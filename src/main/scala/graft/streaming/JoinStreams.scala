package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Watermarked stream-stream joins — the 24/7 form of the batch
  * attribution/interval joins in [[graft.core.Joins]] and
  * [[graft.core.Ranges]]. Both input streams carry watermarks and the
  * join condition carries an explicit event-time bound, which is what
  * lets Structured Streaming PROVE its join state is finite: a buffered
  * row is evicted the moment the other side's watermark passes the last
  * instant it could still match. Without the time bound a stream-stream
  * join would have to buffer both streams forever.
  */
object JoinStreams {

  /** Bounded-lag attribution join: every left row (the impression)
    * matches right rows (clicks) with the same `key` whose event time
    * falls in `[leftTs, leftTs + within]` — the classic
    * click-attribution shape. State stays bounded: a left row leaves
    * the store once the right watermark passes `leftTs + within`;
    * with `joinType = "left_outer"` an unmatched left row is emitted
    * null-extended exactly once at that point (inner drops it).
    *
    * The same expression plans on static frames (spec pins
    * stream == batch on closed inputs) — this is the streaming sibling
    * of `Ranges.intervalJoin`: the attribution horizon is anchored at
    * the left event and enforced by the engine's state reaper instead
    * of a bucket-explode equi-join.
    *
    * Scale shape: the equi-key keeps it a hash join per micro-batch
    * (state store partitioned by key); `within`/`watermark` directly
    * size the state store — at 100 TB/day feeds the horizon IS the
    * memory budget. The defaults are interactive-scale conveniences:
    * size both explicitly for a production feed.
    */
  def attributionJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      within: String = "1 hour",
      watermark: String = "2 hours",
      joinType: String = "inner"): DataFrame = {
    require(left.schema(leftTs).dataType == TimestampType,
      s"'$leftTs' must be TimestampType; is ${left.schema(leftTs).dataType.simpleString}")
    require(right.schema(rightTs).dataType == TimestampType,
      s"'$rightTs' must be TimestampType; is ${right.schema(rightTs).dataType.simpleString}")
    require(Seq("inner", "left_outer").contains(joinType),
      s"joinType must be inner or left_outer (right/full buffer the unbounded side); got $joinType")
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    val cond = col(s"l.$key") === col(s"r.$key") &&
      col(s"r.$rightTs") >= col(s"l.$leftTs") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within")
    l.join(r, cond, joinType).drop(col(s"r.$key"))
  }
}
