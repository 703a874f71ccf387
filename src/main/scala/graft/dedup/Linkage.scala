package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage (entity resolution) in the classic Fellegi–Sunter
  * shape: MULTI-PASS BLOCKING proposes candidate pairs cheaply, then
  * per-field agreement comparisons vote with log-odds-style integer
  * weights, and pairs at or above a decision threshold are declared
  * matches. Multi-pass matters because any single blocking key misses
  * pairs whose perturbation broke exactly that key — each pass only
  * has to survive a DIFFERENT kind of noise.
  *
  * Scale shape: each blocking pass is one equi-join on its key (hash
  * shuffle bounded by block sizes — never a cross join); candidate
  * union is distinct-ed pair-id-sized; payloads join back by id; the
  * score is one map-side integer expression. At 100 TB the knobs are
  * the blocking keys (block size distribution = join fan-out) — the
  * comparison stage only ever sees candidates.
  *
  * Determinism: weights are integers, comparators must be exact
  * predicates (integer cross-multiplied ratios, equality) — the score
  * is then engine-exact with no float anywhere.
  */
object Linkage {

  /** One agreement feature: `agree` evaluated over the joined frame
    * (left payload + right payload columns), contributing `wAgree` or
    * `wDisagree` to the score.
    */
  final case class Feature(name: String, agree: Column, wAgree: Long, wDisagree: Long)

  /** Link `left` and `right` (payload columns must not collide except
    * through the caller's naming; ids must be distinct columns).
    *
    * @param blocks one (leftKey, rightKey) column pair per blocking
    *   pass; a candidate is any id pair co-blocked by AT LEAST one
    *   pass (keys are compared by equality; null keys never match).
    * @return (idL, idR, score, is_match) — every candidate pair with
    *   its integer score and the threshold decision.
    */
  def link(
      left: DataFrame,
      right: DataFrame,
      idL: String,
      idR: String,
      blocks: Seq[(Column, Column)],
      features: Seq[Feature],
      threshold: Long): DataFrame = {
    require(blocks.nonEmpty, "link requires at least one blocking pass")
    require(features.nonEmpty, "link requires at least one feature")
    val candidates = blocks.map { case (lk, rk) =>
      left.select(col(idL), lk.as("__bk"))
        .join(right.select(col(idR), rk.as("__bk")), "__bk")
        .select(col(idL), col(idR))
    }.reduce(_ unionByName _).distinct()
    val joined = candidates
      .join(left, Seq(idL))
      .join(right, Seq(idR))
    val score = features
      .map(f => when(f.agree, lit(f.wAgree)).otherwise(lit(f.wDisagree)))
      .reduce(_ + _)
    joined
      .withColumn("score", score.cast("long"))
      .withColumn("is_match", (col("score") >= threshold).cast("boolean"))
      .select(col(idL), col(idR), col("score"), col("is_match"))
  }
}
