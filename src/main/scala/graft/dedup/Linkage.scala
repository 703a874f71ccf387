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
    score(candidates, left, right, idL, idR, features, threshold)
  }

  /** Score a pre-built candidate pair set (from [[link]]'s equality
    * blocks, [[sortedNeighborhoodCandidates]], or any external
    * blocker) with the same weighted-agreement decision.
    */
  def score(
      candidates: DataFrame,
      left: DataFrame,
      right: DataFrame,
      idL: String,
      idR: String,
      features: Seq[Feature],
      threshold: Long): DataFrame = {
    require(features.nonEmpty, "score requires at least one feature")
    val joined = candidates
      .join(left, Seq(idL))
      .join(right, Seq(idR))
    val s = features
      .map(f => when(f.agree, lit(f.wAgree)).otherwise(lit(f.wDisagree)))
      .reduce(_ + _)
    joined
      .withColumn("score", s.cast("long"))
      .withColumn("is_match", (col("score") >= threshold).cast("boolean"))
      .select(col(idL), col(idR), col("score"), col("is_match"))
  }

  /** Sorted-neighborhood candidate generation (Hernández–Stolfo
    * merge/purge): both sides sort together on a NUMERIC proximity
    * key and every cross-side pair within `window` rank positions is
    * a candidate — the blocking paradigm that catches pairs equality
    * keys miss (nothing has to match exactly, only sort nearby).
    *
    * Scale shape: one partition-parallel global numbering
    * ([[graft.core.Graph]]-free, via GlobalRanks — no single-task
    * sort), then a bucket equi-join on rank div window against the
    * three neighboring buckets — candidate volume is O(n·window),
    * never quadratic. Total order (key, side, id) makes ranks — and
    * therefore the candidate set — engine-exact.
    *
    * @return (idL, idR) candidate pairs, distinct.
    */
  def sortedNeighborhoodCandidates(
      left: DataFrame,
      right: DataFrame,
      idL: String,
      idR: String,
      keyL: Column,
      keyR: Column,
      window: Int): DataFrame = {
    require(window >= 1, "window must be positive")
    val u = left.select(col(idL).as("__id"), lit(0L).as("__side"), keyL.cast("double").as("__k"))
      .unionByName(
        right.select(col(idR).as("__id"), lit(1L).as("__side"), keyR.cast("double").as("__k")))
    val (ranked, _) = graft.core.GlobalRanks.withGlobalRowNumber(
      u, col("__k"), descending = false,
      tieBreak = Seq(col("__side"), col("__id")), out = "__rn")
    // persisted: both join legs below derive from the ranked frame —
    // without the cache the whole global-numbering pipeline (window
    // included) runs once per leg
    val withB = graft.core.CacheScope.track(
      ranked.withColumn("__b", expr(s"__rn div ${window}L")).persist())
    val probe = withB
      .select(col("__id"), col("__side"), col("__rn"),
        explode(array(col("__b") - 1, col("__b"), col("__b") + 1)).as("__b"))
    val l = withB.filter(col("__side") === 0)
      .select(col("__id").as(idL), col("__rn").as("__rl"), col("__b"))
    val r = probe.filter(col("__side") === 1)
      .select(col("__id").as(idR), col("__rn").as("__rr"), col("__b"))
    l.join(r, "__b")
      .filter(abs(col("__rl") - col("__rr")) <= window)
      .select(col(idL), col(idR))
      .distinct()
  }
}
