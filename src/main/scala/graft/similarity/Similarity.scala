package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`):
  * brute-force cosine top-k as the exact baseline, and a random-
  * hyperplane LSH bucketed variant as the scale path.
  *
  * Numeric determinism: float32 inputs are cast to double, so each
  * product is EXACT (24+24 mantissa bits < 53); the dot product is a
  * left-to-right fold (`aggregate`), and the final cosine is rounded to
  * 6 decimals — reproducible across engines for oracle comparison.
  *
  * Scale notes (100 TB): brute force is O(|Q|·|C|) — correct shape for
  * small query sets against a partitioned corpus (queries broadcast, no
  * corpus shuffle). For large |Q| use `lshTopK`: both sides bucket by
  * hyperplane sign bits, the join is bucket-equi (shuffle on bucket
  * key), and recall is tuned by `planes` (fewer planes = bigger buckets
  * = higher recall, more compute).
  */
object Similarity {

  /** Dot product of two double arrays — compiled kernel, strict left
    * fold (bit-identical to the `aggregate(zip_with(...))` HOF chain
    * and to DuckDB's list_sum/list_transform, but codegen'd).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.SketchFunctions.array_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity rounded to 6 decimals. Inputs must already be
    * `array<double>` (cast float embeddings with
    * `col.cast("array<double>")` once, at scan).
    */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (norm(a) * norm(b)), 6)

  /** Cosine given precomputed norms (avoids recomputing the corpus
    * norm per query pair).
    */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    round(dot(a, b) / (normA * normB), 6)

  /** Exact top-k: for every query row, the k nearest corpus rows by
    * cosine (desc, tie-broken by corpus id). Queries are broadcast, the
    * corpus is scanned once with no shuffle of the corpus side; the
    * only shuffle is the per-query top-k window (k·|Q| rows).
    */
  def bruteForceTopK(
      queries: DataFrame, // (q_id, q_emb: array<double>)
      corpus: DataFrame, // (c_id, c_emb: array<double>)
      k: Int): DataFrame = {
    val q = queries.withColumn("q_norm", norm(col("q_emb")))
    val c = corpus.withColumn("c_norm", norm(col("c_emb")))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos", cosineWithNorms(col("q_emb"), col("c_emb"), col("q_norm"), col("c_norm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("cos"), col("rank"))
  }

  /** Deterministic pseudo-random ±1 hyperplane component for plane p,
    * dimension i (derived from xxhash64 — no RNG, reproducible).
    */
  private def planeSign(p: Column, i: Column): Column =
    when(xxhash64(p, i).bitwiseAND(1) === 1, lit(1.0)).otherwise(lit(-1.0))

  /** LSH bucket id: `planes` sign bits of dots with ±1 hyperplanes. */
  def lshBucket(emb: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val d = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1), (x, i) => x * planeSign(lit(p), i)),
        lit(0.0), (a, x) => a + x)
      when(d > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Approximate top-k: candidates are corpus rows sharing the query's
    * LSH bucket; scoring/ranking as in brute force. Equi-join on the
    * bucket key — scales to large query sets (no cross join).
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      planes: Int = 4): DataFrame = {
    val q = queries
      .withColumn("q_norm", norm(col("q_emb")))
      .withColumn("bucket", lshBucket(col("q_emb"), planes))
    val c = corpus
      .withColumn("c_norm", norm(col("c_emb")))
      .withColumn("bucket", lshBucket(col("c_emb"), planes))
    val scored = c.join(q, Seq("bucket"))
      .withColumn("cos", cosineWithNorms(col("q_emb"), col("c_emb"), col("q_norm"), col("c_norm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("cos"), col("rank"))
  }

  /** IVF-Flat approximate top-k — the second scale path next to
    * [[lshTopK]]: a coarse quantizer assigns every corpus vector to its
    * nearest centroid (inverted lists), and each query scores only the
    * `nprobe` lists nearest to it. The partition-pruning analog for
    * vector search: candidate work drops by ~nlist/nprobe.
    *
    * The quantizer here is deterministic — the `nlist` lowest-id corpus
    * vectors serve as centroids (a sampled quantizer; production IVF
    * k-means-refines them, which changes WHICH vectors the lists hold
    * but none of the dataflow below). Centroids are a small dimension:
    * broadcast to both assignment joins, so the corpus never shuffles
    * for assignment — the only wide exchange is the per-query top-k.
    */
  def ivfTopK(
      queries: DataFrame, // (q_id, q_emb: array<double>)
      corpus: DataFrame, // (c_id, c_emb: array<double>)
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val cent = corpus.orderBy(col("c_id")).limit(nlist)
      .select(col("c_id").as("cent_id"), col("c_emb").as("cent_emb"))
      .withColumn("cent_norm", norm(col("cent_emb")))
    val c = corpus.withColumn("c_norm", norm(col("c_emb")))
    val assigned = graft.core.Joins.lastByKey(
      c.crossJoin(broadcast(cent))
        .withColumn("a_score",
          cosineWithNorms(col("c_emb"), col("cent_emb"), col("c_norm"), col("cent_norm"))),
      Seq("c_id"), Seq(col("a_score"), -col("cent_id")))
      .select(col("cent_id").as("list_id"), col("c_id"), col("c_emb"), col("c_norm"))
    val q = queries.withColumn("q_norm", norm(col("q_emb")))
    val probeW = Window.partitionBy(col("q_id")).orderBy(col("p_score").desc, col("cent_id"))
    val probes = q.crossJoin(broadcast(cent))
      .withColumn("p_score",
        cosineWithNorms(col("q_emb"), col("cent_emb"), col("q_norm"), col("cent_norm")))
      .withColumn("p_rank", row_number().over(probeW))
      .filter(col("p_rank") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("q_norm"), col("cent_id").as("list_id"))
    val scored = assigned.join(probes, Seq("list_id"))
      .withColumn("cos", cosineWithNorms(col("q_emb"), col("c_emb"), col("q_norm"), col("c_norm")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("cos"), col("rank"))
  }

  /** Embedding near-duplicate pairs: all (a < b) pairs with cosine >=
    * tau. Exact variant (self cross join) — use only when one side fits
    * in broadcast; the LSH-prefiltered variant joins on bucket instead.
    */
  def cosinePairs(df: DataFrame, idCol: String, embCol: String, tau: Double): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(embCol).as("emb"))
      .withColumn("nrm", norm(col("emb")))
    val l = base.select(col("id").as("id_a"), col("emb").as("emb_a"), col("nrm").as("n_a"))
    val r = base.select(col("id").as("id_b"), col("emb").as("emb_b"), col("nrm").as("n_b"))
    l.crossJoin(r).filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosineWithNorms(col("emb_a"), col("emb_b"), col("n_a"), col("n_b")))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
