package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-based graph algorithms over plain (src, dst) edge frames — no
  * graph library, just the shuffles Spark already optimizes.
  *
  * [[pageRank]] is damped PageRank by power iteration in INTEGER
  * fixed-point arithmetic: ranks live as int64 multiples of 1e-12
  * (`Scale`), per-edge contributions use integer division (`div`),
  * and the damping mix is `(15·base + 85·recv) div 100`. Every
  * operation is exact int64 arithmetic, so the result is a pure
  * function of (nodes, edges, iters) — independent of partitioning,
  * join order, and float-sum order — and a SQL engine replaying the
  * same iterations reproduces it bit-for-bit (the DuckDB oracle
  * unrolls them as CTE generations, like the q125 logistic-regression
  * training replay).
  *
  * Scale shape per iteration: contributions = edges ⋈ ranks on src
  * (one hash shuffle of the edge table), received mass = groupBy dst
  * (second shuffle, map-side partial sums), dangling mass = one-row
  * aggregate broadcast back via crossJoin, then the rank frame
  * left-joins the received sums. Nothing corpus-sized is collected or
  * broadcast; per-iteration cost is two shuffles of the edge list —
  * the canonical distributed PageRank shape. Only the node COUNT (one
  * scalar) is computed driver-side, once. Iteration builds lineage
  * depth `O(iters)`; for large `iters` callers should persist or
  * checkpoint every few rounds (the near-dup-centrality use runs 5,
  * where plan depth is a non-issue).
  */
object Graph {

  /** Fixed-point scale: ranks are int64 multiples of 1e-12. */
  val Scale: Long = 1000000000000L

  /** Damping = DampNum/DampDen (the classic 0.85, kept rational so the
    * mix is integer-exact).
    */
  val DampNum = 85L
  val DampDen = 100L

  /** Damped PageRank over `edges` restricted to the `nodes` universe.
    *
    * @param nodes one column `id` — the full node set, INCLUDING
    *   isolated nodes (they keep teleport + dangling mass).
    * @param edges columns `src`, `dst`; parallel edges each carry a
    *   contribution (dedup first for simple-graph semantics).
    * @param iters power-iteration count (fixed, not convergence-based,
    *   so replay engines agree on the step count).
    * @return (id, rank_fx int64 at 1e-12 scale, rank double rounded to
    *   1e-9 for reading — the fx column is the exact value).
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"pageRank requires iters >= 1, got $iters")
    val n = nodes.select(col("id")).distinct()
    // The edge frame is referenced once per iteration and each rank
    // frame THREE times by its successor (contribution join, dangling
    // aggregate, final left join). Dataset-persisting the ranks fixes
    // the runtime recompute but NOT the logical plan: each generation
    // still embeds its predecessor's tree 3×, so analysis/optimization
    // walks 3^iters copies — measured 51 s of pure driver planning at
    // 5 iterations over the sf0.1 near-dup graph. [[shortCircuit]]
    // rebases every generation on its persisted RDD instead (the
    // GraphX-style checkpoint move), keeping the plan constant-size
    // per round. All persists release via CacheScope.
    val e = CacheScope.track(edges.select(col("src"), col("dst")).persist())
    // The one driver-side scalar: |V|. base = teleport share per node;
    // the div truncation loses < N·1e-12 of total mass — the price of
    // integer exactness.
    val nCount = n.count()
    require(nCount > 0, "pageRank requires a non-empty node set")
    val base = Scale / nCount
    // Out-degrees ride WITH the rank frame (one left join at init, not
    // one per iteration): rank rows are (id, fx, od).
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val r0 = n
      .join(outdeg.withColumnRenamed("src", "id"), Seq("id"), "left")
      .select(col("id"), lit(base).as("fx"), coalesce(col("od"), lit(0L)).as("od"))
    val ranks = (1 to iters).foldLeft(shortCircuit(r0)) { (r, _) =>
      val contrib = e
        .join(r.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("fx div od").as("c"))
      val recv = contrib.groupBy(col("id")).agg(sum(col("c")).as("recv"))
      // Dangling mass: rank stuck on out-degree-0 nodes, redistributed
      // uniformly. One row; the crossJoin broadcasts a scalar.
      val dang = r.filter(col("od") === 0L)
        .agg(coalesce(sum(col("fx")), lit(0L)).as("dang"))
      shortCircuit(r.join(recv, Seq("id"), "left")
        .crossJoin(broadcast(dang))
        .select(col("id"),
          (lit((DampDen - DampNum) * base) +
            lit(DampNum) * (coalesce(col("recv"), lit(0L)) +
              expr(s"dang div ${nCount}L"))).as("_mix"),
          col("od"))
        .select(col("id"), expr(s"_mix div ${DampDen}L").as("fx"), col("od")))
    }
    // Readable double via the q81 fixed-point idiom: one exact int64→
    // double conversion (fx < 2^53), floor, one final division — both
    // engines compute the identical double.
    ranks.select(col("id"), col("fx").as("rank_fx"),
      (floor(col("fx").cast("double") / lit(1000.0)) / lit(1e6)).as("rank"))
  }

  /** Rebase an iteration result on its own persisted RDD: the returned
    * frame's logical plan is a flat scan of that RDD, so a recurrence
    * referencing it N times costs N short subtrees, not N copies of
    * the whole upstream tree (without this, k self-referencing
    * generations give a 3^k-node plan and analysis time explodes —
    * the Dataset-API analog of GraphX's iteration checkpointing).
    * Lazy: nothing runs until the first action; the RDD persist makes
    * later references reuse, and the bracket releases it.
    */
  private def shortCircuit(df: DataFrame): DataFrame = {
    val rdd = df.rdd.persist()
    CacheScope.trackRelease(() => { rdd.unpersist(blocking = false); () })
    df.sparkSession.createDataFrame(rdd, df.schema)
  }
}
