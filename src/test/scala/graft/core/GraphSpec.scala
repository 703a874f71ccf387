package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Local reference: the same integer fixed-point iteration in plain
    * Scala, so the distributed plan is checked against an
    * independently-written implementation (not itself).
    */
  private def localPageRank(
      nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val n = nodes.distinct
    val base = Graph.Scale / n.size
    val od = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var fx = n.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val recv = edges
        .groupBy(_._2)
        .map { case (d, es) => d -> es.map(e => fx(e._1) / od(e._1)).sum }
      val dang = n.filter(id => !od.contains(id)).map(fx).sum
      fx = n.map { id =>
        id -> (15L * base + 85L * (recv.getOrElse(id, 0L) + dang / n.size)) / 100L
      }.toMap
    }
    fx
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    CacheScope.withReleased {
      Graph.pageRank(
        nodes.toDF("id"), edges.toDF("src", "dst"), iters)
        .select(col("id"), col("rank_fx")).as[(Long, Long)].collect().toMap
    }

  test("pageRank matches an independent local implementation on a mixed graph") {
    // hub (0 pointed to by all), a 2-cycle, a dangling node (4), an
    // isolated node (5).
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 5L)
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (1L, 2L), (2L, 1L), (0L, 4L))
    val got = run(nodes, edges, 5)
    assert(got == localPageRank(nodes, edges, 5))
    // the all-pointed-to hub and its sole successor outrank the
    // isolated node, which holds only teleport + dangling share
    assert(got(0L) > got(5L) && got(4L) > got(5L))
    assert(got(5L) < got(1L))
  }

  test("pageRank on a symmetric complete graph is uniform and conserves mass") {
    val nodes = (0L to 4L)
    val edges = for { a <- nodes; b <- nodes if a != b } yield (a, b)
    val got = run(nodes, edges, 3)
    assert(got.values.toSet.size == 1)
    // total mass stays within iters·N units of integer truncation
    val total = got.values.sum
    assert(total <= Graph.Scale && total > Graph.Scale - 4 * 5 * 100)
  }

  test("pageRank is partitioning-independent (exact fx equality)") {
    val nodes = (0L until 40L)
    val edges = nodes.flatMap(a => Seq((a, (a * 7 + 3) % 40), (a, (a * 13 + 1) % 40)))
    val a = run(nodes, edges, 4)
    val b = CacheScope.withReleased {
      Graph.pageRank(
        nodes.toDF("id").repartition(7),
        edges.toDF("src", "dst").repartition(11), 4)
        .select(col("id"), col("rank_fx")).as[(Long, Long)].collect().toMap
    }
    assert(a == b)
  }

  test("pageRank releases its operator-managed persists inside a CacheScope bracket") {
    val nodes = (0L to 9L)
    val edges = nodes.map(a => (a, (a + 1) % 10))
    // delta-based: the session is shared across suites, so assert no
    // NEW storage survives the bracket rather than global emptiness
    val before = spark.sparkContext.getPersistentRDDs.keySet
    CacheScope.withReleased {
      Graph.pageRank(nodes.toDF("id"), edges.toDF("src", "dst"), 2).count()
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"bracket leaked RDDs: $leaked")
  }
}
