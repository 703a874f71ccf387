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

  test("pageRankPersonalized: mass stays near the seeds; uniform-seed case degenerates to pageRank-like spread") {
    val nodes = (0L to 7L)
    // chain 0→1→2→3 plus an island {6,7} unreachable from the seed
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (6L, 7L), (7L, 6L))
    val got = CacheScope.withReleased {
      Graph.pageRankPersonalized(
        nodes.toDF("id"), edges.toDF("src", "dst"),
        Seq(0L).toDF("id"), iters = 4)
        .select(col("id"), col("rank_fx")).as[(Long, Long)].collect().toMap
    }
    // the seed holds the most mass; proximity decays along the chain
    assert(got(0L) > got(1L) && got(1L) > got(2L) && got(2L) > got(3L))
    // nothing teleports to the unreachable island
    assert(got(6L) == 0L && got(7L) == 0L)
    // node 5 (isolated, not a seed) also gets nothing
    assert(got(5L) == 0L)
  }

  test("labelPropagation: seeds clamp, majority wins, ties break to the smallest label") {
    val s = spark
    import s.implicits._
    // 1 is adjacent to seeds {0:a, 2:b, 4:b} → majority b;
    // 3 is adjacent to seeds {0:a, 2:b} → tie → 'a' (smallest);
    // 5 is unreachable → stays null; seed 0 keeps 'a' even though its
    // only neighbors vote 'b'.
    val labels = Seq(
      (0L, Some("a")), (2L, Some("b")), (4L, Some("b")),
      (1L, None), (3L, None), (5L, None))
      .toDF("id", "lab")
    val edges = Seq((0L, 1L), (2L, 1L), (4L, 1L), (0L, 3L), (2L, 3L),
      (1L, 0L), (2L, 0L))
      .toDF("src", "dst")
    val got = CacheScope.withReleased {
      Graph.labelPropagation(labels, edges, iters = 2)
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    }
    assert(got(1L) == Some("b"))
    assert(got(3L) == Some("a"))
    assert(got(5L) == None)
    assert(got(0L) == Some("a"), "seed labels must clamp")
  }

  test("labelPropagation is partitioning-independent") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    val labels = (0L until 50L)
      .map(i => (i, if (i % 3 == 0) Some(s"l${rnd.nextInt(4)}") else None))
      .toDF("id", "lab")
    val edges = (0L until 50L).flatMap(a =>
      Seq((a, (a * 11 + 3) % 50), (a, (a * 17 + 7) % 50))).toDF("src", "dst")
    val a = CacheScope.withReleased {
      Graph.labelPropagation(labels, edges, 3)
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    }
    val b = CacheScope.withReleased {
      Graph.labelPropagation(labels.repartition(7), edges.repartition(9), 3)
        .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    }
    assert(a == b)
  }

  test("triangleStats: K4, path, isolated node; random graphs match brute force") {
    val s = spark
    import s.implicits._
    // K4 on {0..3} (every node: degree 3, 3 triangles), path 4-5-6
    // (no triangles), isolated 7
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)
    val pairs = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("doc_a", "doc_b")
    val got = Graph.triangleStats((0L to 7L).toDF("id"), pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (0L to 3L).foreach(i => assert(got(i) == ((3L, 3L))))
    assert(got(4L) == ((1L, 0L)) && got(5L) == ((2L, 0L)) && got(6L) == ((1L, 0L)))
    assert(got(7L) == ((0L, 0L)))

    // seeded fuzz vs brute force
    val rnd = new scala.util.Random(31L)
    val edges = (for { a <- 0L until 20L; b <- 0L until 20L
      if a < b && rnd.nextDouble() < 0.3 } yield (a, b)).distinct
    val fuzz = Graph.triangleStats((0L until 20L).toDF("id"),
        edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val es = edges.toSet
    def adj(a: Long, b: Long) = es.contains((math.min(a, b), math.max(a, b)))
    val brute = (0L until 20L).map { v =>
      v -> (for { a <- 0L until 20L; b <- 0L until 20L
        if a < b && a != v && b != v && adj(v, a) && adj(v, b) && adj(a, b) } yield 1).size.toLong
    }.toMap
    assert(fuzz == brute)
  }

  /** Independent local coreness: sequential Batagelj–Zaversnik peel
    * (remove min-degree nodes, coreness = degree at removal time) —
    * a DIFFERENT algorithm from the distributed H-index iteration, so
    * agreement checks the math, not the implementation against itself.
    */
  private def localCoreness(
      nodes: Seq[Long], und: Seq[(Long, Long)]): Map[Long, Long] = {
    var adj = nodes.map(n => n ->
      und.collect { case (a, b) if a == n => b; case (a, b) if b == n => a }.toSet).toMap
    var core = Map.empty[Long, Long]
    var k = 0L
    while (adj.nonEmpty) {
      val peel = adj.filter(_._2.size <= k).keys.toSeq
      if (peel.isEmpty) k += 1
      else {
        peel.foreach { v => core += v -> k; adj -= v }
        adj = adj.map { case (n, s) => n -> (s -- peel) }
      }
    }
    core
  }

  private def corenessRun(
      nodes: Seq[Long], und: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    CacheScope.withReleased {
      val sym = und ++ und.map(_.swap)
      Graph.coreness(nodes.toDF("id"), sym.toDF("src", "dst"), iters)
        .as[(Long, Long)].collect().toMap
    }

  test("coreness matches a sequential peel on triangle+tail, K4, and isolated nodes") {
    // K4 {0,1,2,3} (core 3), a triangle {4,5,6} with tail 6-7 (core 2/1),
    // a bridge 3-4, an isolated node 8
    val und = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L), (3L, 4L))
    val nodes = 0L to 8L
    val got = corenessRun(nodes, und, iters = 8)
    assert(got === localCoreness(nodes, und) ++ Map(8L -> 0L))
    assert(got(0L) === 3L && got(6L) === 2L && got(7L) === 1L && got(8L) === 0L)
  }

  test("coreness matches the sequential peel on seeded random graphs") {
    // hand-rolled LCG (scalacheck unavailable offline); 3 seeds x
    // 18-node graphs with ~2.2 edges/node
    for (seed <- Seq(7L, 101L, 9001L)) {
      var s = seed
      def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
      val nodes = 0L until 18L
      val und = (0 until 40).map { _ =>
        val a = math.floorMod(next(), 18L)
        val b = math.floorMod(next(), 18L)
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val got = corenessRun(nodes, und, iters = 16)
      val want = localCoreness(nodes, und) ++
        nodes.filterNot(n => und.exists(e => e._1 == n || e._2 == n))
          .map(_ -> 0L).toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("coreness is idempotent past convergence (extra rounds change nothing)") {
    val und = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L))
    val nodes = 0L to 4L
    assert(corenessRun(nodes, und, iters = 3) === corenessRun(nodes, und, iters = 12))
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
