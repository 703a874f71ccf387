package graft.dedup

import graft.SparkSpec
import graft.core.CacheScope
import graft.curation.Curation

/** The deterministic release bracket for operator-managed caches: after
  * a `withReleased` block consuming the chain-family operators closes,
  * the storage layer is EMPTY again (getPersistentRDDs has no entries)
  * — the round-6 bench-inflation leak, closed as an API guarantee.
  */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def persistedRddCount: Int = {
    // cached-but-never-materialized DataFrames register with the
    // CacheManager, not the RDD map, so force a GC-free sync point by
    // only counting entries with a live storage level
    spark.sparkContext.getPersistentRDDs.size
  }

  private def assertStorageEmpty(): Unit = {
    assert(persistedRddCount === 0,
      s"storage not empty: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
  }

  // Big enough to clear the LocalResolveRows fast path? No — the fast
  // paths collect and release eagerly, so they never leak; the spec
  // must drive the DISTRIBUTED paths, which it does by shrinking the
  // local threshold through the operators' localLimit parameter.

  test("connectedComponents storage released by the bracket (distributed path)") {
    spark.catalog.clearCache()
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L), (7L, 5L))
      .toDF("doc_a", "doc_b")
    val out = CacheScope.withReleased {
      // localLimit=0 forces the distributed label-propagation path,
      // whose returned labeling stays persisted for consumption
      val labels = Dedup.connectedComponents(pairs, localLimit = 0L)
      val got = labels.orderBy("doc_id").as[(Long, Long)].collect().toSeq
      assert(persistedRddCount > 0, "expected live operator caches inside the bracket")
      got
    }
    assertStorageEmpty()
    assert(out === Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L), (7L, 5L)))
  }

  test("resolveChains storage released by the bracket (distributed path)") {
    spark.catalog.clearCache()
    // keeper chain 4->3->2->1 plus the independent pair (10, 11)
    val mapping = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("keep", "drop")
    val out = CacheScope.withReleased {
      // localLimit=0 forces the distributed pointer-jumping path,
      // whose returned survivor map stays persisted for consumption
      val m = Dedup.resolveChains(mapping, localLimit = 0L)
      val got = m.orderBy("drop").as[(Long, Long)].collect().toSeq
      assert(persistedRddCount > 0, "expected live operator caches inside the bracket")
      got
    }
    assertStorageEmpty()
    assert(out === Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L)))
  }

  test("curateCorpus survivor cache released by the bracket") {
    spark.catalog.clearCache()
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the cat and the dog are in the house and they all sleep there with the mouse"))
      .toDF("id", "text")
    val ids = CacheScope.withReleased {
      val kept = Curation.curateCorpus(docs, "id", "text", minQuality = 0.0)
      kept.select("id").as[Long].collect().toSet
    }
    assertStorageEmpty()
    assert(ids.contains(3L))
    assert(!(ids.contains(1L) && ids.contains(2L)), "exact dup pair must collapse")
  }

  test("brackets nest: inner releases only its own registrations") {
    spark.catalog.clearCache()
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    CacheScope.withReleased {
      val outer = Dedup.connectedComponents(pairs, localLimit = 0L)
      outer.count()
      val outerLive = persistedRddCount
      assert(outerLive > 0)
      CacheScope.withReleased {
        // DIFFERENT edge data: an identical plan would hit Spark's
        // CacheManager plan-dedup and share the outer bracket's cache
        val inner = Dedup.connectedComponents(
          Seq((7L, 8L), (8L, 9L)).toDF("doc_a", "doc_b"), localLimit = 0L)
        inner.count()
        assert(persistedRddCount > outerLive)
      }
      // inner bracket's caches released, outer's untouched
      assert(persistedRddCount === outerLive)
      assert(outer.orderBy("doc_id").count() === 3L)
    }
    assertStorageEmpty()
  }

  test("bracket releases on exception and is a no-op with no registrations") {
    spark.catalog.clearCache()
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    intercept[RuntimeException] {
      CacheScope.withReleased {
        Dedup.connectedComponents(pairs, localLimit = 0L).count()
        throw new RuntimeException("boom")
      }
    }
    assertStorageEmpty()
    // empty bracket
    assert(CacheScope.withReleased(42) === 42)
    assertStorageEmpty()
  }
}
