package graft.core

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded randomized equivalence: the distributed as-of join and the
  * bucketized interval join against brute-force in-memory references —
  * two independent implementations meeting over random timelines with
  * deliberately high tie rates (small clock domain) so equal-ts and
  * bucket-edge paths are exercised constantly. Hand-rolled seeded
  * loops (scalacheck bridge unavailable offline).
  */
class TemporalPropertySpec extends SparkSpec {

  test("asofJoin == brute-force latest-at-or-before, 40 seeded rounds") {
    val s = spark
    import s.implicits._
    (1 to 40).foreach { seed =>
      val rnd = new Random(seed)
      val nKeys = 1 + rnd.nextInt(4)
      val left = (1 to 30).map(i =>
        (i.toLong, s"k${rnd.nextInt(nKeys)}", rnd.nextInt(20).toLong))
      val right = (1 to 25).map(i =>
        (s"k${rnd.nextInt(nKeys)}", rnd.nextInt(20).toLong, i.toDouble))

      // right deduped per (key, ts) by greatest v — the tiebreak contract
      val rightBest = right.groupBy(r => (r._1, r._2))
        .map { case ((k, t), rs) => (k, t, rs.map(_._3).max) }.toSeq
      val expect = left.map { case (id, k, t) =>
        val cands = rightBest.filter(r => r._1 == k && r._2 <= t)
        val best = if (cands.isEmpty) None else Some(cands.maxBy(_._2))
        id -> ((best.map(_._2), best.map(_._3)))
      }.toMap

      val got = Joins.asofJoin(
        left.toDF("id", "k", "t"),
        right.toDF("k", "t", "v"),
        keys = Seq("k"), tsCol = "t", tiebreak = Seq(col("v")))
        .collect()
        .map(r => r.getAs[Long]("id") ->
          ((Option(r.getAs[Any]("asof_ts")).map(_.asInstanceOf[Long]),
            Option(r.getAs[Any]("v")).map(_.asInstanceOf[Double]))))
        .toMap
      assert(got.size === left.size, s"seed $seed: left rows lost or duplicated")
      left.foreach { case (id, _, _) =>
        assert(got(id) === expect(id), s"seed $seed, left id $id")
      }
    }
  }

  test("intervalJoin == brute-force containment for random buckets, 40 seeded rounds") {
    val s = spark
    import s.implicits._
    (1 to 40).foreach { seed =>
      val rnd = new Random(seed)
      val bucket = 1L + rnd.nextInt(9)
      val ivs = (1 to 15).map { i =>
        val lo = rnd.nextInt(40).toLong
        (i.toLong, s"k${rnd.nextInt(3)}", lo, lo + rnd.nextInt(15).toLong)
      } // hi may equal lo: empty interval, must match nothing
      val pts = (1 to 40).map(i =>
        (i.toLong, s"k${rnd.nextInt(3)}", rnd.nextInt(60).toLong))

      val expect = (for {
        (ivId, ik, lo, hi) <- ivs
        (pId, pk, p) <- pts
        if ik == pk && p >= lo && p < hi
      } yield (ivId, pId)).toSet

      val got = Ranges.intervalJoin(
        pts.toDF("p_id", "k", "p"),
        "p",
        ivs.toDF("iv_id", "k", "lo", "hi"),
        "lo", "hi", bucket = bucket, keys = Seq("k"))
        .select("iv_id", "p_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.distinct.length,
        s"seed $seed: duplicate matches from multi-bucket intervals")
      assert(got.toSet === expect, s"seed $seed (bucket $bucket)")
    }
  }
}
