package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Temporal operators: AS-OF join (union + carry-forward window) and
  * gap sessionization — semantics pinned on handcrafted timelines
  * covering the boundary cases the oracle data rarely hits exactly
  * (equal-ts inclusivity, gap == threshold, equal-ts tiebreaks).
  */
class TemporalSpec extends SparkSpec {

  test("asofJoin picks the latest right row at or before each left ts") {
    val s = spark
    import s.implicits._
    val trades = Seq((1L, "k", 100L), (2L, "k", 205L), (3L, "k", 50L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("k", 90L, 1.0), ("k", 100L, 2.0), ("k", 200L, 3.0))
      .toDF("sym", "t", "px")
    val got = Joins.asofJoin(trades, quotes, Seq("sym"), "t", rightTsAs = "qt")
      .orderBy("trade_id")
      .collect()
      .map(r => (r.getAs[Long]("trade_id"), Option(r.getAs[Any]("qt")), Option(r.getAs[Any]("px"))))
    assert(got(0) === ((1L, Some(100L), Some(2.0))), "equal ts must match (inclusive bound)")
    assert(got(1) === ((2L, Some(200L), Some(3.0))))
    assert(got(2) === ((3L, None, None)), "no preceding quote -> nulls")
  }

  test("asofJoinTolerance: within-bound match kept, boundary inclusive, stale match nulled whole") {
    val s = spark
    import s.implicits._
    val trades = Seq((1L, "k", 100L), (2L, "k", 150L), (3L, "k", 151L), (4L, "k", 40L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("k", 90L, 1.0), ("k", 100L, 2.0)).toDF("sym", "t", "px")
    val got = Joins.asofJoinTolerance(trades, quotes, Seq("sym"), "t",
        tolerance = 50L, rightTsAs = "qt")
      .orderBy("trade_id").collect()
      .map(r => (r.getAs[Long]("trade_id"), Option(r.getAs[Any]("qt")), Option(r.getAs[Any]("px"))))
    assert(got(0) === ((1L, Some(100L), Some(2.0))), "gap 0 matches")
    assert(got(1) === ((2L, Some(100L), Some(2.0))), "gap == tolerance is inclusive")
    assert(got(2) === ((3L, None, None)), "gap just past tolerance nulls the WHOLE match")
    assert(got(3) === ((4L, None, None)), "no preceding quote stays null")
  }

  test("coalesceIntervals: overlapping and touching spans merge, gaps split, keys isolate") {
    val s = spark
    import s.implicits._
    val iv = Seq(
      ("a", 0L, 10L), ("a", 5L, 20L),   // overlap -> one span
      ("a", 20L, 30L),                  // touching (start == prev end) -> same span
      ("a", 41L, 50L),                  // gap -> new span
      ("b", 0L, 10L))                   // other key untouched by a's spans
      .toDF("k", "lo", "hi")
    val got = Ranges.coalesceIntervals(iv, Seq("k"), "lo", "hi")
      .orderBy("k", "span_start").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(
      ("a", 0L, 30L, 3L),
      ("a", 41L, 50L, 1L),
      ("b", 0L, 10L, 1L)))
  }

  test("asofJoin: keys never match across partitions; equal-ts right dups resolve by tiebreak") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("id", "k", "t")
    val right = Seq(("a", 10L, 5.0), ("a", 10L, 9.0), ("b", 5L, 1.0))
      .toDF("k", "t", "v")
    val got = Joins.asofJoin(left, right, Seq("k"), "t",
      tiebreak = Seq(col("v")), rightTsAs = "rt")
      .orderBy("id").collect()
    assert(got(0).getAs[Double]("v") === 9.0, "tiebreak keeps the greatest v")
    assert(got(1).getAs[Double]("v") === 1.0, "key b must not see key a's quotes")
  }

  test("asofJoin ignores NULL-ts right rows (ASOF semantics never match NULL)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "k", 100L)).toDF("id", "k", "t")
    val right = Seq(
      ("k", null.asInstanceOf[java.lang.Long], 9.0),
      ("k", java.lang.Long.valueOf(50L), 1.0))
      .toDF("k", "t", "v")
    val row = Joins.asofJoin(left, right, Seq("k"), "t").head()
    assert(row.getAs[Double]("v") === 1.0,
      "a NULL-ts right row must not shadow the genuine latest quote")
    val noQuote = Joins.asofJoin(left,
      right.filter(col("t").isNull), Seq("k"), "t").head()
    assert(noQuote.isNullAt(noQuote.fieldIndex("v")),
      "only NULL-ts right rows -> no match at all")
  }

  test("asofJoin carries the whole right row atomically (null payload fields do not fall through)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "k", 100L)).toDF("id", "k", "t")
    val right = Seq(("k", 10L, java.lang.Double.valueOf(7.0)), ("k", 90L, null.asInstanceOf[java.lang.Double]))
      .toDF("k", "t", "v")
    val row = Joins.asofJoin(left, right, Seq("k"), "t").head()
    assert(row.getAs[Long]("asof_ts") === 90L)
    assert(row.isNullAt(row.fieldIndex("v")),
      "latest right row's NULL must win — not an older non-null value")
  }

  test("sessionize splits strictly-greater-than-gap boundaries, 1-based per key") {
    val s = spark
    import s.implicits._
    // gaps: 10 (cont), 11 (new), exactly 10 (cont) — threshold is >gap.
    val ev = Seq(
      (1L, 1L, 0L), (1L, 2L, 10L), (1L, 3L, 21L), (1L, 4L, 31L),
      (2L, 5L, 1000L))
      .toDF("uid", "eid", "t")
    val got = Sessions.sessionize(ev, Seq("uid"), col("t"), Seq(col("eid")), gap = 10L)
      .orderBy("eid").collect()
      .map(r => (r.getAs[Long]("eid"), r.getAs[Long]("session_id")))
    assert(got.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L), (5L, 1L)))
  }

  test("intervalJoin: half-open containment, key isolation, bucket-boundary spans") {
    val s = spark
    import s.implicits._
    // interval [10, 30) with bucket 8 spans buckets 1..3; points probe
    // the lo (inclusive) and hi (exclusive) edges and a foreign key.
    val iv = Seq(("k", 100L, 10L, 30L)).toDF("key", "iv_id", "lo", "hi")
    val pts = Seq(
      ("k", 9L), ("k", 10L), ("k", 29L), ("k", 30L), ("z", 15L))
      .toDF("key", "p")
    val got = Ranges.intervalJoin(pts, "p", iv, "lo", "hi", bucket = 8L, keys = Seq("key"))
      .select("p").collect().map(_.getLong(0)).sorted
    assert(got.toSeq === Seq(10L, 29L),
      "exactly lo (inclusive) and hi-1 survive; hi, below-lo, and foreign keys do not")
    // no duplicate matches from multi-bucket intervals
    assert(got.length === got.distinct.length)
  }

  test("intervalJoin accepts awkward column names (spaces, dashes, dots)") {
    val s = spark
    import s.implicits._
    val iv = Seq(("k", 10L, 30L)).toDF("key", "lo bound", "hi-bound")
    val pts = Seq(("k", 15L), ("k", 35L)).toDF("key", "p.x")
    val got = Ranges.intervalJoin(pts, "p.x", iv, "lo bound", "hi-bound",
      bucket = 8L, keys = Seq("key"))
      .select(col("`p.x`")).collect().map(_.getLong(0))
    assert(got.toSeq === Seq(15L),
      "quoted name handling must cover the residual filter, not just the div expr")
  }

  test("funnel stageTimes: stages count only at-or-after the previous stage's first completion") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // user 1: click BEFORE signup must not count; full funnel after
      (1L, 1L, 10L, "click"), (1L, 2L, 20L, "signup"),
      (1L, 3L, 30L, "click"), (1L, 4L, 40L, "purchase"),
      // user 2: signup only
      (2L, 5L, 10L, "signup"),
      // user 3: purchase with no qualifying click -> stage 1
      (3L, 6L, 10L, "signup"), (3L, 7L, 20L, "purchase"),
      // user 4: never signed up -> stage 0
      (4L, 8L, 10L, "click"), (4L, 9L, 20L, "purchase"))
      .toDF("uid", "eid", "t", "etype")
    val got = Funnels.stageTimes(ev, Seq("uid"), col("t"), Seq(col("eid")),
      col("etype"), Seq("signup", "click", "purchase"))
      .orderBy("uid").collect()
      .map(r => (r.getAs[Long]("uid"), Option(r.getAs[Any]("t_click")), r.getAs[Int]("stage_reached")))
    assert(got.toSeq === Seq(
      (1L, Some(30L), 3), (2L, None, 1), (3L, None, 1), (4L, None, 0)))
  }

  test("stageTimes rejects duplicate stage names and key/output collisions") {
    val s = spark
    import s.implicits._
    val ev = Seq((1L, 1L, 10L, "a")).toDF("uid", "eid", "t", "etype")
    intercept[IllegalArgumentException] {
      Funnels.stageTimes(ev, Seq("uid"), col("t"), Seq(col("eid")),
        col("etype"), Seq("a", "b", "a"))
    }
    val clash = ev.withColumnRenamed("uid", "t_a")
    intercept[IllegalArgumentException] {
      Funnels.stageTimes(clash, Seq("t_a"), col("t"), Seq(col("eid")),
        col("etype"), Seq("a", "b"))
    }
  }

  test("asofJoin rejects payload/left and rightTsAs collisions up front") {
    val s = spark
    import s.implicits._
    val left = Seq(("k", 10L, "x")).toDF("k", "t", "px")
    val rightClash = Seq(("k", 5L, "y")).toDF("k", "t", "px")
    intercept[IllegalArgumentException] {
      Joins.asofJoin(left, rightClash, Seq("k"), "t")
    }
    val right = Seq(("k", 5L, "y")).toDF("k", "t", "quote")
    intercept[IllegalArgumentException] {
      Joins.asofJoin(left, right, Seq("k"), "t", rightTsAs = "quote")
    }
    intercept[IllegalArgumentException] {
      Joins.asofJoin(left, right, Seq("k"), "t", rightTsAs = "px")
    }
  }

  test("retentionMatrix: first-seen day cohorts x day offsets, distinct users") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 23:00:00"),
      (1L, "2024-01-03 05:00:00"),
      (2L, "2024-01-01 01:00:00"),
      (3L, "2024-01-02 09:00:00"))
      .toDF("user_id", "t")
      .select(col("user_id"), col("t").cast("timestamp").as("ts"))
    val got = Funnels.retentionMatrix(ev, "user_id", col("ts"))
      .orderBy("cohort_day", "day_offset").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L), ("2024-01-02", 0, 1L)))
  }

  test("q93-shape SCD2: consecutive duplicate states collapse, intervals chain, last is open") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "a"), (1L, 3L, 30L, "b"), (1L, 4L, 40L, "a"))
      .toDF("user_id", "event_id", "tt", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("tt"), col("event_id"))
    val changes = ev
      .withColumn("__prev", lag(col("event_type"), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col("event_type"))
      .withColumn("valid_to", lead(col("tt"), 1).over(w))
      .select(col("event_type"), col("tt"), col("valid_to"))
      .orderBy(col("tt")).collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getAs[Any]("valid_to"))))
    assert(changes.toSeq === Seq(
      ("a", 10L, Some(30L)), ("b", 30L, Some(40L)), ("a", 40L, None)),
      "the repeat at t=20 must collapse; intervals must chain without gaps")
  }

  test("sessionStats rolls up count/min/max/sum per session") {
    val s = spark
    import s.implicits._
    val ev = Seq((1L, 1L, 0L, 1.5), (1L, 2L, 5L, 2.5), (1L, 3L, 100L, 4.0))
      .toDF("uid", "eid", "t", "v")
    val got = Sessions.sessionStats(ev, Seq("uid"), col("t"), Seq(col("eid")),
      gap = 10L, value = col("v"))
      .orderBy("session_id").collect()
    assert(got.length === 2)
    assert(got(0).getAs[Long]("n_events") === 2L)
    assert(got(0).getAs[Long]("t_start") === 0L && got(0).getAs[Long]("t_end") === 5L)
    assert(got(0).getAs[Double]("sum_v") === 4.0)
    assert(got(1).getAs[Long]("n_events") === 1L)
    assert(got(1).getAs[Double]("sum_v") === 4.0)
  }
}
