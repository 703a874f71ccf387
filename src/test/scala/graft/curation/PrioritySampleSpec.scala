package graft.curation

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Per-group priority sampling: exact size per group, brute-force rank
  * equality, weight bias, invalid-weight drops, and partitioning
  * invariance.
  */
class PrioritySampleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 200L)
    .map(i => (i, if (i % 2 == 0) "even" else "odd", 1L + (i % 7)))
    .toDF("id", "grp", "w")

  test("exactly k rows per group, ranks 1..k, brute-force order agrees") {
    val got = Curation.prioritySamplePerGroup(docs, "id", "grp", col("w"), 5)
    val byGroup = got.groupBy("grp").agg(count(lit(1)).as("n"),
      sort_array(collect_list(col("sample_rank"))).as("rks"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
    assert(byGroup.length === 2)
    byGroup.foreach { case (_, n, rks) =>
      assert(n === 5L); assert(rks === Seq(1L, 2L, 3L, 4L, 5L))
    }
    // brute force: same key formula computed locally
    val keys = docs.select(col("id"), col("grp"), col("w"),
        ((Curation.hashSampleKey(col("id")) + lit(1L)).cast("double") /
          col("w").cast("double")).as("key"))
      .collect().map(r => (r.getString(1), r.getDouble(3), r.getLong(0)))
    val want = keys.groupBy(_._1).view.mapValues(
      _.sortBy(t => (t._2, t._3)).take(5).map(_._3).toSet).toMap
    val gotIds = got.collect()
      .groupBy(_.getAs[String]("grp")).view.mapValues(
        _.map(_.getAs[Long]("id")).toSet).toMap
    assert(gotIds === want)
  }

  test("heavier rows are favored: a dominant weight is always sampled") {
    val skewed = docs.withColumn("w",
      when(col("id") === 42L, lit(1000000L)).otherwise(lit(1L)))
    val got = Curation.prioritySamplePerGroup(skewed, "id", "grp", col("w"), 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got.contains(42L),
      "a weight 1e6x the rest must survive any hash draw at k=3")
  }

  test("non-positive and null weights are never sampled") {
    val withBad = Seq((1L, "g", Some(5L)), (2L, "g", Some(0L)),
      (3L, "g", Some(-2L)), (4L, "g", None: Option[Long]))
      .toDF("id", "grp", "w")
    val got = Curation.prioritySamplePerGroup(withBad, "id", "grp", col("w"), 10)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
  }

  test("partitioning-invariant: 1 vs 16 partitions pick the same sample") {
    val a = Curation.prioritySamplePerGroup(
      docs.coalesce(1), "id", "grp", col("w"), 7)
      .select("grp", "id", "sample_rank").orderBy("grp", "sample_rank")
      .collect().toSeq
    val b = Curation.prioritySamplePerGroup(
      docs.repartition(16), "id", "grp", col("w"), 7)
      .select("grp", "id", "sample_rank").orderBy("grp", "sample_rank")
      .collect().toSeq
    assert(a === b)
  }
}
