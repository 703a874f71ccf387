package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: Seq[(String, String, Double)]) =
    rows.toDF("grp", "day", "v")

  test("merge of incremental partials equals partials of the union, exactly") {
    val a = mk(Seq(("x", "d1", 1.25), ("x", "d1", 2.50), ("y", "d1", 10.00)))
    val b = mk(Seq(("x", "d1", 0.25), ("x", "d2", 4.00), ("z", "d1", -1.75)))
    val keys = Seq("grp", "day")
    val inc = IncrementalAgg.merge(
      IncrementalAgg.partials(a, keys, col("v")),
      IncrementalAgg.partials(b, keys, col("v")))
    val full = IncrementalAgg.partials(a.unionByName(b), keys, col("v"))
    val gi = inc.orderBy("grp", "day").collect().toSeq
    val gf = full.orderBy("grp", "day").collect().toSeq
    assert(gi === gf)
  }

  test("merge is associative/commutative across three batches") {
    val batches = Seq(
      mk(Seq(("a", "d", 1.10), ("b", "d", 2.20))),
      mk(Seq(("a", "d", 3.30))),
      mk(Seq(("b", "d", -0.40), ("c", "d", 0.00))))
    val keys = Seq("grp", "day")
    val ps = batches.map(IncrementalAgg.partials(_, keys, col("v")))
    val fwd = IncrementalAgg.merge(ps: _*)
    val rev = IncrementalAgg.merge(ps.reverse: _*)
    // fold pairwise too: merge(merge(p0, p1), p2)
    val folded = IncrementalAgg.merge(IncrementalAgg.merge(ps(0), ps(1)), ps(2))
    val e = fwd.orderBy("grp", "day").collect().toSeq
    assert(rev.orderBy("grp", "day").collect().toSeq === e)
    assert(folded.orderBy("grp", "day").collect().toSeq === e)
  }

  test("finalizeAgg derives exact total and grid-floored mean") {
    val st = IncrementalAgg.partials(
      mk(Seq(("g", "d", 1.00), ("g", "d", 2.00), ("g", "d", 2.00))),
      Seq("grp", "day"), col("v"))
    val r = IncrementalAgg.finalizeAgg(st).head()
    assert(r.getAs[Long]("n") === 3L)
    assert(r.getAs[Double]("total") === 5.0)
    // 5/3 floored to the 1e-6 grid
    assert(r.getAs[Double]("mean") === 1.666666)
    assert(r.getAs[Double]("min_v") === 1.0)
    assert(r.getAs[Double]("max_v") === 2.0)
  }

  test("merge rejects mismatched state keys") {
    val p1 = IncrementalAgg.partials(mk(Seq(("a", "d", 1.0))), Seq("grp", "day"), col("v"))
    val p2 = IncrementalAgg.partials(
      mk(Seq(("a", "d", 1.0))).withColumnRenamed("day", "other"),
      Seq("grp", "other"), col("v"))
    val e = intercept[IllegalArgumentException](IncrementalAgg.merge(p1, p2))
    assert(e.getMessage.contains("key mismatch"))
  }
}
