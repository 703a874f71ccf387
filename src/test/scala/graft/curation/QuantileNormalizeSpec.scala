package graft.curation

import graft.SparkSpec

class QuantileNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("single source is the identity mapping") {
    val df = Seq((1L, "s", 0.3), (2L, "s", 0.1), (3L, "s", 0.9))
      .toDF("id", "src", "score")
    val got = Curation.quantileNormalize(df, "id", "src", "score")
      .orderBy("id").collect()
    got.foreach(r =>
      assert(r.getAs[Double]("norm_score") === r.getAs[Double]("score")))
  }

  test("two sources map onto the global order statistics by the ceil rule") {
    // source a: scores 10,20 (m=2); source b: 1,2,3,4 (m=4); N=6
    // global asc: 1,2,3,4,10,20
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0),
      (3L, "b", 1.0), (4L, "b", 2.0), (5L, "b", 3.0), (6L, "b", 4.0))
      .toDF("id", "src", "score")
    val got = Curation.quantileNormalize(df, "id", "src", "score")
      .orderBy("id").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("norm_score")).toMap
    // a: r=1 -> ceil(1*6/2)=3 -> 3.0 ; r=2 -> 6 -> 20.0
    assert(got(1L) === 3.0 && got(2L) === 20.0)
    // b: r=1 -> ceil(6/4)=2 -> 2.0; r=2 -> 3 -> 3.0; r=3 -> ceil(18/4)=5 -> 10.0; r=4 -> 6 -> 20.0
    assert(got(3L) === 2.0 && got(4L) === 3.0 && got(5L) === 10.0 && got(6L) === 20.0)
  }
}
