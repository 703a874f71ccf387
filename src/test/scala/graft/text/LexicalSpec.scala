package graft.text

import graft.SparkSpec

class LexicalSpec extends SparkSpec {
  import spark.implicits._

  test("lexicalStats: hand-computed entropy/TTR/hapax on small docs") {
    val docs = Seq(
      (1L, "a a a a"),             // one word type, zero hapax
      (2L, "x y z"),               // all hapax
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Lexical.lexicalStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.length === 2) // null text dropped

    val d1 = got(0)
    assert(d1.getAs[Long]("n_words") === 4L)
    assert(d1.getAs[Long]("n_distinct") === 1L)
    assert(d1.getAs[Long]("n_hapax") === 0L)
    assert(d1.getAs[Double]("ttr") === 0.25)
    assert(d1.getAs[Double]("hapax_ratio") === 0.0)
    // chars of "a a a a": 'a' x4, ' ' x3, n=7 -> H = (4/7)ln(7/4)+(3/7)ln(7/3)
    val h1 = (math.floor(4.0 / 7 * math.log(7.0 / 4) * 1e9).toLong +
      math.floor(3.0 / 7 * math.log(7.0 / 3) * 1e9).toLong) / 1000 / 1e6
    assert(d1.getAs[Double]("char_entropy") === h1)

    val d2 = got(1)
    assert(d2.getAs[Long]("n_words") === 3L)
    assert(d2.getAs[Double]("ttr") === 1.0)
    assert(d2.getAs[Double]("hapax_ratio") === 1.0)
    // "x y z": x,y,z once each + 2 spaces, n=5
    val h2 = (3 * math.floor(1.0 / 5 * math.log(5.0) * 1e9).toLong +
      math.floor(2.0 / 5 * math.log(5.0 / 2) * 1e9).toLong) / 1000 / 1e6
    assert(d2.getAs[Double]("char_entropy") === h2)
  }
}
