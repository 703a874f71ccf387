package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("multi-pass blocking recovers pairs each single pass misses; weights decide") {
    // entity 1: name typo breaks the name block, zip intact
    // entity 2: moved (zip differs), name intact
    // entity 3: unrelated record sharing a zip block with 1 (non-match)
    val left = Seq(
      (1L, "alice cooper", "90210"),
      (2L, "bob dylan", "10001"),
      (3L, "carol king", "90210"))
      .toDF("id_a", "name_a", "zip_a")
    val right = Seq(
      (11L, "alice cooperX", "90210"),
      (12L, "bob dylan", "94105"),
      (13L, "zed zeppelin", "90210"))
      .toDF("id_b", "name_b", "zip_b")
    val got = Linkage.link(
      left, right, "id_a", "id_b",
      blocks = Seq(
        (col("name_a"), col("name_b")), // exact-name pass
        (col("zip_a"), col("zip_b"))), // zip pass
      features = Seq(
        Linkage.Feature("name_prefix",
          substring(col("name_a"), 1, 8) === substring(col("name_b"), 1, 8),
          5L, -3L),
        Linkage.Feature("zip", col("zip_a") === col("zip_b"), 3L, -1L)),
      threshold = 4L)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long, Boolean)].collect().toSeq

    // candidates: (1,11) via zip, (1,13) via zip, (3,11) via zip,
    // (3,13) via zip, (2,12) via name
    assert(got.map(r => (r._1, r._2)).toSet ===
      Set((1L, 11L), (1L, 13L), (3L, 11L), (3L, 13L), (2L, 12L)))
    val decisions = got.map(r => (r._1, r._2) -> r._4).toMap
    assert(decisions((1L, 11L)) === true)  // typo pair: 5 + 3 = 8
    assert(decisions((2L, 12L)) === true)  // moved pair: 5 - 1 = 4
    assert(decisions((1L, 13L)) === false) // zip-only collision: -3 + 3 = 0
    assert(decisions((3L, 13L)) === false)
  }
}
