package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Aho–Corasick matcher: agreement with naive contains on seeded fuzz,
  * the classic overlapping/suffix cases, and the codegen'd column
  * path.
  */
class AhoCorasickSpec extends SparkSpec {

  test("automaton agrees with naive contains on overlapping/suffix patterns") {
    val pats = Array("he", "she", "his", "hers", "s")
    val ac = new AhoCorasick(pats)
    val cases = Seq("ushers", "this", "he", "xyz", "shishi", "", "hershey")
    cases.foreach { s =>
      val want = pats.zipWithIndex.collect { case (p, i) if s.contains(p) => i }
      assert(ac.matches(s).toSeq == want.toSeq, s"mismatch on '$s'")
    }
  }

  test("seeded fuzz: matches == naive contains over random texts and patterns") {
    val rnd = new scala.util.Random(99L)
    for (_ <- 1 to 50) {
      val alphabet = "abc"
      def rs(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(3))).mkString
      val pats = (1 to 6).map(_ => rs(1 + rnd.nextInt(4))).distinct.toArray
      val ac = new AhoCorasick(pats)
      val text = rs(40)
      val want = pats.zipWithIndex.collect { case (p, i) if text.contains(p) => i }
      assert(ac.matches(text).toSeq == want.toSeq,
        s"mismatch: text='$text' pats=${pats.mkString(",")}")
    }
  }

  test("column path matches per-pattern contains() on a corpus (codegen)") {
    val s = spark
    import s.implicits._
    val pats = Seq("quick brown", "lazy dog", "parquet", "og ne")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the bank"),
      (2L, "columnar parquet scans prune row groups"),
      (3L, "nothing to see here"),
      (4L, "the dog nearby: lazy dog neighbors")) // "og ne" spans words
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        AcFunctions.multiContains(col("text"), pats).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val want = docs.collect().map { r =>
      r.getLong(0) -> pats.zipWithIndex
        .collect { case (p, i) if r.getString(1).contains(p) => i }.toSeq
    }.toMap
    assert(got == want)
    assert(got(4L).contains(3), "cross-word substring must match")
  }
}
