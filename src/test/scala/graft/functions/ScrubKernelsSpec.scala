package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded-random property tests for the compiled scrub_lines kernel
  * against a straightforward Scala model (split → drop cut positions →
  * rejoin). Runs through a DataFrame so the codegen path executes.
  */
class ScrubKernelsSpec extends SparkSpec {

  private def model(text: String, ps: Seq[Long], sep: String): (String, Long, Long) = {
    val lines = text.split(java.util.regex.Pattern.quote(sep), -1)
    val cut = ps.toSet
    val kept = lines.zipWithIndex.collect { case (l, i) if !cut(i + 1L) => l }
    (kept.mkString(sep), lines.length.toLong,
      lines.indices.count(i => cut(i + 1L)).toLong)
  }

  private def check(sep: String, seed: Long): Unit = {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(seed)
    val alphabet = Seq("aa", "bb", "cc", "", "d d", "ee ff")
    val cases = (0 until 60).map { i =>
      val n = 1 + rnd.nextInt(8)
      val text = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.size))).mkString(sep)
      val ps = (1L to n.toLong).filter(_ => rnd.nextBoolean()).sorted
      (i.toLong, text, ps)
    }
    val got = cases.toDF("id", "text", "ps")
      .withColumn("r", SketchFunctions.scrub_lines(col("text"), col("ps"), sep))
      .select(col("id"), col("r.clean_text"), col("r.n_lines"), col("r.n_removed"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    cases.foreach { case (id, text, ps) =>
      assert(got(id) === model(text, ps, sep),
        s"seed=$seed sep=${sep.replace("\n", "\\n")} text='$text' ps=$ps")
    }
  }

  test("scrub_lines matches the split/drop/rejoin model (newline separator)") {
    Seq(1L, 2L, 3L).foreach(check("\n", _))
  }

  test("scrub_lines matches the model for a multi-char literal separator") {
    // '||' is regex-special when unquoted — the kernel must treat it
    // literally, like the DataFrame-side Pattern.quote split does
    Seq(4L, 5L).foreach(check("||", _))
  }

  test("scrub_lines edge cases: all cut, none cut, trailing separator") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      (1L, "a\nb", Seq(1L, 2L)),   // everything cut -> empty text
      (2L, "a\nb", Seq[Long]()),   // nothing cut -> byte-identical
      (3L, "a\n", Seq(2L)),        // trailing empty line cut
      (4L, "", Seq[Long]()))       // empty doc: one empty line, kept
    val got = cases.toDF("id", "text", "ps")
      .withColumn("r", SketchFunctions.scrub_lines(col("text"), col("ps"), "\n"))
      .select(col("id"), col("r.clean_text"), col("r.n_lines"), col("r.n_removed"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) === (("", 2L, 2L)))
    assert(got(2L) === (("a\nb", 2L, 0L)))
    assert(got(3L) === (("a", 2L, 1L)))
    assert(got(4L) === (("", 1L, 0L)))
  }

  test("scrub_lines rejects unsorted and non-1-based positions loudly") {
    val s = spark
    import s.implicits._
    def run(ps: Seq[Long]): Unit =
      Seq(("a\nb\nc", ps)).toDF("text", "ps")
        .withColumn("r", SketchFunctions.scrub_lines(col("text"), col("ps"), "\n"))
        .select(col("r.clean_text")).collect()
    def rootMessage(t: Throwable): String = {
      var cur = t
      while (cur.getCause != null) cur = cur.getCause
      String.valueOf(cur.getMessage)
    }
    // unsorted: the forward-only pointer would silently skip position 1
    val e1 = intercept[Throwable](run(Seq(3L, 1L)))
    assert(rootMessage(e1).contains("sorted ascending"))
    // zero/negative positions can never match a 1-based line counter
    val e2 = intercept[Throwable](run(Seq(0L, 2L)))
    assert(rootMessage(e2).contains("1-based"))
    // sorted duplicates stay legal (a position may repeat)
    run(Seq(2L, 2L))
  }
}
