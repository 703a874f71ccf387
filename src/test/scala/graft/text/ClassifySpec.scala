package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 retrieval + in-engine Naive Bayes: ranking and decision
  * semantics on handcrafted corpora where the right answer is
  * derivable by hand.
  */
class ClassifySpec extends SparkSpec {

  test("bm25TopK ranks higher-tf/shorter docs first and omits docs without query terms") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "spark spark spark filler"),        // tf=3, short
      (2L, "spark filler filler filler filler filler filler filler"), // tf=1, long
      (3L, "filler filler filler filler"),     // no query term
      (4L, "spark spark filler filler"))       // tf=2
      .toDF("doc_id", "text")
    val got = Search.bm25TopK(docs, "doc_id", "text", Seq("spark"), k = 10)
      .collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 4L, 2L),
      "expected tf-desc ranking with the termless doc absent")
    assert(got.forall(_.getAs[Double]("score") > 0.0))
    // fixed-point and the rounded double agree to 1e-6
    got.foreach { r =>
      assert(math.abs(r.getAs[Double]("score") -
        r.getAs[Long]("score_fx").toDouble / 1e9) < 1e-6)
    }
  }

  test("bm25TopK breaks exact score ties by ascending doc id") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (7L, "a b"), (3L, "a b"), (5L, "a b"), (1L, "c d"))
      .toDF("doc_id", "text")
    val got = Search.bm25TopK(docs, "doc_id", "text", Seq("a"), k = 2)
      .collect().map(_.getAs[Long]("doc_id"))
    assert(got.toSeq === Seq(3L, 5L), "identical docs must rank id-ascending")
  }

  test("bm25TopK excludes NULL-text docs from corpus stats (no -1 dl poisoning)") {
    val s = spark
    import s.implicits._
    val clean = Seq((1L, Some("a b")), (2L, Some("a c")))
      .toDF("doc_id", "text")
    val withNull = Seq((1L, Some("a b")), (2L, Some("a c")),
      (3L, None: Option[String]), (4L, None: Option[String]))
      .toDF("doc_id", "text")
    val a = Search.bm25TopK(clean, "doc_id", "text", Seq("a"), k = 10).collect()
    val b = Search.bm25TopK(withNull, "doc_id", "text", Seq("a"), k = 10).collect()
    assert(a.map(r => (r.getLong(0), r.getAs[Long]("score_fx"))).toSeq ===
      b.map(r => (r.getLong(0), r.getAs[Long]("score_fx"))).toSeq,
      "NULL-text rows must not change n/avgdl or scores")
  }

  test("NaiveBayes learns disjoint marker vocabularies and predicts them back") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "en", "the cat sat"),
      (2L, "en", "the dog ran"),
      (3L, "de", "der hund lief"),
      (4L, "de", "der katze sass"))
      .toDF("doc_id", "lang", "text")
    val model = NaiveBayes.fit(docs, "text", "lang")
    val pred = NaiveBayes.predict(model, docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getAs[String]("pred"))
    assert(pred.toSeq === Seq("en", "en", "de", "de"))
  }

  test("NaiveBayes model matrix is dense: unseen (token, class) pairs carry the smoothing floor") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "x", "aa bb"), (2L, "y", "cc"))
      .toDF("doc_id", "lang", "text")
    val model = NaiveBayes.fit(docs, "text", "lang")
    val mat = model.mat.collect()
    assert(mat.length === 6, "3 vocab tokens x 2 classes")
    // class y never saw 'aa': lp = floor(ln(1/(1+3))*1e9)
    val unseen = mat.find(r => r.getAs[String]("lang") == "y" && r.getAs[String]("token") == "aa").get
    assert(unseen.getAs[Long]("lp") === math.floor(math.log(1.0 / 4.0) * 1e9).toLong)
  }

  test("NaiveBayes.predict is complete: null-text and out-of-vocab docs fall back to the prior argmax") {
    val s = spark
    import s.implicits._
    val train = Seq((1L, "a", "x x"), (2L, "a", "x"), (3L, "b", "y"))
      .toDF("doc_id", "lang", "text")
    val model = NaiveBayes.fit(train, "text", "lang")
    val fresh = Seq(
      (10L, "zz qq"),                      // fully out-of-vocab
      (11L, null.asInstanceOf[String]),    // null text
      (12L, "x"))                          // scorable
      .toDF("doc_id", "text")
    val got = NaiveBayes.predict(model, fresh, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred")).toMap
    assert(got.keySet === Set(10L, 11L, 12L), "no doc may vanish from predictions")
    assert(got(11L) === "a", "prior argmax (class a has 2 of 3 docs)")
    assert(got(12L) === "a")

    // NULL ids drop (the id is the prediction key) — and never
    // double-emit through the fallback branch
    val withNullId = fresh.unionByName(
      Seq((null.asInstanceOf[java.lang.Long], "x")).toDF("doc_id", "text"))
    val rows = NaiveBayes.predict(model, withNullId, "doc_id", "text").collect()
    assert(rows.length === 3 && rows.forall(!_.isNullAt(0)))
  }

  test("NaiveBayes equal-evidence docs fall back to priors; exact ties break label-ascending") {
    val s = spark
    import s.implicits._
    // Balanced classes, shared vocabulary, symmetric counts: every
    // score ties, so the prediction must be the smallest label.
    val docs = Seq(
      (1L, "b", "w w"), (2L, "a", "w w"))
      .toDF("doc_id", "lang", "text")
    val model = NaiveBayes.fit(docs, "text", "lang")
    val pred = NaiveBayes.predict(model, docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getAs[String]("pred"))
    assert(pred.toSeq === Seq("a", "a"))
  }

  test("rrfFuse: exact fixed-point sums, missing-list docs, tie-break by id") {
    val s = spark
    import s.implicits._
    // list A ranks 1,2,3 = docs 10,20,30; list B ranks 1,2 = docs 20,40
    val a = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val b = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    val got = Search.rrfFuse(Seq(a, b), "doc_id", kRrf = 60, k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    def c(r: Long) = Search.RrfScale / (60L + r)
    val want = Map(
      10L -> c(1), 20L -> (c(2) + c(1)), 30L -> c(3), 40L -> c(2))
    assert(got.toMap == want)
    // 20 leads (on both lists); 10 (rank 1 once) beats 40 (rank 2 once)
    val order = got.map(_._1).toSeq
    assert(order.head == 20L && order.indexOf(10L) < order.indexOf(40L))
    // exact tie (same single-list rank): ascending id order
    val t1 = Seq((7L, 1L)).toDF("doc_id", "rank")
    val t2 = Seq((3L, 1L)).toDF("doc_id", "rank")
    val tied = Search.rrfFuse(Seq(t1, t2), "doc_id", kRrf = 60, k = 10)
      .collect().map(_.getLong(0)).toSeq
    assert(tied == Seq(3L, 7L))
  }
}
