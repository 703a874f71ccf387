package graft.core

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded randomized equivalence for the windowed analytics operators
  * and the text scorers — each checked against an independent
  * in-memory reference implementation (same arithmetic, sequential
  * code), over random inputs with dense tie rates.
  */
class AnalyticsPropertySpec extends SparkSpec {

  test("sessionize == brute-force gap splitting, 30 seeded rounds") {
    val s = spark
    import s.implicits._
    (1 to 30).foreach { seed =>
      val rnd = new Random(100 + seed)
      val gap = 1L + rnd.nextInt(8)
      val ev = (1 to 50).map(i =>
        (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(40).toLong))

      val expect = ev.groupBy(_._2).flatMap { case (_, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._1))
        var sid = 0L
        var prev = Long.MinValue
        sorted.map { case (id, _, t) =>
          if (prev == Long.MinValue || t - prev > gap) sid += 1
          prev = t
          id -> sid
        }
      }.toMap

      val got = Sessions.sessionize(ev.toDF("eid", "uid", "t"),
        Seq("uid"), col("t"), Seq(col("eid")), gap)
        .collect().map(r => r.getAs[Long]("eid") -> r.getAs[Long]("session_id")).toMap
      assert(got === expect, s"seed $seed gap $gap")
    }
  }

  test("funnel stageTimes == brute-force sequential scan, 30 seeded rounds") {
    val s = spark
    import s.implicits._
    val stages = Seq("s0", "s1", "s2")
    (1 to 30).foreach { seed =>
      val rnd = new Random(200 + seed)
      val ev = (1 to 60).map(i =>
        (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(30).toLong, s"s${rnd.nextInt(4)}"))

      val expect = ev.groupBy(_._2).map { case (uid, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._1))
        val times = Array.fill[Option[Long]](stages.size)(None)
        sorted.foreach { case (_, _, t, tp) =>
          val i = stages.indexOf(tp)
          if (i == 0 && times(0).isEmpty) times(0) = Some(t)
          else if (i > 0 && times(i).isEmpty && times(i - 1).exists(t >= _))
            times(i) = Some(t)
        }
        uid -> ((times.toSeq, times.lastIndexWhere(_.isDefined) + 1))
      }

      val got = Funnels.stageTimes(ev.toDF("eid", "uid", "t", "etype"),
        Seq("uid"), col("t"), Seq(col("eid")), col("etype"), stages)
        .collect().map { r =>
          r.getAs[Long]("uid") -> ((
            stages.map(st => Option(r.getAs[Any](s"t_$st")).map(_.asInstanceOf[Long])),
            r.getAs[Int]("stage_reached")))
        }.toMap
      assert(got.keySet === expect.keySet, s"seed $seed")
      expect.foreach { case (uid, e) => assert(got(uid) === e, s"seed $seed uid $uid") }
    }
  }

  test("bm25TopK == in-memory reference arithmetic, 20 seeded rounds") {
    val s = spark
    import s.implicits._
    val vocab = Vector("a", "b", "c", "d", "e", "q1", "q2")
    (1 to 20).foreach { seed =>
      val rnd = new Random(300 + seed)
      val docs = (1 to 25).map(i =>
        (i.toLong, Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      val query = Seq("q1", "q2")

      // independent sequential scorer, same formula tree
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val n = docs.size.toLong
      val avgdl = toks.values.map(_.size.toLong).sum.toDouble / n
      val dfs = query.map(q => q -> toks.values.count(_.contains(q)).toLong).toMap
      val expect = docs.flatMap { case (id, _) =>
        val dl = toks(id).size.toLong
        val fx = query.flatMap { q =>
          val tf = toks(id).count(_ == q).toLong
          if (tf == 0 || dfs(q) == 0) None
          else Some(math.floor(
            math.log(1.0 + (n - dfs(q) + 0.5) / (dfs(q) + 0.5)) *
              (tf * (1.2 + 1.0)) /
              (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl))) * 1e9).toLong)
        }.sum
        if (fx == 0L && query.forall(q => !toks(id).contains(q))) None
        else Some(id -> fx)
      }.toMap

      val got = graft.text.Search.bm25TopK(
        docs.toDF("doc_id", "text"), "doc_id", "text", query, k = 100)
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_fx")).toMap
      assert(got === expect, s"seed $seed")
    }
  }

  test("NaiveBayes score_fx == in-memory reference arithmetic, 20 seeded rounds") {
    val s = spark
    import s.implicits._
    val vocab = Vector("u", "v", "w", "x", "y")
    (1 to 20).foreach { seed =>
      val rnd = new Random(400 + seed)
      val langs = Vector("p", "q")
      val docs = (1 to 20).map(i =>
        (i.toLong, langs(rnd.nextInt(2)),
          Seq.fill(1 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))

      val toks = docs.map { case (id, _, t) => id -> t.split(" ").toSeq }.toMap
      val byLang = docs.groupBy(_._2)
      val vSeen = docs.flatMap(d => toks(d._1)).distinct
      val vSize = vSeen.size.toLong
      def cnt(l: String, tok: String): Long =
        byLang.getOrElse(l, Seq.empty).map(d => toks(d._1).count(_ == tok).toLong).sum
      val ntok = langs.map(l => l -> byLang.getOrElse(l, Seq.empty)
        .map(d => toks(d._1).size.toLong).sum).toMap
      val ndocs = langs.map(l => l -> byLang.getOrElse(l, Seq.empty).size.toLong).toMap
      val present = langs.filter(ndocs(_) > 0)
      val expect = docs.map { case (id, _, _) =>
        val scores = present.map { l =>
          val prior = math.floor(math.log(ndocs(l).toDouble / docs.size) * 1e9).toLong
          val lik = toks(id).groupBy(identity).map { case (tok, occ) =>
            occ.size * math.floor(
              math.log((cnt(l, tok) + 1).toDouble / (ntok(l) + vSize)) * 1e9).toLong
          }.sum
          l -> (prior + lik)
        }
        id -> scores.minBy { case (l, sc) => (-sc, l) }
      }.toMap

      val model = graft.text.NaiveBayes.fit(docs.toDF("doc_id", "lang", "text"), "text", "lang")
      val got = graft.text.NaiveBayes.predict(
        model, docs.toDF("doc_id", "lang", "text"), "doc_id", "text")
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("pred"), r.getAs[Long]("score_fx")))).toMap
      expect.foreach { case (id, (l, sc)) =>
        assert(got(id) === ((l, sc)), s"seed $seed doc $id")
      }
    }
  }
}
