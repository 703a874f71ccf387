package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    if (args.lift(1).contains("simstats")) {
      import org.apache.spark.sql.functions._
      val docs = Tables.load(spark, dir, "documents")
      val sk = docs.select(col("doc_id"),
        graft.dedup.Dedup.simhash60(graft.text.TextFunctions.shingles(col("text"), 3)).as("sim"))
      sk.cache().count()
      println("distinct sims: " + sk.select(col("sim")).distinct().count())
      sk.groupBy(col("sim")).count().orderBy(col("count").desc).show(10)
      // piece bucket sizes at width 16
      val pieces = sk.select(explode(array((0 until 4).map(p =>
        concat_ws(":", lit(p), shiftrightunsigned(col("sim"), p * 15).bitwiseAND(0x7fffL))): _*)).as("piece"))
      pieces.groupBy(col("piece")).count().orderBy(col("count").desc).show(10)
      spark.stop(); return
    }
    if (args.lift(1).contains("timeq")) {
      // ad-hoc single-query timing with Bench's measurement semantics
      // (cache cleared before every pass, min of 3): Scratch timeq
      // <sfDir> timeq <queryName>
      val name = args(2)
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count() // warm
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: min ${times.min}%.3f s (passes ${times.map(t => f"$t%.3f").mkString(", ")})")
      spark.stop(); return
    }
    if (args.lift(1).contains("ingestprobe")) {
      // per-batch cost of the incremental-ingestion paths vs their
      // recompute baselines: a 1% batch against a 99% standing corpus
      // (the shape where write-once/probe-many must pay off)
      import org.apache.spark.sql.functions._
      val docs = Tables.load(spark, dir, "documents")
      // wall clock at sf0.1 is dominated by the fixed ~0.1-0.3 s/job
      // scheduling floor, which is NOISE at scale — so also meter the
      // quantities that DO scale: bytes scanned and shuffle volume
      val inBytes = new java.util.concurrent.atomic.AtomicLong
      val shufBytes = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            inBytes.addAndGet(m.inputMetrics.bytesRead)
            shufBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          }
        }
      })
      def time(label: String)(body: => Long): Unit = {
        spark.catalog.clearCache()
        Thread.sleep(300) // drain the async listener bus
        inBytes.set(0L); shufBytes.set(0L)
        val t0 = System.nanoTime()
        val rows = body
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"$label: $secs%.3f s ($rows rows, " +
          f"scan ${inBytes.get / 1e6}%.1f MB, shuffle ${shufBytes.get / 1e6}%.2f MB)")
      }
      // small admitted batch (the continuous-ingestion shape) against a
      // reference that multiplies k×: the disk index's per-batch cost
      // should stay near-flat while the re-sign baselines grow with the
      // reference
      val batch = docs.filter(col("doc_id") % 500 === 0)
        .select(col("doc_id"), col("text"))
      val stride = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      println(s"batch=${batch.count()}")
      Seq(1, 2, 4).foreach { k =>
        val ref = (0 until k).map(i => docs
            .filter(col("doc_id") % 500 =!= 0)
            .select((col("doc_id") + lit(i.toLong * stride)).as("doc_id"),
              col("text")))
          .reduce(_ unionByName _)
        val idx = java.nio.file.Files.createTempDirectory(s"ingestprobe$k").toString
        time(s"lsh-index-build x$k (once, amortized)") {
          graft.dedup.LshIndex.write(ref, "doc_id", "text", idx,
            n = 3, numHashes = 64, bands = 16, numPartitions = 256); 0L
        }
        (1 to 3).foreach { i =>
          time(s"lsh-index-probe x$k #$i (per batch)")(graft.core.CacheScope.withReleased {
            graft.dedup.LshIndex.probe(spark, idx, batch, "doc_id", "text", tau = 0.5).count()
          })
        }
        time(s"jaccardPairsAgainst x$k (re-sign baseline, per batch)") {
          graft.dedup.Dedup.jaccardPairsAgainst(ref, "doc_id", "text",
            batch, "doc_id", "text", n = 3, tau = 0.5).count()
        }
        time(s"minhashLshPairs-union x$k (recompute baseline, per batch)") {
          graft.dedup.Dedup.minhashLshPairs(ref.unionByName(batch), "doc_id", "text",
            n = 3, tau = 0.5).count()
        }
      }
      // incremental components: fold a 1%-pair batch into a standing
      // labeling vs recomputing components from all pairs. Both
      // contenders read the SAME cached pair set (isolating CC work);
      // the standing labeling is cached too — the service's steady
      // state — so the timer here must NOT clear.
      spark.catalog.clearCache()
      def timeWarm(label: String)(body: => Long): Unit = {
        Thread.sleep(300)
        inBytes.set(0L); shufBytes.set(0L)
        val t0 = System.nanoTime()
        val rows = body
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"$label: $secs%.3f s ($rows rows, " +
          f"scan ${inBytes.get / 1e6}%.1f MB, shuffle ${shufBytes.get / 1e6}%.2f MB)")
      }
      val pairs = graft.dedup.Dedup.jaccardPairs(docs, "doc_id", "text",
        n = 3, tau = 0.5).select(col("doc_a"), col("doc_b"))
      pairs.cache().count()
      val split = pmod(xxhash64(col("doc_a"), col("doc_b")), lit(100))
      val standing = graft.dedup.Dedup.connectedComponents(pairs.filter(split =!= 0))
      standing.cache().count()
      timeWarm("components-incremental (per batch, standing labeling cached)") {
        graft.dedup.Dedup.connectedComponentsIncremental(
          standing, pairs.filter(split === 0)).count()
      }
      timeWarm("components-full-recompute (per batch)") {
        graft.dedup.Dedup.connectedComponents(pairs).count()
      }
      spark.stop(); return
    }
    if (args.lift(1).contains("scaleprobe")) {
      // runtime slope of the heavy pairwise operators as the corpus
      // multiplies: k copies of documents with disjoint id ranges (the
      // copies ARE mutual near-dups, so pair volume grows too — a
      // pessimistic scaling probe)
      import org.apache.spark.sql.functions._
      val docs = Tables.load(spark, dir, "documents")
      // offset by max id + 1 (not row count): sparse ids must not
      // collide between copies
      val stride = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      Seq(1, 2, 4).foreach { k =>
        val big = (0 until k).map(i => docs.select(
            (col("doc_id") + lit(i.toLong * stride)).as("doc_id"),
            col("text"))).reduce(_ unionByName _)
        big.cache().count()
        def time(label: String)(body: => Long): Unit = {
          val t0 = System.nanoTime()
          val rows = body
          println(f"$label x$k: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows rows)")
        }
        time("jaccard")(graft.dedup.Dedup.jaccardPairs(big, "doc_id", "text",
          n = 3, tau = 0.5).count())
        time("minhash")(graft.dedup.Dedup.minhashLshPairs(big, "doc_id", "text",
          n = 3, tau = 0.5).count())
        time("dupspans")(graft.dedup.Dedup.docDuplicatedSpans(big, "doc_id", "text",
          n = 8).count())
        // every copied doc duplicates every LINE of its original —
        // the worst case for line dedup (all lines cut)
        time("dedupLines")(graft.dedup.Dedup.dedupLines(
          big.select(col("doc_id"),
            regexp_replace(col("text"), "(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ", "$1\n").as("text")),
          "doc_id", "text").count())
        // probe set fixed (the base corpus' %29 subset) while the
        // corpus multiplies — the decontamination scale direction
        time("scrubContam")(graft.dedup.Dedup.scrubContaminatedSpans(
          big, "doc_id", "text",
          docs.filter(col("doc_id") % 29 === 0), "text", n = 8).count())
        // the analytics-widening family: retrieval, classifier fit+
        // predict, collocations, source overlap — all expected FLAT-
        // slope (per-doc or vocab-keyed work, no pair blow-up)
        val bigLabeled = (0 until k).map(i => Tables.load(spark, dir, "documents")
            .select((col("doc_id") + lit(i.toLong * stride)).as("doc_id"),
              col("text"), col("lang"), col("source")))
          .reduce(_ unionByName _)
        bigLabeled.cache().count()
        time("bm25")(graft.text.Search.bm25TopK(bigLabeled, "doc_id", "text",
          Seq("spark", "join", "window"), k = 25).count())
        time("nbFitPredict") {
          val m = graft.text.NaiveBayes.fit(bigLabeled, "text", "lang")
          graft.text.NaiveBayes.predict(m, bigLabeled, "doc_id", "text").count()
        }
        time("pmi")(graft.text.Vocab.cooccurrencePmi(
          bigLabeled, "doc_id", "text").count())
        time("overlap")(graft.curation.Curation.corpusOverlap(
          bigLabeled, "text", "source").count())
        // the round-7 family: components ride the (pair-sized) edge
        // set; maximal spans are the gram join + one window; KN is
        // the vocab-keyed bigram rollup stack — all expected flat-to-
        // linear (the copies are mutual near-dups, so the PAIR-fed
        // probes are pessimistic like jaccard above)
        time("components")(graft.dedup.Dedup.connectedComponents(
          graft.dedup.Dedup.jaccardPairs(big, "doc_id", "text", n = 3, tau = 0.5)
            .select(col("doc_a"), col("doc_b"))).count())
        time("maxspans")(graft.dedup.Dedup.maximalSharedSpans(
          big, "doc_id", "text", n = 8, minSpanWords = 12).count())
        time("kneserney")(graft.curation.Curation.kneserNeyBigramScores(
          big, "doc_id", "text").count())
        // the round-9 family: coreness rides the (pair-sized) edge set
        // for a FIXED round count; linkage is blocking-equi-joins
        // (block sizes grow with k — pessimistic like jaccard);
        // evidence is pair-volume-bounded
        time("kcore") {
          val pairs = graft.dedup.Dedup.jaccardPairs(big, "doc_id", "text",
            n = 3, tau = 0.5)
          val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
            .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
          graft.core.Graph.coreness(
            big.select(col("doc_id").as("id")), edges, iters = 8).count()
        }
        time("evidence")(graft.dedup.Dedup.pairEvidence(big, "doc_id", "text",
          n = 3, tau = 0.5, topK = 3).count())
        bigLabeled.unpersist(blocking = true)
        big.unpersist(blocking = true)
      }
      spark.stop(); return
    }
    if (args.lift(1).contains("temporalprobe")) {
      // runtime slope of the temporal/window family as per-key
      // timelines DEEPEN (same users, k months of history) — the
      // stress axis for window chains: partitions grow, key count
      // doesn't, so this measures the per-key sequential scan cost.
      import org.apache.spark.sql.functions._
      val ev0 = Tables.load(spark, dir, "events")
      Seq(1, 2, 4).foreach { k =>
        val big = (0 until k).map(i => ev0.select(
            (col("event_id") + lit(i.toLong * 1000000L)).as("event_id"),
            col("user_id"),
            (unix_micros(col("ts")) + lit(i.toLong * 3000000000000L)).as("t_us"),
            col("event_type"), col("value")))
          .reduce(_ unionByName _)
        big.cache().count()
        def time(label: String)(body: => Long): Unit = {
          val t0 = System.nanoTime()
          val rows = body
          println(f"$label x$k: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows rows)")
        }
        time("sessionize")(graft.core.Sessions.sessionStats(big,
          Seq("user_id"), col("t_us"), Seq(col("event_id")),
          gap = 1800L * 1000000L, value = col("value")).count())
        time("asof") {
          val p = big.filter(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"), col("t_us"))
          val c = big.filter(col("event_type") === "click")
            .select(col("user_id"), col("t_us"), col("value").as("cv"))
          graft.core.Joins.asofJoin(p, c, Seq("user_id"), "t_us",
            tiebreak = Seq(col("cv"))).count()
        }
        time("funnel")(graft.core.Funnels.stageTimes(big, Seq("user_id"),
          col("t_us"), Seq(col("event_id")), col("event_type"),
          Seq("signup", "click", "purchase")).count())
        time("interval") {
          val wnd = big.filter(col("event_type") === "signup")
            .select(col("user_id"), col("event_id").as("sid"),
              col("t_us").as("lo"), (col("t_us") + lit(3600000000L)).as("hi"))
          graft.core.Ranges.intervalJoin(
            big.select(col("user_id"), col("t_us")), "t_us",
            wnd, "lo", "hi", bucket = 900000000L, keys = Seq("user_id")).count()
        }
        big.unpersist(blocking = true)
      }
      spark.stop(); return
    }
    if (args.lift(1).contains("candprobe")) {
      // candidate-volume probe for jaccardPairs' pruning stack: size
      // filter alone vs + positional (PPJoin) filter
      import org.apache.spark.sql.functions._
      val docs = Tables.load(spark, dir, "documents")
      val eps = 1e-9; val tau = 0.5
      val arrs = docs.select(col("doc_id").as("doc"),
          graft.functions.SketchFunctions.sorted_shingle_hashes(col("text"), 3).as("shs"))
        .select(col("doc"), size(col("shs")).as("nsh"), col("shs"))
      val prefixLen = (col("nsh") - ceil(col("nsh") * tau - eps) + 1).cast("int")
      val pfx = arrs.select(col("doc"), col("nsh"),
          posexplode(slice(col("shs"), lit(1), prefixLen)).as(Seq("p0", "sh")))
        .select(col("doc"), col("nsh"), (col("p0") + 1).as("p"), col("sh"))
      val base = pfx.as("l").join(pfx.as("r").hint("shuffle_hash"),
        col("l.sh") === col("r.sh") && col("l.doc") < col("r.doc") &&
          col("r.nsh").cast("double") >= col("l.nsh") * tau - eps &&
          col("l.nsh").cast("double") >= col("r.nsh") * tau - eps)
      println("cand size-filter only:  " +
        base.select(col("l.doc"), col("r.doc")).distinct().count())
      val alpha = (col("l.nsh") + col("r.nsh")) * lit(tau / (1.0 + tau)) - eps
      println("cand + positional:      " +
        base.filter((lit(1) + least(col("l.nsh") - col("l.p"), col("r.nsh") - col("r.p")))
          .cast("double") >= alpha)
          .select(col("l.doc"), col("r.doc")).distinct().count())
      spark.stop(); return
    }
    if (args.lift(1).contains("skewprobe")) {
      // planted-skew probe for the round-6 guards: a boilerplate
      // template (identical text → one hot LSH bucket per band) and a
      // collapsed embedding region (one dense centroid cell) grafted
      // onto the real sf tables; measure guarded vs unguarded.
      import org.apache.spark.sql.functions._
      val docs = Tables.load(spark, dir, "documents")
      val stride = docs.agg(max(col("doc_id"))).head().getLong(0) + 1L
      val template = spark.range(stride, stride + 4000L)
        .select(col("id").as("doc_id"),
          lit("cookie consent required please accept tracking to continue reading").as("text"))
      val skewed = docs.select(col("doc_id"), col("text")).unionByName(template)
      skewed.cache().count()
      def time(label: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = body
        println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s ($rows rows)")
      }
      (1 to 2).foreach { pass =>
        time(s"minhash unguarded p$pass")(graft.dedup.Dedup.minhashLshPairs(
          skewed, "doc_id", "text", n = 3, tau = 0.5).count())
        time(s"minhash df-cap p$pass")(graft.dedup.Dedup.minhashLshPairs(
          skewed, "doc_id", "text", n = 3, tau = 0.5,
          maxBucketDocFreq = Some(256)).count())
      }
      skewed.unpersist(blocking = true)
      val emb = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id").cast("long").as("c_id"),
          col("embedding").cast("array<double>").as("c_emb"))
      val eStride = emb.agg(max(col("c_id"))).head().getLong(0) + 1L
      val dense = emb.limit(1).crossJoin(spark.range(eStride, eStride + 4000L))
        .select(col("id").as("c_id2"), col("c_emb"))
        .select(col("c_id2").as("c_id"), col("c_emb"))
      val eSkewed = emb.unionByName(dense)
      eSkewed.cache().count()
      (1 to 2).foreach { pass =>
        time(s"semdedup unsalted p$pass")(graft.similarity.Similarity.semDedup(
          eSkewed, tau = 0.45, nlist = 16,
          saltCellRows = Int.MaxValue).count())
        time(s"semdedup salted p$pass")(graft.similarity.Similarity.semDedup(
          eSkewed, tau = 0.45, nlist = 16,
          saltCellRows = 512, maxSalts = 32).count())
      }
      eSkewed.unpersist(blocking = true)
      spark.stop(); return
    }
    if (args.lift(1).contains("agingprobe")) {
      // Does a session that has executed the whole query suite time a
      // query worse than a fresh one? Separates JVM aging (codegen
      // cache, JIT) from SparkSession aging (sessionState, listeners).
      val probes = Seq("q45_dedup_clusters", "q107_dedup_components", "q50_corpus_curation")
      def timeIn(s: org.apache.spark.sql.SparkSession, label: String): Unit =
        probes.foreach { q =>
          (1 to 2).foreach { i =>
            s.catalog.clearCache()
            val t0 = System.nanoTime()
            val n = SparkEntry.queries(q)(s, dir).count()
            println(f"[aging] $label $q run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
          }
        }
      (1 to 12).foreach { i =>
        probes.foreach { q =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(q)(spark, dir)
          val t1 = System.nanoTime()
          val n = df.count()
          val t2 = System.nanoTime()
          println(f"[aging] iter$i%02d $q build ${(t1 - t0) / 1e9}%.3f exec ${(t2 - t1) / 1e9}%.3f ($n rows)")
        }
      }
      timeIn(spark, "tail")
      spark.stop(); return
    }
    if (sys.env.contains("SCRATCH_DEBUGLOG")) spark.sparkContext.setLogLevel("DEBUG")
    val names = args.drop(1)
    val qs = if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names.toSeq
    qs.foreach { q =>
      if (sys.env.contains("SCRATCH_EXPLAIN"))
        SparkEntry.queries(q)(spark, dir).explain("formatted")
      // Bench semantics: cache cleared, the query REBUILT inside the
      // clock each run. Operators that resolve chains (collapse,
      // components) run distributed probes during construction, so a
      // build-outside-the-clock loop under-measures them — r6's
      // "warm 1.7 s" q50 numbers were exactly that artifact.
      (1 to 3).foreach { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, dir).count()
        println(f"$q run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
