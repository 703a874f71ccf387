package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Deduplication operators for training-data pipelines, at three
  * exactness levels:
  *
  *  - exact (content-hash groupBy),
  *  - set-similarity (n-gram shingle Jaccard, exact but computed with a
  *    scalable inverted-index join — NO cross join),
  *  - sketch-based (MinHash+LSH band-bucketing, SimHash hamming
  *    banding) whose candidates are verified against exact Jaccard.
  *
  * Scale notes (100 TB): every pairwise step here joins on a bounded
  * key (shingle, LSH bucket, simhash piece) instead of crossing the
  * corpus with itself; candidate verification touches only candidate
  * pairs. For web-scale corpora add a document-frequency cap
  * (`maxShingleDocFreq`) so stop-shingles don't quadratically blow up
  * the inverted index — the same reason search engines drop stopwords.
  */
object Dedup {

  /** Exact dedup: one surviving row per distinct content hash (the
    * smallest id wins — deterministic).
    */
  def exactDedupSurvivors(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = md5(col(textCol)).as("fp")
    df.select(fp, col(idCol))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))
  }

  /** (doc, set-size, shingle-hash) inverted-index rows, distinct.
    * Shingles are 64-bit-hashed before the shuffle — postings shuffle
    * longs instead of n-gram strings (collision probability across a
    * single doc pair's shingles is ~2^-64·|sh|², irrelevant even at
    * 100 TB). The set size rides along so the Jaccard denominator
    * needs no separate sizes table (and no join to fetch it).
    */
  private def shingleIndex(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("doc"), TextFunctions.shingles(col(textCol), n).as("arr"))
      .select(col("doc"), size(col("arr")).as("nsh"), explode(col("arr")).as("sh0"))
      .select(col("doc"), col("nsh"), xxhash64(col("sh0")).as("sh"))

  /** Exact n-gram Jaccard similar pairs (j >= tau, a < b), computed
    * with PREFIX FILTERING (the AllPairs/PPJoin family, Xiao et al.,
    * WWW'08): each doc's shingle set becomes a sorted hash array; only
    * the first `|s| - ⌈tau·|s|⌉ + 1` hashes are indexed (a pair with
    * J ≥ tau MUST share a prefix element — missing the whole prefix
    * bounds the overlap below tau·|s|), candidates also pass the size
    * filter `tau·|A| ≤ |B| ≤ |A|/tau`, and survivors are verified with
    * an exact compiled merge-intersect. Every pruning bound is relaxed
    * by 1e-9 so float rounding can only ADMIT extra candidates (the
    * exact verify discards them) — never drop a true pair.
    *
    * vs the count-based postings join ([[jaccardPairsByCount]]): at
    * tau = 0.5 only ~half of each posting list is indexed, so the
    * candidate-pair set shrinks ~4× (measured sf0.1: 1.13 M → 430 k)
    * and the per-pair work is one merge walk instead of a grouped
    * count riding a 1.3 M-row shuffle. The positional filter then
    * halves the survivors again (430 k → 211 k measured — Scratch
    * `candprobe`): invisible at sf0.1 where the verify is cheap, a 2×
    * cut of the candidate shuffle + merge-verify stage at corpus
    * scale, where that stage dominates.
    *
    * @param maxShingleDocFreq drop shingles occurring in more than this
    *   many docs from the CANDIDATE join (exactness caveat documented:
    *   with a cap, pairs overlapping ONLY on stop-shingles are missed;
    *   pass None for fully exact).
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      tau: Double,
      maxShingleDocFreq: Option[Int] = None): DataFrame = {
    val eps = 1e-9
    // persisted: referenced by BOTH sides of the prefix self-join, the
    // hot-shingle df pass, and (plan-identical, CacheManager-deduped)
    // the exact verify's two array joins — one tokenize+sort pass
    // total instead of four
    val arrs = graft.core.CacheScope.track(
      df.select(col(idCol).as("doc"),
        graft.functions.SketchFunctions.sorted_shingle_hashes(col(textCol), n).as("shs"))
      .select(col("doc"), size(col("shs")).as("nsh"), col("shs"))
      .persist())
    val prefixLen = (col("nsh") - ceil(col("nsh") * tau - eps) + 1).cast("int")
    // posexplode: the 1-based prefix position feeds PPJoin's positional
    // filter below
    val pfx0 = arrs.select(col("doc"), col("nsh"),
        posexplode(slice(col("shs"), lit(1), prefixLen)).as(Seq("p0", "sh")))
      .select(col("doc"), col("nsh"), (col("p0") + 1).as("p"), col("sh"))
    val pfx = maxShingleDocFreq match {
      case Some(cap) =>
        // document frequency over the FULL postings (same semantics as
        // the count-based variant), not just the prefixes
        val hot = arrs.select(explode(col("shs")).as("sh"))
          .groupBy(col("sh")).agg(count(lit(1)).as("df_"))
          .filter(col("df_") > cap).select(col("sh"))
        pfx0.join(hot, Seq("sh"), "left_anti")
      case None => pfx0
    }
    // POSITIONAL filter (the PP of PPJoin): a match at 1-based prefix
    // positions (pa, pb) bounds the overlap by 1 + min(na-pa, nb-pb)
    // (everything before the match in either sorted array is ruled
    // out); J >= tau needs overlap >= tau/(1+tau)·(na+nb). Lossless:
    // the pair's FIRST shared prefix element carries the true bound
    // and one passing occurrence keeps the pair (candidates are
    // distinct-ed). Relaxed by eps — rounding only ever ADMITS.
    val alpha = (col("l.nsh") + col("r.nsh")) * lit(tau / (1.0 + tau)) - eps
    // SHUFFLE_HASH: same self-join rationale as jaccardPairsByCount.
    val candidates = pfx.as("l")
      .join(pfx.as("r").hint("shuffle_hash"),
        col("l.sh") === col("r.sh") && col("l.doc") < col("r.doc") &&
          col("r.nsh").cast("double") >= col("l.nsh") * tau - eps &&
          col("l.nsh").cast("double") >= col("r.nsh") * tau - eps &&
          (lit(1) + least(col("l.nsh") - col("l.p"), col("r.nsh") - col("r.p")))
            .cast("double") >= alpha)
      .select(col("l.doc").as("doc_a"), col("r.doc").as("doc_b"))
    verifyByExactJaccard(df, idCol, textCol, n, tau,
      // pair-key-pinned distinct: keeps the verify stage at real
      // parallelism (AQE would coalesce the byte-small pair list to
      // one task and serialize the merge-walk verify — guide §2.5)
      graft.core.Skew.parallelPairDistinct(candidates, Seq("doc_a", "doc_b")))
  }

  /** Match-evidence report: for each near-dup pair, the `topK` RAREST
    * shared shingles (global document frequency ascending — rare
    * shared n-grams are the informative evidence; 'the the the' is
    * not). The audit view a human reads to trust a dedup decision
    * before it deletes a terabyte.
    *
    * Scale shape: pair-volume-bounded — the pair list fans out to its
    * own docs' shingles (two keyed joins), df rides one vocab-keyed
    * aggregate + hash join (NOT broadcast: shingle vocab is corpus-
    * sized), and the top-k window partitions per pair. No cartesian,
    * nothing driver-side.
    */
  def pairEvidence(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      tau: Double,
      topK: Int): DataFrame = {
    val pairs = jaccardPairs(df, idCol, textCol, n, tau)
      .select(col("doc_a"), col("doc_b"))
    // raw shingle STRINGS (the report is human-read); shingles() is
    // already distinct per doc
    val post = df.select(col(idCol).as("doc"),
      explode(TextFunctions.shingles(col(textCol), n)).as("s"))
    val dfs = post.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val shared = pairs
      .join(post.select(col("doc").as("doc_a"), col("s")), "doc_a")
      .join(post.select(col("doc").as("doc_b"), col("s")), Seq("doc_b", "s"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_a"), col("doc_b"))
      .orderBy(col("df").asc, col("s").asc)
    shared.join(dfs, "s")
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("doc_a"), col("doc_b"), col("rnk"),
        col("s").as("shingle"), col("df"))
  }

  /** Sketch-quality evaluation: confusion summary of a PREDICTED pair
    * set (e.g. a banded sketch's output) against a TRUTH pair set
    * (the exact operator) — the one-row scorecard that justifies a
    * sketch config before it gates a 100 TB dedup run. Both inputs
    * are (doc_a, doc_b); one full-outer join on the pair key + one
    * aggregate; precision/recall land on the exact 1e-6 `div` grid.
    */
  def pairsEval(predicted: DataFrame, truth: DataFrame): DataFrame = {
    val p = predicted.select(col("doc_a"), col("doc_b"), lit(1L).as("__p"))
    val tr = truth.select(col("doc_a"), col("doc_b"), lit(1L).as("__t"))
    p.join(tr, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(coalesce(col("__t"), lit(0L))).as("n_truth"),
        sum(coalesce(col("__p"), lit(0L))).as("n_pred"),
        sum(when(col("__p").isNotNull && col("__t").isNotNull, 1L)
          .otherwise(0L)).as("tp"),
        sum(when(col("__p").isNotNull && col("__t").isNull, 1L)
          .otherwise(0L)).as("fp"),
        sum(when(col("__p").isNull && col("__t").isNotNull, 1L)
          .otherwise(0L)).as("fn"))
      .select(col("n_truth"), col("n_pred"), col("tp"), col("fp"), col("fn"),
        (when(col("n_pred") > 0, expr("(tp * 1000000L) div n_pred"))
          .otherwise(lit(0L)).cast("double") / lit(1e6)).as("precision"),
        (when(col("n_truth") > 0, expr("(tp * 1000000L) div n_truth"))
          .otherwise(lit(0L)).cast("double") / lit(1e6)).as("recall"))
  }

  /** Cross-corpus exact Jaccard pairs — INCREMENTAL ingestion dedup:
    * every (ref, incoming) pair with J >= tau between an existing
    * reference corpus and a new batch, so an arriving batch can be
    * cleaned against 100 TB of already-accepted data without ever
    * re-pairing the reference corpus with itself. Same prefix-filter +
    * size-filter + compiled merge-intersect machinery as
    * [[jaccardPairs]] (bounds relaxed by 1e-9: rounding only ever
    * ADMITS candidates); the join is ref-prefix ⋈ batch-prefix on the
    * shingle hash — both sides indexed to their tau-prefix only, and
    * the (typically much smaller) batch side is the shuffle_hash build
    * side.
    */
  def jaccardPairsAgainst(
      ref: DataFrame, refIdCol: String, refTextCol: String,
      batch: DataFrame, batchIdCol: String, batchTextCol: String,
      n: Int, tau: Double,
      maxShingleDocFreq: Option[Int] = None): DataFrame = {
    val eps = 1e-9
    def prefixes(df: DataFrame, id: String, text: String, as: String) = {
      val arrs = df.select(col(id).as(as),
          graft.functions.SketchFunctions.sorted_shingle_hashes(col(text), n).as("shs"))
        .select(col(as), size(col("shs")).as(s"nsh_$as"), col("shs"))
      val prefixLen =
        (col(s"nsh_$as") - ceil(col(s"nsh_$as") * tau - eps) + 1).cast("int")
      arrs.select(col(as), col(s"nsh_$as"),
        posexplode(slice(col("shs"), lit(1), prefixLen)).as(Seq(s"p0_$as", "sh")))
        .select(col(as), col(s"nsh_$as"), (col(s"p0_$as") + 1).as(s"p_$as"), col("sh"))
    }
    // stop-shingle cap, df counted over BOTH corpora's full postings —
    // a hot shingle blows up |ref posting| × |batch posting|; the 100 TB
    // reference side is where that product turns into a straggler.
    // Same exactness caveat as jaccardPairs' cap.
    def fullPostings(df: DataFrame, id: String, text: String) =
      df.select(graft.functions.SketchFunctions
        .sorted_shingle_hashes(col(text), n).as("shs"))
        .select(explode(col("shs")).as("sh"))
    val dropHot: DataFrame => DataFrame = maxShingleDocFreq match {
      case Some(cap) =>
        val hot = fullPostings(ref, refIdCol, refTextCol)
          .unionByName(fullPostings(batch, batchIdCol, batchTextCol))
          .groupBy(col("sh")).agg(count(lit(1)).as("df_"))
          .filter(col("df_") > cap).select(col("sh"))
        pfx => pfx.join(hot, Seq("sh"), "left_anti")
      case None => identity
    }
    val refPfx = dropHot(prefixes(ref, refIdCol, refTextCol, "ref_id"))
    val batchPfx = dropHot(prefixes(batch, batchIdCol, batchTextCol, "new_id"))
    // positional (PPJoin) filter, same lossless bound as jaccardPairs:
    // overlap <= 1 + min(remaining-after-match on each side)
    val alpha = (col("nsh_ref_id") + col("nsh_new_id")) * lit(tau / (1.0 + tau)) - eps
    val candidates0 = refPfx
      .join(batchPfx.hint("shuffle_hash"),
        refPfx("sh") === batchPfx("sh") &&
          col("nsh_new_id").cast("double") >= col("nsh_ref_id") * tau - eps &&
          col("nsh_ref_id").cast("double") >= col("nsh_new_id") * tau - eps &&
          (lit(1) + least(col("nsh_ref_id") - col("p_ref_id"),
            col("nsh_new_id") - col("p_new_id"))).cast("double") >= alpha)
      .select(col("ref_id"), col("new_id"))
    val candidates = graft.core.Skew.parallelPairDistinct(
      candidates0, Seq("ref_id", "new_id")) // verify parallelism (§2.5)
    val refArrs = ref.select(col(refIdCol).as("ref_id"),
        graft.functions.SketchFunctions.sorted_shingle_hashes(col(refTextCol), n).as("sa"))
      .withColumn("na", size(col("sa")))
    val batchArrs = batch.select(col(batchIdCol).as("new_id"),
        graft.functions.SketchFunctions.sorted_shingle_hashes(col(batchTextCol), n).as("sb"))
      .withColumn("nb", size(col("sb")))
    candidates
      .join(refArrs, "ref_id")
      .join(batchArrs, "new_id")
      .withColumn("c",
        graft.functions.SketchFunctions.intersect_count_sorted(col("sa"), col("sb")))
      .withColumn("jaccard",
        round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6))
      .filter(col("jaccard") >= tau)
      .select(col("ref_id"), col("new_id"), col("jaccard"))
  }

  /** Drop every incoming-batch doc that near-duplicates the reference
    * corpus (the accept/reject gate of incremental ingestion): batch
    * rows pass through unchanged unless [[jaccardPairsAgainst]] pairs
    * them with any reference doc.
    */
  def dedupAgainst(
      ref: DataFrame, refIdCol: String, refTextCol: String,
      batch: DataFrame, batchIdCol: String, batchTextCol: String,
      n: Int, tau: Double,
      maxShingleDocFreq: Option[Int] = None): DataFrame = {
    val dup = jaccardPairsAgainst(ref, refIdCol, refTextCol,
        batch, batchIdCol, batchTextCol, n, tau, maxShingleDocFreq)
      .select(col("new_id").as(batchIdCol)).distinct()
    batch.join(dup, Seq(batchIdCol), "left_anti")
  }

  /** Approximate exact-duplicate ingestion gate: drop every incoming
    * batch doc whose text fingerprint is (probably) already in the
    * reference corpus, tested against a Bloom filter built over the
    * reference fingerprints — the zero-shuffle prefilter in front of
    * [[dedupAgainst]]'s near-dup machinery when only EXACT-duplicate
    * hygiene is needed.
    *
    * Guarantees: no false negatives — a batch doc whose text verbatim-
    * matches any reference doc never survives; false positives drop up
    * to `fpp` of genuinely-new docs (tunable; 1% default). Exact-match
    * granularity only (md5 of the text) — near-duplicates pass.
    *
    * Scale shape: the filter is ~1.2 bytes/item at 1% fpp (a 10^9-doc
    * reference corpus ≈ 1.2 GB, broadcastable; shard the reference and
    * gate per shard above that), built with one aggregation pass over
    * the reference and applied MAP-SIDE to the batch — the batch never
    * shuffles and the reference is never re-scanned per batch when the
    * caller reuses the returned filter via the `prebuilt` overload.
    */
  def dedupAgainstBloom(
      ref: DataFrame, refTextCol: String,
      batch: DataFrame, batchTextCol: String,
      expectedItems: Long,
      fpp: Double = 0.01): DataFrame =
    dedupAgainstBloom(buildRefBloom(ref, refTextCol, expectedItems, fpp),
      batch, batchTextCol)

  /** Build the reference-fingerprint Bloom filter once (e.g. persist it
    * alongside the corpus and reuse across arriving batches).
    */
  def buildRefBloom(
      ref: DataFrame, refTextCol: String,
      expectedItems: Long, fpp: Double): org.apache.spark.util.sketch.BloomFilter =
    ref.select(md5(col(refTextCol)).as("fp"))
      .stat.bloomFilter(col("fp"), expectedItems, fpp)

  /** Apply a prebuilt reference filter to an incoming batch. */
  def dedupAgainstBloom(
      filter: org.apache.spark.util.sketch.BloomFilter,
      batch: DataFrame, batchTextCol: String): DataFrame = {
    val bc = batch.sparkSession.sparkContext.broadcast(filter)
    // a UDF is the right tool here: Bloom membership against a
    // broadcast sketch has no Column-function form, and the call is
    // one hash probe per row (the md5 argument stays codegen'd)
    val mightContain = udf((fp: String) => fp != null && bc.value.mightContainString(fp))
    batch.filter(!mightContain(md5(col(batchTextCol))))
  }

  /** Count-based exact Jaccard pairs — the inverted-index formulation
    * [[jaccardPairs]] replaced as the default: pairs sharing at least
    * one shingle get a shared-shingle count; jaccard = c/(|A|+|B|-c).
    * Kept public as the cross-check twin (DedupSpec asserts result
    * equality) and for corpora whose size skew defeats prefix pruning.
    */
  def jaccardPairsByCount(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      tau: Double,
      maxShingleDocFreq: Option[Int] = None): DataFrame = {
    val idx0 = shingleIndex(df, idCol, textCol, n)
    val idx = graft.core.Skew.dropHotKeys(idx0, "sh", maxShingleDocFreq)
    // na/nb are functionally dependent on doc_a/doc_b, so carrying them
    // in the grouping key is free — and the sizes arrive with the
    // postings, so the Jaccard is computed straight out of the
    // aggregate: no sizes table, no extra joins, one shuffle less.
    // SHUFFLE_HASH: both sides are the same full postings index — at
    // any real scale neither fits a broadcast, and the hash-join build
    // must happen per-partition, not on the driver. (Without the hint
    // AQE broadcasts the 10 MB index at bench scale: a serial driver
    // build that's slower than the 32-way shuffle it avoids.)
    idx.as("l").join(idx.as("r").hint("shuffle_hash"), col("l.sh") === col("r.sh"))
      .filter(col("l.doc") < col("r.doc"))
      .groupBy(col("l.doc").as("doc_a"), col("l.nsh").as("na"),
        col("r.doc").as("doc_b"), col("r.nsh").as("nb"))
      .agg(count(lit(1)).as("c"))
      .withColumn("jaccard", round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** TF-IDF-weighted cosine pairs over the term postings index — the
    * all-pairs similarity search (APSS) operator of Bayardo et al.
    * (WWW 2007): where Jaccard treats every shared token alike, the
    * IDF weighting makes rare shared vocabulary count and boilerplate
    * terms count for almost nothing — the lexical near-dup measure for
    * corpora whose templates share most of their FREQUENT words.
    *
    * Engine-exact fixed point: idf on the 1e-6 floor-ln grid
    * (floor(ln(N/df)·1e6), the q149 discipline), term weight =
    * tf · idf_fx as int64, norms and pair dots as exact DECIMAL sums
    * of int64 products, ONE double expression (dot / (√na·√nb))
    * floored to 1e-6 at the end — the DuckDB oracle replays every
    * weight bit-for-bit.
    *
    * Scale shape: same as [[jaccardPairsByCount]] — a postings
    * equi-join (shuffle_hash, never a cross join) generates candidate
    * pairs, one pair-keyed aggregate computes the dot; zero-weight
    * postings (df == N) are pruned before the join, and
    * `maxTermDocFreq` caps the quadratic fan-out of hot terms (which
    * IDF has already made near-worthless for the score).
    */
  def tfidfCosinePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      tau: Double,
      maxTermDocFreq: Option[Int] = None): DataFrame = {
    val tf = df.select(col(idCol).as("doc"),
        explode(graft.text.TextFunctions.tokens(col(textCol))).as("t"))
      .groupBy(col("doc"), col("t")).agg(count(lit(1)).as("tf"))
    val n = df.select(col(idCol)).distinct().count()
    val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
    val dfKept = maxTermDocFreq
      .map(c => dfreq.filter(col("df") <= c)).getOrElse(dfreq)
    val weighted0 = tf.join(dfKept, Seq("t"))
      .withColumn("idf_fx",
        floor(log(lit(n.toDouble) / col("df"))* lit(1e6)).cast("long"))
      .filter(col("idf_fx") > 0L)
      .select(col("doc"), col("t"), (col("tf") * col("idf_fx")).as("w"))
    // norms ride the postings like nsh does in jaccardPairsByCount.
    // Cast to DECIMAL BEFORE the multiply: at ~1e6 docs idf_fx reaches
    // ~1.4e7 and a rare term repeated ~220x gives w > 3e9, so an int64
    // w*w would silently wrap (the oracle multiplies in HUGEINT) —
    // the product must be exact, not just the sum.
    val wDec = col("w").cast("decimal(38,0)")
    val norms = weighted0.groupBy(col("doc"))
      .agg(sum(wDec * wDec).as("n2"))
    // persisted: both sides of the term self-join derive from it —
    // without the cache the tokenize + tf/df aggregates + idf join run
    // once per side
    val idx = graft.core.CacheScope.track(
      weighted0.join(norms, Seq("doc")).persist())
    idx.as("l").join(idx.as("r").hint("shuffle_hash"), col("l.t") === col("r.t"))
      .filter(col("l.doc") < col("r.doc"))
      .groupBy(col("l.doc").as("doc_a"), col("l.n2").as("na"),
        col("r.doc").as("doc_b"), col("r.n2").as("nb"))
      .agg(sum(col("l.w").cast("decimal(38,0)") * col("r.w").cast("decimal(38,0)"))
        .as("dot"))
      .withColumn("cos",
        floor(col("dot").cast("double")
          / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))
          * lit(1e6)) / lit(1e6))
      .filter(col("cos") >= tau)
      .select(col("doc_a"), col("doc_b"), col("cos"))
  }

  /** MinHash signature of a shingle set: `numHashes` independent
    * min-hashes, hash j of shingle s = xxh64(s, seed=j). Compiled
    * kernel (SketchOps) — stays in whole-stage codegen.
    */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    graft.functions.SketchFunctions.minhash_sig(shingleSet, numHashes)

  /** LSH band-bucket keys straight from the shingle set (signature
    * computed once inside the kernel — an expression-level slice of a
    * signature column would be re-inlined per band by projection
    * collapse and recompute all minhashes `bands` times).
    */
  def lshBandKeys(shingleSet: Column, numHashes: Int, bands: Int): Column =
    graft.functions.SketchFunctions.minhash_band_keys(shingleSet, numHashes, bands)

  /** MinHash+LSH near-dup pairs: shingle → minhash → band-bucket join →
    * exact-Jaccard verification of candidates. With b bands of r rows a
    * pair of similarity j collides with prob 1-(1-j^r)^b; defaults
    * (b=16, r=4) put the S-curve threshold near j≈0.55.
    *
    * Returns exactly the (doc_a, doc_b, jaccard) pairs with j >= tau
    * among LSH candidates — for corpora whose similarity distribution
    * is bimodal (near-dups vs noise) this equals the exact result with
    * overwhelming probability.
    *
    * @param maxBucketDocFreq drop band buckets holding more than this
    *   many docs from the candidate join — the LSH analog of
    *   [[jaccardPairs]]'s `maxShingleDocFreq`. A web-scale corpus has
    *   degenerate hot buckets (empty/boilerplate documents share one
    *   signature) whose pair fan-out is |bucket|² — one such bucket is
    *   a straggler task AND a candidate-volume explosion. Exactness
    *   caveat: pairs colliding ONLY in dropped buckets are missed;
    *   their members are mutual near-dups of one template, so exact
    *   dedup ([[dedupExact]]) or a per-bucket representative pass
    *   covers them. Pass None (default) for the unguarded join.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      tau: Double = 0.5,
      numHashes: Int = 64,
      bands: Int = 16,
      maxBucketDocFreq: Option[Int] = None): DataFrame = {
    val sh = df.select(col(idCol).as("doc"), TextFunctions.shingles(col(textCol), n).as("sh"))
    // persisted: both sides of the bucket self-join derive from it —
    // without the cache the corpus shingles + minhashes twice
    val buckets0 = graft.core.CacheScope.track(sh.select(
      col("doc"),
      explode(lshBandKeys(col("sh"), numHashes, bands)).as("bucket"))
      .persist())
    val buckets = graft.core.Skew.dropHotKeys(buckets0, "bucket", maxBucketDocFreq)
    val candidates = buckets.as("l")
      .join(buckets.as("r").hint("shuffle_hash"), col("l.bucket") === col("r.bucket"))
      .filter(col("l.doc") < col("r.doc"))
      .select(col("l.doc").as("doc_a"), col("r.doc").as("doc_b"))
      // plain distinct, NOT the pinned parallelPairDistinct: banded
      // candidates are bucket-co-residency-bounded (a small fraction of
      // the prefix join's volume), and pinning 32 partitions on them
      // was A/B-measured ~0.15-0.3 s SLOWER here (scheduling overhead
      // with no CPU to spread) where the jaccard prefix path wins 1.3×+
      .distinct()
    verifyByExactJaccard(df, idCol, textCol, n, tau, candidates)
  }

  /** Exact-Jaccard verification of a (doc_a, doc_b) candidate edge
    * list: re-derives each side's sorted shingle-hash array and scores
    * with the compiled merge-intersect (same representation as
    * [[jaccardPairs]] — hash counts equal string-set counts up to the
    * documented 2^-64 collision caveat, and a long merge walk beats
    * `array_intersect`/`array_union` over n-gram strings).
    */
  private def verifyByExactJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      tau: Double,
      candidates: DataFrame): DataFrame = {
    // persisted: the verify joins the array table TWICE (a-side and
    // b-side), and the candidate generators upstream already derive
    // the same (doc, nsh, shs) plan — without the cache the corpus
    // re-tokenizes + re-sorts once per reference (4× per jaccardPairs
    // call). Spark's CacheManager dedups plan-identical caches, so a
    // caller that persisted the same construction shares this entry.
    val arrs = graft.core.CacheScope.track(
      df.select(col(idCol).as("doc"),
        graft.functions.SketchFunctions.sorted_shingle_hashes(col(textCol), n).as("shs"))
      .select(col("doc"), size(col("shs")).as("nsh"), col("shs"))
      .persist())
    candidates
      .join(arrs.select(col("doc").as("doc_a"), col("nsh").as("na"), col("shs").as("sa")), "doc_a")
      .join(arrs.select(col("doc").as("doc_b"), col("nsh").as("nb"), col("shs").as("sb")), "doc_b")
      .withColumn("c",
        graft.functions.SketchFunctions.intersect_count_sorted(col("sa"), col("sb")))
      .withColumn("jaccard", round(col("c").cast("double") / (col("na") + col("nb") - col("c")), 6))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Asymmetric CONTAINMENT near-dup pairs: `C(A→B) = |sh(A) ∩ sh(B)|
    * / |sh(A)| >= tau` for ordered pairs of distinct docs — the
    * subset/quotation detector Jaccard misses (a doc fully embedded in
    * a much larger one has tiny Jaccard but containment 1.0; this is
    * the relation MinHash-era web dedup calls "containment", Broder
    * '97).
    *
    * Prefix filtering adapts ASYMMETRICALLY: C >= tau needs overlap
    * >= tau·|A|, so only the contained side prunes to its first
    * `|A| - ⌈tau·|A|⌉ + 1` sorted hashes, while the containing side
    * indexes every shingle (it has no upper size bound). Size filter
    * `|B| >= tau·|A|`; positional filter `1 + min(na-pa, nb-pb) >=
    * tau·na`. Every bound is relaxed by 1e-9 so float rounding only
    * ever ADMITS candidates — the compiled merge-intersect verify is
    * exact. Scale shape: postings-keyed shuffle_hash join (bounded
    * key), candidate volume governed by the same `maxShingleDocFreq`
    * hot-shingle cap as [[jaccardPairs]] (same exactness caveat).
    *
    * @return (doc_a, doc_b, containment): sh(doc_a) is tau-contained
    *   in doc_b, containment rounded to 1e-6.
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      tau: Double,
      maxShingleDocFreq: Option[Int] = None): DataFrame = {
    val eps = 1e-9
    // persisted: prefix side, full side, and the df pass all derive
    // from it (plus the verify's plan-identical joins) — see
    // jaccardPairs
    val arrs = graft.core.CacheScope.track(
      df.select(col(idCol).as("doc"),
        graft.functions.SketchFunctions.sorted_shingle_hashes(col(textCol), n).as("shs"))
      .select(col("doc"), size(col("shs")).as("nsh"), col("shs"))
      .persist())
    val prefixLen = (col("nsh") - ceil(col("nsh") * tau - eps) + 1).cast("int")
    val pfx0 = arrs.select(col("doc"), col("nsh"),
        posexplode(slice(col("shs"), lit(1), prefixLen)).as(Seq("p0", "sh")))
      .select(col("doc"), col("nsh"), (col("p0") + 1).as("p"), col("sh"))
    val full0 = arrs.select(col("doc"), col("nsh"),
        posexplode(col("shs")).as(Seq("p0", "sh")))
      .select(col("doc"), col("nsh"), (col("p0") + 1).as("p"), col("sh"))
    val (pfx, full) = maxShingleDocFreq match {
      case Some(cap) =>
        val hot = arrs.select(explode(col("shs")).as("sh"))
          .groupBy(col("sh")).agg(count(lit(1)).as("df_"))
          .filter(col("df_") > cap).select(col("sh"))
        (pfx0.join(hot, Seq("sh"), "left_anti"),
          full0.join(hot, Seq("sh"), "left_anti"))
      case None => (pfx0, full0)
    }
    val needed = col("l.nsh") * lit(tau) - eps
    val candidates = pfx.as("l")
      .join(full.as("r").hint("shuffle_hash"),
        col("l.sh") === col("r.sh") && col("l.doc") =!= col("r.doc") &&
          col("r.nsh").cast("double") >= needed &&
          (lit(1) + least(col("l.nsh") - col("l.p"), col("r.nsh") - col("r.p")))
            .cast("double") >= needed)
      .select(col("l.doc").as("doc_a"), col("r.doc").as("doc_b"))
    graft.core.Skew.parallelPairDistinct( // verify parallelism (§2.5)
        candidates, Seq("doc_a", "doc_b"))
      .join(arrs.select(col("doc").as("doc_a"), col("nsh").as("na"), col("shs").as("sa")), "doc_a")
      .join(arrs.select(col("doc").as("doc_b"), col("shs").as("sb")), "doc_b")
      .withColumn("c",
        graft.functions.SketchFunctions.intersect_count_sorted(col("sa"), col("sb")))
      .withColumn("containment", round(col("c").cast("double") / col("na"), 6))
      .filter(col("containment") >= tau)
      .select(col("doc_a"), col("doc_b"), col("containment"))
  }

  /** 60-bit SimHash over a shingle set: bit k of the sketch is 1 iff
    * the sum over shingles of ±1 (sign = bit k of the top-60 md5 bits
    * of the shingle) is positive. Compiled kernel (SketchOps). md5 (not
    * xxh64) so an independent engine can recompute the identical sketch
    * in SQL — the DuckDB oracle for q25 does exactly that, giving the
    * approximate operator a full hash-checked correctness gate.
    */
  def simhash60(shingleSet: Column): Column =
    graft.functions.SketchFunctions.simhash60(shingleSet)

  /** SimHash near-dup pairs with hamming distance <= maxHamming,
    * verified by exact Jaccard >= tau. Candidate generation: split the
    * 60-bit sketch into `pieces` equal bit-slices; by pigeonhole, any
    * pair with hamming <= pieces-1 shares at least one identical piece,
    * so joining on (piece index, piece bits) finds all such pairs
    * without a cross join. Recall w.r.t. the predicate
    * `hamming <= maxHamming AND jaccard >= tau` is therefore EXACTLY 1:
    * the output is the full predicate set, not a sample of it.
    *
    * Default maxHamming=3 (4 pieces x 15 bits, the Manku et al. web-dedup
    * configuration): 2^15 bucket values keep candidate pairs near-linear.
    * Wider hamming (e.g. 9 -> 6-bit pieces) collapses to 64 bucket values
    * and the candidate set degenerates toward |D|^2 when sketches are
    * correlated (shared vocabulary) — measured 13s vs ~1s at sf0.1.
    *
    * @param maxBucketDocFreq drop piece buckets holding more than this
    *   many docs — same hot-template guard and recall caveat as
    *   [[minhashLshPairs]] (a boilerplate template shares all its
    *   pieces, filling 4 buckets to the template count).
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      maxHamming: Int = 3,
      tau: Double = 0.5,
      maxBucketDocFreq: Option[Int] = None): DataFrame = {
    val pieces = maxHamming + 1
    require(60 % pieces == 0, s"pieces=$pieces must divide 60")
    val width = 60 / pieces
    val mask = (1L << width) - 1
    val sh = df.select(col(idCol).as("doc"), TextFunctions.shingles(col(textCol), n).as("sh"))
      .withColumn("sim", simhash60(col("sh")))
    val pieceKeys0 = graft.core.CacheScope.track(sh.select(
      col("doc"), col("sim"),
      explode(array((0 until pieces).map { p =>
        concat_ws(":", lit(p),
          shiftrightunsigned(col("sim"), p * width).bitwiseAND(mask))
      }: _*)).as("piece"))
      .select(col("doc"), col("sim"), col("piece"))
      // persisted: both sides of the piece self-join derive from it —
      // without the cache the corpus shingles + simhashes twice
      .persist())
    val pieceKeys = graft.core.Skew.dropHotKeys(pieceKeys0, "piece", maxBucketDocFreq)
    val candidates = pieceKeys.as("l")
      .join(pieceKeys.as("r").hint("shuffle_hash"), col("l.piece") === col("r.piece"))
      .filter(col("l.doc") < col("r.doc"))
      .filter(bit_count(col("l.sim").bitwiseXOR(col("r.sim"))) <= maxHamming)
      .select(col("l.doc").as("doc_a"), col("r.doc").as("doc_b"))
      // plain distinct — banded candidate volume, see minhashLshPairs
      .distinct()
    verifyByExactJaccard(df, idCol, textCol, n, tau, candidates)
  }

  /** (doc, 1-based position, word n-gram) span rows — empty for docs
    * shorter than n words. Compiled n-gram kernel (ngrams_all): the
    * transform/concat_ws Column version was interpreted per gram and
    * dominated the span pipeline's runtime.
    */
  private def spanGrams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
        posexplode(graft.functions.SketchFunctions.ngrams_all_strict(col(textCol), n))
          .as(Seq("pos0", "gram")))
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("gram"))

  /** Substring-level duplication signal (the dedup granularity of Lee
    * et al., "Deduplicating Training Data Makes Language Models
    * Better", ACL'22 — there via suffix arrays): word n-grams occurring
    * in >= minDocs DISTINCT documents, with corpus-wide document and
    * occurrence counts. One aggregation keyed on the gram — map-side
    * partial count-distinct via the (gram, doc) pre-aggregate, never a
    * self-join.
    */
  def duplicatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int = 2): DataFrame =
    spanGrams(df, idCol, textCol, n)
      .groupBy(col("gram"), col("doc_id")).agg(count(lit(1)).as("occ"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_docs"), sum(col("occ")).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)

  /** In-place cross-document test over a `partCol` window: true iff at
    * least `minDocs` DISTINCT `docCol` values share the partition. The
    * minDocs=2 case is a state-free min≠max; larger thresholds count
    * distinct docs as `max(dense_rank ordered by doc)` — two window
    * specs over the SAME partitioning (one exchange, the ordered sort
    * the window needs anyway), never a per-row `collect_set` that
    * materializes the hottest partition's doc set once per row.
    */
  private def crossDocTest(partCol: Column, docCol: Column, minDocs: Int): Column = {
    import org.apache.spark.sql.expressions.Window
    if (minDocs <= 1) lit(true)
    else if (minDocs == 2) {
      val w = Window.partitionBy(partCol)
      min(docCol).over(w) =!= max(docCol).over(w)
    } else
      max(dense_rank().over(Window.partitionBy(partCol).orderBy(docCol)))
        .over(Window.partitionBy(partCol)) >= minDocs
  }

  /** Per-document positions of cross-document duplicated spans — the
    * cut list a span-level scrubber consumes. ONE pass: a
    * [[crossDocTest]] window over the gram partition decides cross-doc
    * duplication in place, so the expensive gram explosion runs once
    * and the gram strings cross exactly one shuffle (vs. the semi-join
    * formulation's two scans + two shuffles).
    */
  def docDuplicatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int = 2): DataFrame =
    spanGrams(df, idCol, textCol, n)
      .withColumn("_dup", crossDocTest(col("gram"), col("doc_id"), minDocs))
      .filter(col("_dup"))
      .select(col("doc_id"), col("pos"), col("gram"))

  /** Variable-length exact-substring duplication (the suffix-array
    * result of Lee et al. ACL'22 re-expressed relationally): the
    * MAXIMAL runs of words two documents share, found by chaining
    * their shared n-grams along match diagonals. A shared n-gram at
    * positions (pa, pb) extended by one at (pa+1, pb+1) is the same
    * underlying substring one word longer, so a maximal shared
    * substring of w >= n words is exactly a maximal diagonal run of
    * w-n+1 shared grams — detected with one window, no per-length
    * re-scan. Output: (doc_a, doc_b, start_a, start_b, span_words),
    * one row per maximal run with span_words >= minSpanWords.
    *
    * Scale shape: grams are md5-keyed BEFORE the self-join (32-char
    * hashes cross the shuffle, never gram text), the join is
    * gram-keyed and df-capped (`maxGramOcc` drops grams occurring more
    * than that many times corpus-wide — stopword runs — before they
    * fan out quadratically; None = exact), and run merging is one
    * window over (pair, diagonal) — per-pair work bounded by the
    * shorter document, never corpus-wide.
    *
    * Boundary exactness: spans are WORD-exact, not gram-grid-quantized,
    * because gram extraction is stride-1 (every word position starts a
    * gram). A maximal shared word run of length L >= n contributes
    * matching grams at every diagonal offset 0..L-n, so the island's
    * min(pos) is the run's first word and count+n-1 = L exactly — L
    * need not be a multiple of n, and no ±(n-1) re-extension against
    * the token arrays is required (that step belongs to STRIDED/sampled
    * gram schemes, which trade it for a smaller posting table). Runs
    * shorter than n are below the gram resolution by construction —
    * the `minSpanWords >= n` require states that contract.
    * DedupSpec("maximal shared spans are word-exact...") pins this with
    * run lengths that are not gram multiples.
    */
  def maximalSharedSpans(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minSpanWords: Int,
      maxGramOcc: Option[Int] = Some(1024)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minSpanWords >= n, s"a span of < $n words is below the gram resolution")
    val grams = graft.core.Skew.dropHotKeys(
      spanGrams(df, idCol, textCol, n)
        .select(col("doc_id"), col("pos"), md5(col("gram")).as("gh")),
      "gh", maxGramOcc)
    val matches = grams.select(col("gh"), col("doc_id").as("doc_a"), col("pos").as("pos_a"))
      .join(grams.select(col("gh"), col("doc_id").as("doc_b"), col("pos").as("pos_b")), Seq("gh"))
      .filter(col("doc_a") < col("doc_b"))
    // consecutive grams on a diagonal share (pos_a - row_number): the
    // classic gaps-and-islands grouping, one sort per (pair, diagonal)
    val w = Window.partitionBy(col("doc_a"), col("doc_b"), col("pos_a") - col("pos_b"))
      .orderBy(col("pos_a"))
    matches
      .withColumn("_grp", col("pos_a") - row_number().over(w))
      .groupBy(col("doc_a"), col("doc_b"), col("pos_a") - col("pos_b"), col("_grp"))
      .agg(min(col("pos_a")).as("start_a"), min(col("pos_b")).as("start_b"),
        (count(lit(1)) + lit(n.toLong - 1)).as("span_words"))
      .filter(col("span_words") >= minSpanWords)
      .select(col("doc_a"), col("doc_b"), col("start_a"), col("start_b"),
        col("span_words"))
  }

  /** Per-document n-gram novelty: the fraction of a document's DISTINCT
    * word n-grams that appear in no other document — the memorization/
    * novelty diagnostic of dataset analyses (high = original content,
    * low = assembled from corpus-common material). Returns
    * (doc_id, n_grams, n_novel, novelty) with novelty floored to 6dp.
    *
    * Scale shape: one (gram, doc) distinct explode feeds an in-place
    * [[crossDocTest]] window — same one-exchange shape as
    * [[docDuplicatedSpans]], no self-join, no second gram scan; grams
    * cross the shuffle md5-keyed.
    */
  def ngramNovelty(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val grams = df.select(col(idCol).as("doc_id"),
        explode(graft.text.TextFunctions.shingles(col(textCol), n)).as("gram"))
      .select(col("doc_id"), md5(col("gram")).as("gh"))
    grams
      .withColumn("_shared", crossDocTest(col("gh"), col("doc_id"), 2))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_shared"), 0L).otherwise(1L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        (floor(col("n_novel").cast("double") / col("n_grams") * 1e6) / 1e6)
          .as("novelty"))
  }

  /** Cross-corpus novelty — [[ngramNovelty]] against a REFERENCE
    * corpus: what fraction of an incoming document's distinct shingles
    * the existing corpus has never seen (the data-valuation signal of
    * incremental ingestion: a batch that scores low adds nothing).
    * Returns (doc_id, n_grams, n_known, novelty).
    *
    * Scale shape: the sides are asymmetric the OTHER way from
    * decontamination — the reference (the standing corpus) is huge and
    * the incoming batch small, so the BATCH is the hash-join build
    * side (`shuffle_hash`, the [[jaccardPairsAgainst]] pattern) and
    * the reference's distinct gram hashes stream through one
    * gram-keyed shuffle; nothing reference-sized ever broadcasts or
    * collects. The batch explodes once and aggregates doc-keyed.
    */
  def crossCorpusNovelty(
      batch: DataFrame, idCol: String, textCol: String,
      reference: DataFrame, refTextCol: String, n: Int): DataFrame = {
    val refGrams = reference
      .select(explode(graft.text.TextFunctions.shingles(col(refTextCol), n)).as("g"))
      .select(md5(col("g")).as("gh")).distinct()
    val batchGrams = batch.select(col(idCol).as("doc_id"),
        explode(graft.text.TextFunctions.shingles(col(textCol), n)).as("g"))
      .select(col("doc_id"), md5(col("g")).as("gh"))
    // ref is distinct on gh, so the inner join hits each batch gram at
    // most once — known = batch grams present in the reference
    val known = refGrams
      .join(batchGrams.hint("shuffle_hash"), Seq("gh"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_known"))
    batchGrams.groupBy(col("doc_id")).agg(count(lit(1)).as("n_grams"))
      .join(known, Seq("doc_id"), "left")
      .withColumn("n_known", coalesce(col("n_known"), lit(0L)))
      .select(col("doc_id"), col("n_grams"), col("n_known"),
        (floor((col("n_grams") - col("n_known")).cast("double") /
          col("n_grams") * 1e6) / 1e6).as("novelty"))
  }

  /** Span-level scrubbing — the full Lee et al. ACL'22 operation: cut
    * every word covered by a cross-document duplicated n-gram span and
    * re-emit the cleaned text (plus the cut count, the signal a
    * curation report wants). One row per input document; documents
    * with no duplicated spans pass through unchanged.
    *
    * Shape at scale: the cut-position lists are bounded by document
    * length and join back on the doc id — the corpus text crosses one
    * doc-keyed shuffle and the per-token coverage test runs
    * map-side. No driver-side state.
    */
  def scrubDuplicatedSpans(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int = 2): DataFrame = {
    val cuts = docDuplicatedSpans(df, idCol, textCol, n, minDocs)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
    // compiled one-pass interval-merge scrub: O(len + |ps|) per doc —
    // the per-token exists() lambda pair was interpreted AND
    // O(len·|ps|), quadratic for a fully-duplicated document
    df.select(col(idCol).as("doc_id"), col(textCol).as("_txt"))
      .join(cuts, Seq("doc_id"), "left")
      .withColumn("ps", coalesce(col("ps"), expr("array()").cast("array<long>")))
      .withColumn("r",
        graft.functions.SketchFunctions.scrub_spans(col("_txt"), col("ps"), n))
      .select(col("doc_id"), col("r.clean_text"), col("r.n_cut"))
  }

  /** Line-level dedup (the CCNet / RefinedWeb boilerplate-removal
    * stage): drop every line whose exact content appears in at least
    * `minDocs` DISTINCT documents — navigation chrome, cookie banners,
    * license footers — and re-emit the cleaned text with the original
    * line order preserved. One row per input document; documents with
    * no boilerplate pass through unchanged. Returns
    * (doc_id, clean_text, n_lines, n_removed).
    *
    * Lines shorter than `minLineChars` (default: empty lines) never
    * count as boilerplate — a ubiquitous blank line must not be
    * scrubbed out of every document — and are dropped BEFORE the
    * shuffle, so they never cross it either.
    *
    * Shape at scale: lines are md5-keyed BEFORE the shuffle, so the
    * duplication window exchanges 32-char hashes, never the line text;
    * the cross-doc test is the same in-place `min(doc) != max(doc)`
    * window as [[docDuplicatedSpans]] (one exchange, no self-join, no
    * second scan). Cut-position lists are bounded by per-document line
    * counts and join back doc-keyed; reassembly is map-side.
    */
  def dedupLines(
      df: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 2, sep: String = "\n",
      minLineChars: Int = 1): DataFrame = {
    val sepLit = java.util.regex.Pattern.quote(sep)
    val lines = df.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), sepLit)).as(Seq("pos0", "line")))
      .filter(length(col("line")) >= minLineChars)
      .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
        md5(col("line")).as("lh"))
    val cuts = lines
      .withColumn("_dup", crossDocTest(col("lh"), col("doc_id"), minDocs))
      .filter(col("_dup"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
    // compiled one-pass scrub: O(len + |ps|) per doc — the per-line
    // array_contains lambda chain is interpreted and O(lines·|ps|),
    // quadratic exactly on the boilerplate-heavy docs this targets
    df.select(col(idCol).as("doc_id"), col(textCol).as("_txt"))
      .join(cuts, Seq("doc_id"), "left")
      .withColumn("ps", coalesce(col("ps"), expr("array()").cast("array<long>")))
      .withColumn("r",
        graft.functions.SketchFunctions.scrub_lines(col("_txt"), col("ps"), sep))
      .select(col("doc_id"), col("r.clean_text"), col("r.n_lines"),
        col("r.n_removed"))
  }

  /** Benchmark decontamination matches: documents sharing at least
    * `minShared` distinct word n-grams with any probe document (the
    * standard pre-training hygiene pass — drop training docs that
    * contain eval-set material). Returns (doc_id, probe_id, shared)
    * edges; compose with an anti join ([[decontaminate]]) to drop them.
    *
    * Scale shape: the probe set (a benchmark suite) is orders of
    * magnitude smaller than the corpus, so its postings BROADCAST —
    * the corpus postings never shuffle, and the (doc, probe) overlap
    * count aggregates with map-side partials. Corpus side explodes to
    * distinct shingle hashes only (compiled kernel).
    */
  def contaminationMatches(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      probes: DataFrame,
      probeIdCol: String,
      probeTextCol: String,
      n: Int = 3,
      minShared: Int = 1): DataFrame = {
    def postings(df: DataFrame, id: String, text: String, as: String) =
      df.select(col(id).as(as),
          graft.functions.SketchFunctions.sorted_shingle_hashes(col(text), n).as("shs"))
        .select(col(as), explode(col("shs")).as("sh"))
    val docPost = postings(docs, idCol, textCol, "doc_id_")
    val probePost = postings(probes, probeIdCol, probeTextCol, "probe_id_")
    docPost.join(broadcast(probePost), Seq("sh"))
      .groupBy(col("doc_id_").as("doc_id"), col("probe_id_").as("probe_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** Drop every document matched by [[contaminationMatches]] (anti
    * join on the contaminated ids — `docs` rows pass through
    * unchanged).
    */
  def decontaminate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      probes: DataFrame,
      probeIdCol: String,
      probeTextCol: String,
      n: Int = 3,
      minShared: Int = 1): DataFrame = {
    val bad = contaminationMatches(docs, idCol, textCol,
        probes, probeIdCol, probeTextCol, n, minShared)
      .select(col("doc_id").as(idCol)).distinct()
    docs.join(bad, Seq(idCol), "left_anti")
  }

  /** Surgical decontamination: instead of dropping whole matched
    * documents ([[decontaminate]]), cut ONLY the spans that verbatim-
    * match a probe (eval-set) word n-gram and re-emit the cleaned
    * text — the hygiene pass that keeps a long document whose one
    * quoted benchmark sentence would otherwise cost the whole row.
    * Returns (doc_id, clean_text, n_cut); untouched docs pass through.
    *
    * Scale shape: the probe gram set (a benchmark suite) is bounded by
    * definition and BROADCASTS; the corpus positional grams semi-join
    * it map-side and never shuffle, the surviving cut lists are
    * bounded by document length and join back doc-keyed, and the
    * reassembly is the compiled one-pass [[scrubDuplicatedSpans]]
    * kernel. Probes shorter than `n` words contribute no grams (strict
    * n-grams) — decontaminate by document match for those.
    */
  def scrubContaminatedSpans(
      docs: DataFrame, idCol: String, textCol: String,
      probes: DataFrame, probeTextCol: String, n: Int = 8): DataFrame = {
    val probeGrams = probes.select(
        explode(graft.functions.SketchFunctions.ngrams_all_strict(col(probeTextCol), n))
          .as("gram"))
      .distinct()
    val cuts = spanGrams(docs, idCol, textCol, n)
      .join(broadcast(probeGrams), Seq("gram"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
    docs.select(col(idCol).as("doc_id"), col(textCol).as("_txt"))
      .join(cuts, Seq("doc_id"), "left")
      .withColumn("ps", coalesce(col("ps"), expr("array()").cast("array<long>")))
      .withColumn("r",
        graft.functions.SketchFunctions.scrub_spans(col("_txt"), col("ps"), n))
      .select(col("doc_id"), col("r.clean_text"), col("r.n_cut"))
  }

  /** Greedy cluster-collapse of a similar-pairs edge list: every doc
    * maps to the smallest doc id it is paired with, then keeper chains
    * are followed to their root (if doc c's keeper b is itself dropped
    * in favor of a, c collapses to a). One aggregate covers clusters
    * of diameter <= 2 — the overwhelming near-dup case — and the rare
    * longer chain resolves by POINTER JUMPING: each pass re-points a
    * drop at its keeper's keeper, halving every chain, so a chain of
    * length L needs ceil(log2 L) passes, each one keyed join over the
    * (small) mapping — never over the corpus. The fast path costs a
    * single semi-join emptiness probe.
    */
  def collapsePairs(pairs: DataFrame): DataFrame =
    resolveChains(pairs.select(col("doc_a").as("keep"), col("doc_b").as("drop"))
      .groupBy(col("drop")).agg(min(col("keep")).as("keep"))
      .select(col("keep"), col("drop")))

  /** [[collapsePairs]] with an explicit survivor policy: every doc maps
    * to its best pair-neighbor by (score desc, id asc) — keep the
    * longest / highest-quality duplicate instead of the smallest id,
    * the policy production dedup actually wants. `scores` is one
    * (doc_id, score) row per doc; docs that outrank all their
    * neighbors survive (absent from the mapping). Chains resolve by
    * the same pointer jumping — the keeper strictly outranks the drop
    * along every edge, so chains are acyclic and shrink log-fast.
    *
    * Scale shape: edges join scores on doc ids (bounded keys), the
    * argmax is one doc-keyed struct-max aggregate, and the jumping
    * passes run over the drop-sized mapping, never the corpus.
    */
  def collapsePairsBy(pairs: DataFrame, scores: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val edges = pairs.select(col("doc_a").as("x"), col("doc_b").as("y"))
      .unionByName(pairs.select(col("doc_b").as("x"), col("doc_a").as("y")))
    val sx = scores.select(col("doc_id").as("x"), col("score").as("sx"))
    val sy = scores.select(col("doc_id").as("y"), col("score").as("sy"))
    // left joins + raise_error IN THE FILTER: an endpoint missing from
    // `scores` must fail loudly — an inner join would silently drop
    // the edge and let both near-duplicates survive, and an asserted
    // column that nothing reads would be pruned out of the plan
    val scored = edges.join(sx, Seq("x"), "left").join(sy, Seq("y"), "left")
      .filter(when(col("sx").isNotNull && col("sy").isNotNull, lit(true))
        .otherwise(raise_error(
          lit("collapsePairsBy: a paired doc is missing from scores"))))
    val oriented = scored.filter(col("sy") > col("sx") ||
      (col("sy") === col("sx") && col("y") < col("x")))
    // row_number, not a struct-argmax with a negated id: works for any
    // orderable id type (string UUIDs included), like collapsePairs
    val w = Window.partitionBy(col("x")).orderBy(col("sy").desc, col("y").asc)
    resolveChains(oriented
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("y").as("keep"), col("x").as("drop")))
  }

  /** Edit-distance-1 near-key pairs (the entity-resolution fuzzy
    * match): all (a < b) id pairs whose strings are within levenshtein
    * distance 1, via DELETION NEIGHBORHOODS (FastSS): two strings
    * within distance 1 — substitution, insertion, or deletion — share
    * at least one member of {s} ∪ {s minus char i}, so an equi-join on
    * the md5 of those |s|+1 variants is a sound AND complete candidate
    * generator; the exact levenshtein then verifies. No thresholds, no
    * recall loss.
    *
    * Scale shape: the variant explosion is map-side and linear in
    * string length; candidates join on 32-char hashes (never the
    * strings); `maxVariantFreq` drops degenerate hot variants (the
    * empty string, single chars) before they fan out quadratically —
    * the same df-cap discipline as the shingle joins. Distance > 1
    * wants the recursive variant tree; at that radius use
    * [[jaccardPairs]] on character n-grams instead.
    */
  def editDistancePairs(
      df: DataFrame, idCol: String, strCol: String,
      maxVariantFreq: Option[Int] = None): DataFrame = {
    val s = col("_s")
    val dels = transform(sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s))))
    val vars = df.select(col(idCol).as("_id"), col(strCol).as("_s"))
      .filter(s.isNotNull)
      .select(col("_id"), col("_s"),
        explode(
          when(length(s) >= 1, array_union(array(s), dels))
            .otherwise(array(s))).as("_v"))
      .select(col("_id"), col("_s"), md5(col("_v")).as("_vh"))
    val capped = graft.core.Skew.dropHotKeys(vars, "_vh", maxVariantFreq)
    capped.select(col("_vh"), col("_id").as("id_a"), col("_s").as("_sa"))
      .join(capped.select(col("_vh"), col("_id").as("id_b"), col("_s").as("_sb")),
        Seq("_vh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("_sa"), col("_sb")).distinct()
      .withColumn("dist", levenshtein(col("_sa"), col("_sb")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Near-dup pairs over any 64-bit fingerprint column by hamming
    * distance — the generic banded form behind pHash image dedup
    * ([[graft.multimodal.Multimodal.phashNearDupPairs]]) and any other
    * bit-sketch. Candidates by pigeonhole: the 64 bits split into
    * maxHamming+1 disjoint pieces, so a pair within the distance shares
    * at least one identical (piece index, piece bits) key — a hash
    * join, never |D|²; verification is an exact popcount of the XOR.
    * Returns (id_a, id_b, hamming), id_a < id_b.
    *
    * @param maxBucketDocFreq the hot-bucket guard: a degenerate
    *   fingerprint (all-black thumbnails) fills its piece buckets to
    *   the duplicate-family size — same cap semantics and recall
    *   caveat as [[simhashPairs]].
    */
  def hammingPairs64(
      df: DataFrame, idCol: String, fpCol: String,
      maxHamming: Int = 3,
      maxBucketDocFreq: Option[Int] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 64)")
    val pieces = maxHamming + 1
    val width = 64 / pieces
    val pieceCols = (0 until pieces).map { p =>
      val lo = p * width
      val w = if (p == pieces - 1) 64 - lo else width
      val bitsv =
        if (w >= 64) col("fp")
        else shiftrightunsigned(col("fp"), lo).bitwiseAND(lit((1L << w) - 1L))
      concat_ws(":", lit(p), bitsv)
    }
    // persisted: both sides of the piece self-join derive from the
    // keyed rows — without the cache the caller's fingerprint pipeline
    // (media decode, simhash) evaluates once per side
    val keyed = graft.core.CacheScope.track(
      df.select(col(idCol).as("id"), col(fpCol).cast("long").as("fp"))
        .select(col("id"), col("fp"), explode(array(pieceCols: _*)).as("bucket"))
        .persist())
    val b = graft.core.Skew.dropHotKeys(keyed, "bucket", maxBucketDocFreq)
    b.as("l")
      .join(b.as("r").hint("shuffle_hash"), col("l.bucket") === col("r.bucket"))
      .filter(col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.fp").as("_fa"), col("r.fp").as("_fb"))
      .distinct()
      .withColumn("hamming", bit_count(col("_fa").bitwiseXOR(col("_fb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Connected components over a (doc_a, doc_b) pair set — the FULL
    * dedup-cluster resolution. [[collapsePairs]] is the greedy
    * min-keeper (every paired doc maps to a smaller neighbor); this
    * labels every node of every component with the component's MINIMUM
    * id at any diameter, the cluster identity a dedup report or a
    * cluster-level sampler needs. Returns (doc_id, component_id), one
    * row per distinct node in `pairs`.
    *
    * Algorithm: distributed hash-min label propagation with a
    * pointer-jumping compression step each round (label ← label of
    * label), so rounds are O(log diameter), not O(diameter). Each
    * round is two keyed joins sized by the PAIR set — dedup
    * neighborhoods, never the corpus — plus one emptiness probe on
    * the changed-label set. Deterministic: min is order-free.
    *
    * Cache lifecycle: above the local threshold the returned labels
    * stay persisted (the caller's consumption reads them). Consume
    * inside [[graft.core.CacheScope.withReleased]] and the storage is
    * released when the bracket closes; outside a bracket, release with
    * unpersist/clearCache when done, like the collapse family's
    * survivor maps.
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 64,
      localLimit: Long = LocalResolveRows): DataFrame = {
    val edges = pairs.select(col("doc_a").as("x"), col("doc_b").as("y"))
      .unionByName(pairs.select(col("doc_b").as("x"), col("doc_a").as("y")))
      .distinct().persist()
    // size-adaptive local fast path (see LocalResolveRows): a bounded
    // edge set resolves with one collect + union-find instead of
    // per-round probe/join jobs whose scheduling floor dwarfs the data
    val ecount = edges.count()
    if (ecount <= localLimit) {
      val rows = edges.collect()
      val spark = edges.sparkSession
      val idType = edges.schema("x").dataType
      edges.unpersist(blocking = false)
      val parent = new java.util.HashMap[Any, Any]()
      def find(a0: Any): Any = {
        var a = a0
        while (parent.containsKey(a) && parent.get(a) != a) a = parent.get(a)
        var b = a0 // path compression
        while (parent.containsKey(b) && parent.get(b) != b) {
          val nxt = parent.get(b); parent.put(b, a); b = nxt
        }
        a
      }
      rows.foreach { r =>
        val (x, y) = (r.get(0), r.get(1))
        if (!parent.containsKey(x)) parent.put(x, x)
        if (!parent.containsKey(y)) parent.put(y, y)
        val (rx, ry) = (find(x), find(y))
        if (rx != ry) parent.put(rx, ry)
      }
      // component label = MIN id of the component — under the SAME
      // total order the distributed path uses. Spark's min/least on
      // StringType compares UTF8String bytes (unsigned), which is NOT
      // java String.compareTo (UTF-16 code-unit order): they disagree
      // when non-BMP code points mix with U+E000–U+FFFF. Compare
      // Strings by unsigned UTF-8 bytes so both paths label alike.
      def lessThan(a: Any, b: Any): Boolean = (a, b) match {
        case (x: String, y: String) =>
          java.util.Arrays.compareUnsigned(
            x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            y.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
        case (x: Comparable[_], _) =>
          x.asInstanceOf[Comparable[Any]].compareTo(b) < 0
        case _ => throw new IllegalArgumentException(
          s"connectedComponents requires an orderable id type, got $idType")
      }
      val minOf = new java.util.HashMap[Any, Any]()
      val it = parent.keySet().iterator()
      while (it.hasNext) {
        val node = it.next()
        val root = find(node)
        val cur = minOf.get(root)
        if (cur == null || lessThan(node, cur))
          minOf.put(root, node)
      }
      val out: java.util.List[org.apache.spark.sql.Row] =
        new java.util.ArrayList(parent.size())
      val it2 = parent.keySet().iterator()
      while (it2.hasNext) {
        val node = it2.next()
        out.add(org.apache.spark.sql.Row(node, minOf.get(find(node))))
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id", idType),
        org.apache.spark.sql.types.StructField("component_id", idType)))
      return spark.createDataFrame(out, schema)
    }
    var labels = edges.groupBy(col("x"))
      .agg(min(col("y")).as("_mn"))
      .select(col("x").as("node"), least(col("x"), col("_mn")).as("label"))
      .persist()
    var changed = true
    var it = 0
    while (changed && it < maxIters) {
      val nbr = edges
        .join(labels.select(col("node").as("y"), col("label").as("_ly")), Seq("y"))
        .groupBy(col("x").as("node")).agg(min(col("_ly")).as("_nmin"))
      val stepped = labels.join(nbr, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("_nmin"), col("label"))).as("label"))
      // compression: a label is itself a node id of the component, so
      // label-of-label is defined and never larger
      val jumped = stepped
        .join(stepped.select(col("label").as("_pl"), col("node").as("label")),
          Seq("label"), "left")
        .select(col("node"), coalesce(col("_pl"), col("label")).as("label"))
        .persist()
      changed = !jumped.select(col("node"), col("label").as("_new"))
        .join(labels.select(col("node"), col("label").as("_old")), Seq("node"))
        .filter(col("_new") =!= col("_old")).isEmpty
      labels.unpersist(blocking = false)
      labels = jumped
      it += 1
    }
    // Pointer jumping converges in O(log diameter) rounds, so the cap
    // is practically unreachable — but exhausting it would silently
    // return a labeling where one component carries several ids. Fail
    // loudly instead (mirrors the resolveChains hop-cap rationale).
    require(!changed,
      s"connectedComponents did not converge within $maxIters rounds")
    edges.unpersist(blocking = false)
    graft.core.CacheScope.track(labels)
    labels.select(col("node").as("doc_id"), col("label").as("component_id"))
  }

  /** Fold a NEW edge batch into an existing [[connectedComponents]]
    * labeling without recomputing from the full edge set — the
    * streaming-ingest shape: a dedup service holding labels over 100 TB
    * of resolved pairs cannot re-run every historical pair per admitted
    * batch.
    *
    * Correctness rests on the labeling being a valid graph CONTRACTION:
    * two old nodes are connected in (oldEdges ∪ newPairs) iff their
    * components are connected through new edges alone. So each new
    * edge's endpoints map to their existing component id (unseen nodes
    * map to themselves), [[connectedComponents]] runs on that
    * contracted, BATCH-SIZED edge set, and the resulting super-labels
    * broadcast back over the standing labeling. Labels stay min-id
    * exact: an old component's id is the min of its members, so the
    * merged component's min over (component ids ∪ new node ids) equals
    * the min over all member nodes — identical to a full recompute on
    * the unioned edge set (spec-asserted, including batches that merge
    * old components and batches whose new node undercuts an old min).
    *
    * Scale shape: two batch-keyed lookup joins to contract endpoints, a
    * batch-sized CC, one broadcast join to relabel (touched components
    * ≤ 2·|batch|, so nothing corpus-sized shuffles), and a batch-keyed
    * anti join admitting genuinely-new nodes. Rows of untouched
    * components pass through label-unchanged.
    */
  def connectedComponentsIncremental(
      labels: DataFrame, // (doc_id, component_id)
      newPairs: DataFrame, // (doc_a, doc_b)
      maxIters: Int = 64,
      localLimit: Long = LocalResolveRows): DataFrame = {
    val l = labels.select(col("doc_id"), col("component_id"))
    val contracted = newPairs
      .join(l.select(col("doc_id").as("doc_a"), col("component_id").as("_ca")),
        Seq("doc_a"), "left")
      .join(l.select(col("doc_id").as("doc_b"), col("component_id").as("_cb")),
        Seq("doc_b"), "left")
      .select(coalesce(col("_ca"), col("doc_a")).as("doc_a"),
        coalesce(col("_cb"), col("doc_b")).as("doc_b"))
    // (old component id | new node) -> merged super label
    val superMap = connectedComponents(contracted, maxIters, localLimit)
      .select(col("doc_id").as("_cid"), col("component_id").as("_super"))
    val relabeledOld = l
      .join(broadcast(superMap.withColumnRenamed("_cid", "component_id")),
        Seq("component_id"), "left")
      .select(col("doc_id"),
        coalesce(col("_super"), col("component_id")).as("component_id"))
    val newNodes = superMap
      .join(l.select(col("doc_id").as("_cid")), Seq("_cid"), "left_anti")
      .select(col("_cid").as("doc_id"), col("_super").as("component_id"))
    relabeledOld.unionByName(newNodes)
  }

  /** Follow keeper chains in a (keep, drop) mapping to their roots by
    * POINTER JUMPING: each pass re-points a drop at its keeper's
    * keeper, halving every chain, so a chain of length L needs
    * ceil(log2 L) passes, each one keyed join over the (small) mapping
    * — never over the corpus. Requires the keeper to strictly outrank
    * the drop in some fixed total order (min-id or best-score), which
    * makes chains acyclic. The fast path costs a single semi-join
    * emptiness probe.
    *
    * Cache lifecycle: the returned mapping stays persisted for the
    * caller's consumption; a [[graft.core.CacheScope.withReleased]]
    * bracket around build-and-consume releases it deterministically.
    */
  /** Survivor maps at or under this row count resolve driver-side (one
    * collect + an in-memory walk) instead of spawning per-round probe
    * and join jobs whose fixed scheduling cost dwarfs the data — the
    * same size-adaptive switch AQE applies to broadcast joins. A
    * million (keep, drop) pairs is a few tens of MB on the driver;
    * above it the distributed pointer jumping takes over unchanged.
    */
  private[dedup] val LocalResolveRows: Long = 1L << 20

  private[dedup] def resolveChains(mapping0: DataFrame,
      localLimit: Long = LocalResolveRows): DataFrame = {
    // The mapping is persisted BEFORE anything probes it: the count
    // then materializes the (small — one row per dropped doc) survivor
    // map once, and every later pass plus the caller's own consumption
    // read the cache — without it each probe would re-run the whole
    // upstream pair generation.
    var mapping = mapping0.persist()
    val n = mapping.count()
    if (n <= localLimit) {
      val rows = mapping.collect()
      val spark = mapping.sparkSession
      val schema = mapping.schema
      mapping.unpersist(blocking = false)
      val keepOf = new java.util.HashMap[Any, Any](rows.length * 2)
      rows.foreach(r => keepOf.put(r.get(1), r.get(0))) // drop -> keep
      // walk every chain to its ROOT (keeper rank strictly improves
      // along a chain => acyclic, so the walk terminates), memoizing
      // resolved roots so a long chain costs linear total work — a
      // fixed hop cap here would silently emit non-root survivors for
      // chains longer than the cap
      val rootOf = new java.util.HashMap[Any, Any](rows.length * 2)
      def root(k0: Any): Any = {
        val memo = rootOf.get(k0)
        if (memo != null) return memo
        val path = new java.util.ArrayList[Any]()
        var k = k0
        while (rootOf.get(k) == null && keepOf.containsKey(k)) {
          path.add(k)
          k = keepOf.get(k)
        }
        val r = if (rootOf.get(k) != null) rootOf.get(k) else k
        val it = path.iterator()
        while (it.hasNext) rootOf.put(it.next(), r)
        r
      }
      val resolved: java.util.List[org.apache.spark.sql.Row] =
        new java.util.ArrayList(rows.length)
      rows.foreach(r => resolved.add(org.apache.spark.sql.Row(root(r.get(0)), r.get(1))))
      return spark.createDataFrame(resolved, schema)
    }
    def parents(m: DataFrame): DataFrame =
      m.select(col("drop").as("keep"), col("keep").as("_parent"))
    def hasChain(m: DataFrame): Boolean =
      !m.join(parents(m).select(col("keep")), Seq("keep"), "left_semi").isEmpty
    // keeper rank strictly improves along a chain, so the jump count is
    // bounded by log2 of the longest chain; 64 is unreachable armor
    var guard = 0
    var prev: Option[DataFrame] = None
    while (guard < 64 && hasChain(mapping)) {
      prev.foreach(_.unpersist(blocking = false))
      prev = Some(mapping)
      mapping = mapping.join(parents(mapping), Seq("keep"), "left")
        .select(coalesce(col("_parent"), col("keep")).as("keep"), col("drop"))
        .persist()
      guard += 1
    }
    // the loop condition materialized the returned mapping's cache, so
    // the second-to-last generation can release its storage
    prev.foreach(_.unpersist(blocking = false))
    graft.core.CacheScope.track(mapping)
  }
}
