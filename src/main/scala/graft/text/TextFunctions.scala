package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernels for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language-ID
  * heuristics, and document fingerprinting.
  *
  * Everything here is pure `Column` expression composition — no UDFs —
  * so the whole module stays inside whole-stage codegen and is
  * pushdown/prune-friendly at 100 TB.
  */
object TextFunctions {

  /** Whitespace tokenizer (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct token set (the unit for set-similarity dedup). */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Word n-gram shingles, distinct. Documents shorter than `n` words
    * collapse to a single shingle = the whole text, so every doc has a
    * non-empty shingle set. Compiled kernel (SketchOps.shingles) — the
    * pure-Column transform/concat_ws version is interpreted per shingle
    * and dominated every sketch pipeline's runtime.
    */
  def shingles(text: Column, n: Int): Column =
    graft.functions.SketchFunctions.shingles(text, n)

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: letter runs, digit runs, and single
    * non-alphanumeric marks each count as one token — a cheap,
    * deterministic stand-in for a real subword tokenizer's token count.
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** Sum of token lengths (exact integer arithmetic). */
  def sumTokenLen(text: Column): Column =
    aggregate(tokens(text), lit(0), (acc, t) => acc + length(t))

  /** Type-token ratio: distinct / total tokens. */
  def typeTokenRatio(text: Column): Column =
    size(tokenSet(text)).cast("double") / size(tokens(text))

  /** Default English-ish stopword markers used by quality + lang-ID. */
  val EnStop: Seq[String] = Seq("the", "a", "of", "in", "to", "and")

  def stopwordRatio(text: Column, stop: Seq[String] = EnStop): Column = {
    val stopArr = array(stop.map(lit): _*)
    size(filter(tokens(text), t => array_contains(stopArr, t))).cast("double") /
      size(tokens(text))
  }

  /** C4-style blocklist test: true iff any whitespace token is in
    * `words` (C4 drops the whole document on one hit). A codegen'd
    * arrays_overlap against a literal array — right for word lists up
    * to a few thousand entries; for larger lexica use the broadcast
    * probe machinery (SketchFunctions.probe_shared_count) instead.
    */
  def containsBlocklisted(text: Column, words: Seq[String]): Column = {
    require(words.nonEmpty)
    // raw tokens, not tokenSet: duplicates cannot change an overlap
    // test, and array_distinct would add a per-row pass + allocation
    // to a full-corpus map-only scan
    arrays_overlap(tokens(text), array(words.map(lit): _*))
  }

  /** The large-lexicon blocklist gate: [[containsBlocklisted]] inlines
    * the word list as a codegen literal, which stops scaling around
    * 10^3 words; this form broadcasts the lexicon as a TABLE and
    * semi-joins the exploded distinct token stream against it —
    * 10^5+ words are a few MB broadcast, the match itself is map-side,
    * and the only shuffles are the hit-id distinct (hits only) and the
    * doc-keyed anti join back. Returns the surviving documents.
    *
    * @param lexicon one string column of blocked words.
    */
  def blocklistGateLarge(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      lexicon: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val word = lexicon.columns.head
    val w = graft.core.Names.fresh(df, "__w")
    // NULL-text docs drop, matching the literal gate: filter(!overlap)
    // evaluates NULL -> dropped there, and a doc that can't be
    // inspected shouldn't silently pass a safety gate here either.
    val inspectable = df.filter(col(textCol).isNotNull)
    val hits = inspectable
      .select(col(idCol), explode(tokenSet(col(textCol))).as(w))
      .join(broadcast(lexicon.select(col(word).as(w))), Seq(w), "left_semi")
      .select(col(idCol)).distinct()
    inspectable.join(hits, Seq(idCol), "left_anti")
  }

  /** Composite quality score in [0,1]: word count (saturating at 50),
    * lexical diversity, mean word length (saturating at 8), stopword
    * presence. Weights are fixed; result truncated (not rounded) to 6
    * decimals — `floor(x*1e6)/1e6` is engine-exact, while round-half
    * differs between BigDecimal HALF_UP (Spark) and float rounding
    * (DuckDB) at boundary values.
    */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val wc = size(t).cast("double")
    val meanLen = sumTokenLen(text).cast("double") / wc
    val score =
      lit(0.3) * least(lit(1.0), wc / 50) +
        lit(0.3) * typeTokenRatio(text) +
        lit(0.2) * least(lit(1.0), meanLen / 8) +
        lit(0.2) * stopwordRatio(text)
    floor(score * 1e6) / 1e6
  }

  /** Marker lists for the n-gram-free language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "in", "to", "and"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "es", "una"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  /** Language-ID heuristic: count marker-token hits per language; the
    * highest-scoring language wins, ties going to the earliest entry
    * of [[LangMarkers]] (first index at the max). Returns "und" when
    * no marker hits at all.
    *
    * Shape matters here: the scores build into ONE array, so each
    * marker filter appears in the plan exactly once. The old
    * when-chain fold duplicated every score subtree through the
    * nested branches (~90 expansions of the tokenizing filter — and
    * the HOF blocks codegen's subexpression elimination), which made
    * grouping on langId 15x the cost of projecting it.
    */
  def langId(text: Column): Column = {
    val t = tokens(text)
    def hits(markers: Seq[String]): Column = {
      val arr = array(markers.map(lit): _*)
      size(filter(t, x => array_contains(arr, x)))
    }
    val scores = array(LangMarkers.map { case (_, m) => hits(m) }: _*)
    val names = array(LangMarkers.map { case (lang, _) => lit(lang) }: _*)
    val mx = array_max(scores)
    // NULL text must short-circuit: under legacy sizeOfNull each score is
    // -1, so mx = -1 and the mx===0 branch would be skipped, leaving
    // element_at to pick "en" (first index of -1) — while the oracle's
    // all-NULL comparisons fall through its CASE. Both engines emit "und"
    // on degenerate input.
    when(text.isNull || mx <= 0, lit("und"))
      .otherwise(element_at(names, array_position(scores, mx).cast("int")))
  }

  /** Gopher-style document quality rules (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", Appendix A filter heuristics):
    * word-count band, mean-word-length band, symbol-to-word ratio
    * cap, alphabetic-word floor, and a required-stopword floor.
    * Returns a struct of the per-document metrics plus the combined
    * `pass` flag, so callers can gate (`filter($"g.pass")`) or audit
    * the rule that fired. Pure Column composition — map-only,
    * whole-stage codegen; ratios are floor-truncated to 6 decimals
    * (engine-exact, like [[qualityScore]]) and the flags compare the
    * truncated values.
    */
  def gopherStats(
      text: Column,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanLen: Double = 3.0,
      maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minAlphaRatio: Double = 0.8,
      minStopHits: Int = 2): Column = {
    val t = tokens(text)
    val wc = size(t)
    def ratio6(c: Column): Column = floor(c * 1e6) / 1e6
    val meanLen = ratio6(sumTokenLen(text).cast("double") / wc)
    // symbol word = no alphanumeric at all (the #/ellipsis class)
    val symbolRatio = ratio6(
      size(filter(t, x => !x.rlike("[a-z0-9]"))).cast("double") / wc)
    val alphaRatio = ratio6(
      size(filter(t, x => x.rlike("[a-z]"))).cast("double") / wc)
    val stopArr = array(EnStop.map(lit): _*)
    val stopHits = size(filter(t, x => array_contains(stopArr, x)))
    val pass = wc >= minWords && wc <= maxWords &&
      meanLen >= minMeanLen && meanLen <= maxMeanLen &&
      symbolRatio <= maxSymbolRatio &&
      alphaRatio >= minAlphaRatio &&
      stopHits >= minStopHits
    struct(
      wc.cast("long").as("word_count"),
      meanLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      alphaRatio.as("alpha_ratio"),
      stopHits.cast("long").as("stop_hits"),
      pass.as("pass"))
  }

  /** Exact content fingerprint. */
  def fingerprintMd5(text: Column): Column = md5(text)

  /** Winnowing-style fingerprint: the minimum md5 over all word
    * `n`-gram windows — robust to local edits outside the minimizing
    * window, equal for documents sharing their minimizing shingle.
    * (Rolling-hash document fingerprinting, one hash per doc.)
    */
  def winnowFingerprint(text: Column, n: Int = 3): Column =
    array_min(transform(shingles(text, n), s => md5(s)))

  /** Query parameters a canonical URL drops: per-click tracking noise
    * that makes one page look like thousands of distinct documents.
    */
  val TrackingParamRe = "^(utm_[a-z]+|gclid|fbclid|ref|mc_cid|mc_eid)="

  /** Canonical form of a messy URL, pure built-in composition (stays
    * in codegen, so a web corpus can key joins/caps on it):
    *  1. the #fragment goes;
    *  2. tracking params ([[TrackingParamRe]]) go, the query rebuilds
    *     from the surviving params in order;
    *  3. scheme://host[:port] lowercases, a `www.` prefix and the
    *     default :80/:443 ports go — the PATH keeps its case;
    *  4. one trailing slash goes.
    * Scheme-less strings pass through steps 1/2/4 unchanged in the
    * host step (the prefix regex extracts nothing).
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val base = substring_index(noFrag, "?", 1)
    val qs = noFrag.substr(length(base) + lit(2), length(noFrag))
    val kept = filter(split(qs, "&"), p => !p.rlike(TrackingParamRe))
    val rebuilt = when(!noFrag.contains("?"), noFrag)
      .otherwise(when(size(kept) > 0,
        concat(base, lit("?"), array_join(kept, "&"))).otherwise(base))
    val prefix = regexp_extract(rebuilt, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val rest = rebuilt.substr(length(prefix) + lit(1), length(rebuilt))
    val canonPrefix =
      regexp_replace(
        regexp_replace(
          regexp_replace(lower(prefix), "^(https?://)www\\.", "$1"),
          "^(http://[^/:]+):80$", "$1"),
        "^(https://[^/:]+):443$", "$1")
    regexp_replace(concat(canonPrefix, rest), "/$", "")
  }

  /** Registrable host of a URL (lowercased, `www.` stripped) — the
    * per-site cap/group key. Works on raw or canonicalized URLs and on
    * scheme-less host/path strings; empty when no host-like prefix.
    */
  def urlHost(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url,
        "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/?#@]+@)?([^/?#:]+)", 1)),
      "^www\\.", "")

  /** HTML → visible text (the crawl-to-corpus extraction stage, a
    * trafilatura-shaped boilerplate strip as a map-only codegen'd
    * regexp chain — no parser state, so it composes into whole-stage
    * codegen like every other scan-side gate here):
    *  1. `<script>`/`<style>` blocks go whole (dotall non-greedy),
    *  2. comments go,
    *  3. every remaining tag becomes a space,
    *  4. the five core entities + `&nbsp;` decode,
    *  5. whitespace collapses to single spaces, trimmed.
    * Patterns stay in the Java∩RE2 regex subset (same rule as
    * [[graft.text.Pii]]) — the explicit `[ \t\n\r]` class, not `\s`
    * (Java's `\s` includes VT, RE2's does not) — so the DuckDB oracle
    * replays the chain verbatim.
    */
  def extractHtmlText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded =
      replace(replace(replace(replace(replace(replace(noTags,
        lit("&nbsp;"), lit(" ")),
        lit("&amp;"), lit("&")),
        lit("&lt;"), lit("<")),
        lit("&gt;"), lit(">")),
        lit("&quot;"), lit("\"")),
        lit("&#39;"), lit("'"))
    trim(regexp_replace(decoded, "[ \t\n\r]+", " "))
  }
}
