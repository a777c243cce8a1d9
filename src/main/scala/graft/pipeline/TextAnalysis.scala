package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: token counting,
  * quality scoring, language ID, fingerprinting. All pure built-in
  * (codegen'd) column expressions — one narrow scan pass, no shuffles, no
  * UDFs — so a 100 TB corpus is a single map stage.
  *
  * Every metric has an exact ANSI-SQL twin (see SparkEntry.oracleSql): the
  * definitions below are deliberately expressible in both dialects.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text; empty text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Punctuation characters (fixed set, both dialects). */
  val PunctClass = "[.,;:!?]"
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, PunctClass, ""))

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(Stopwords.map(lit(_)): _*)))

  /** Quality heuristics: mean word length, stopword ratio, punct density.
    * Ratios guarded against empty docs; rounded to 6 places so the DuckDB
    * twin hashes identically. */
  def withQuality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    docs
      .withColumn("n_tokens", nTok)
      .withColumn("n_chars_m", length(t))
      .withColumn("mean_word_len", round(
        when(nTok === 0, 0.0)
          .otherwise(length(regexp_replace(trim(t), "\\s+", "")).cast("double") / nTok), 6))
      .withColumn("stopword_ratio", round(
        when(nTok === 0, 0.0)
          .otherwise(stopwordCount(t).cast("double") / nTok), 6))
      .withColumn("punct_ratio", round(
        when(length(t) === 0, 0.0)
          .otherwise(punctCount(t).cast("double") / length(t)), 6))
  }

  /** Marker-stopword language ID. Deterministic CASE-chain argmax
    * (ties resolve in chain order), identically expressible in SQL. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "y"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "et", "les", "dans"))

  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers.map(lit(_)): _*)))

  def langGuess(text: Column): Column = {
    val s = LangMarkers.map { case (l, m) => l -> langScore(text, m) }.toMap
    when(s("en") >= s("es") && s("en") >= s("de") && s("en") >= s("fr"), "en")
      .when(s("es") >= s("de") && s("es") >= s("fr"), "es")
      .when(s("de") >= s("fr"), "de")
      .otherwise("fr")
  }

  /** BPE-ish subword token estimate: counts GPT-2-style pretokenizer
    * matches (contractions, space-prefixed word/number runs, punctuation
    * runs). A deterministic proxy for LLM token budgeting at corpus scale;
    * the same pattern evaluates identically in DuckDB's regexp engine. */
  val BpeTokenRe = "'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"
  def bpeTokenCount(text: Column): Column =
    coalesce(regexp_count(text, lit(BpeTokenRe)), lit(0)).cast("bigint")

  /** Content fingerprint: 64-bit prefix of md5 (hex) — exact-dup grouping
    * key that any engine reproduces. (A rolling Karp-Rabin variant powers
    * shingling in [[Dedup]]; md5 is the cross-engine canonical form.) */
  def fingerprint(text: Column): Column = substring(md5(text), 1, 16)

  // ----------------------------------------------------------- chunking

  /** Split each document into overlapping token-window chunks — the
    * context-window preparation step of a training pipeline. Chunk `i`
    * covers tokens `[i·stride, i·stride + size)`; the last window starts
    * at the first stride multiple reaching the tail, so every token is in
    * ≥ 1 chunk and interior tokens appear in `size/stride` of them.
    * Empty documents yield no chunks.
    *
    * One Generate per document (chunk ids from `sequence`), then a slice
    * per chunk — map-only, no shuffle; output order is (doc, chunk). The
    * token array is a staged column BELOW the Generate, so the split runs
    * once per document and each chunk row only slices the shared array
    * (PipelineOpsSpec pins the plan: exactly one split in the tree —
    * guarding the Generate-re-evaluation trap). */
  def chunkByTokens(docs: DataFrame, chunkSize: Int = 32, stride: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got size=$chunkSize stride=$stride")
    val nChunks = (ceil(greatest(size(col("__toks")) - chunkSize, lit(0))
      .cast("double") / stride)).cast("int") + 1
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkSize))
          .as("__c"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("__c")).cast("long").as("n_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  // ------------------------------------- repetition signals (Gopher-style)

  /** Repetition quality signals in the style of the Gopher data-quality
    * filters (Rae et al. 2021, appendix A1.1): heavily repetitive
    * documents (boilerplate, SEO spam, generation loops) are flagged by
    * the fraction of the text made of repeated words/n-grams. All four
    * signals come from ONE native counting pass over the token array
    * ([[DedupRuntime.repetitionStats]], O(tokens) hash counting) — no
    * explode, no shuffle, so a 100 TB corpus is a single scan stage. The
    * kernel is staged as its own projection so CollapseProject can't
    * inline (and so re-evaluate) it once per derived column; only cheap
    * struct-field arithmetic sits above it. */
  def withRepetition(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val staged = docs.withColumn("__rep",
      DedupExprs.repetitionStats(col(textCol)))
    val n = col("__rep.n_tokens")
    def ratio(num: Column, den: Column): Column =
      round(when(den === 0, lit(0.0))
        .otherwise(num.cast("double") / den), 6)
    staged
      .withColumn("n_tokens", n)
      .withColumn("top_word_ratio", ratio(col("__rep.top_count"), n))
      .withColumn("dup_2gram_ratio",
        ratio(col("__rep.n_2grams") - col("__rep.d_2grams"), col("__rep.n_2grams")))
      .withColumn("dup_3gram_ratio",
        ratio(col("__rep.n_3grams") - col("__rep.d_3grams"), col("__rep.n_3grams")))
      .withColumn("frac_distinct_words", ratio(col("__rep.n_distinct"), n))
      .drop("__rep")
  }

  /** Gopher-style corpus admission filter (Rae et al. 2021, A1.1):
    * composes the quality + repetition signals into a keep/drop decision
    * with machine-readable reasons — the apply step a training pipeline
    * actually runs over the corpus. `reasons` is the comma-joined list of
    * failed rules in a fixed order (empty → keep). All comparisons run on
    * the ROUNDED signal columns, so the decision is bit-identical in any
    * engine that reproduces those signals (they are oracle-pinned).
    * Map-only on top of two map-only passes — zero shuffle. */
  def qualityFilter(docs: DataFrame, textCol: String = "text",
      minTokens: Long = 50, maxTokens: Long = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minStopwords: Long = 2, maxTopWordRatio: Double = 0.2,
      maxDup2: Double = 0.2, maxDup3: Double = 0.18): DataFrame = {
    val signals = withRepetition(withQuality(docs, textCol), textCol)
    val rules: Seq[(String, Column)] = Seq(
      "n_tokens" ->
        (col("n_tokens") < minTokens || col("n_tokens") > maxTokens),
      "mean_word_len" ->
        (col("mean_word_len") < minMeanWordLen ||
          col("mean_word_len") > maxMeanWordLen),
      "stopwords" -> (stopwordCount(col(textCol)) < minStopwords),
      "top_word_ratio" -> (col("top_word_ratio") > maxTopWordRatio),
      "dup_2gram" -> (col("dup_2gram_ratio") > maxDup2),
      "dup_3gram" -> (col("dup_3gram_ratio") > maxDup3))
    // concat_ws skips nulls in both dialects → stable reason order
    val reasons = concat_ws(",",
      rules.map { case (name, failed) =>
        when(failed, lit(name)).otherwise(lit(null).cast("string"))
      }: _*)
    signals
      .withColumn("reasons", reasons)
      .withColumn("keep", col("reasons") === "")
  }

  // ------------------------------------------------------- PII scrubbing

  /** Redaction patterns shared by both dialects: Java regex (Spark
    * codegen) and RE2 (DuckDB oracle) agree on this subset — character
    * classes, bounded repetition, word boundaries, non-capturing groups,
    * no backreferences, no lookaround. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Octet-checked IPv4 (rejects components > 255, so `999.300.1.2` is
    * NOT redacted; leading-zero forms like `010` are accepted, matching
    * inet_aton). */
  private val Oct = "(?:25[0-5]|2[0-4][0-9]|1?[0-9]{1,2})"
  val Ipv4Re = s"\\b$Oct(?:\\.$Oct){3}\\b"
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"
  /** NANP-ish phone shapes: optional +1/+NN country code, then either a
    * parenthesized or bare 3-digit area code, with `-`, `.`, or space
    * group separators — covers 555-010-1234, 555.010.1234,
    * (555) 010-1234, +1 555 010 1234. */
  val PhoneRe = "(?:\\+[0-9]{1,2}[-. ])?" +
    "(?:\\([0-9]{3}\\) ?|\\b[0-9]{3}[-. ])[0-9]{3}[-. ][0-9]{4}\\b"

  /** (category, pattern, placeholder) in scrub order. Email runs first so
    * its digit runs can't be claimed by the looser patterns; SSN before
    * phone so `123-45-6789` isn't half-eaten by a phone prefix. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", EmailRe, "[EMAIL]"),
    ("ip", Ipv4Re, "[IP]"),
    ("ssn", SsnRe, "[SSN]"),
    ("phone", PhoneRe, "[PHONE]"))

  /** Placeholder occurrences in `c`: literal (non-regex) erase + length
    * delta, identical in both dialects. */
  private def tagCount(c: Column, tag: String): Column =
    ((length(c) - length(replace(c, lit(tag), lit("")))) / tag.length)
      .cast("long")

  /** PII scrubbing for training corpora: progressively replace emails /
    * IPv4 addresses / SSNs / phone numbers with typed placeholder tags.
    * Each category is counted as the number of placeholders ITS OWN pass
    * introduced (placeholder-count delta between consecutive stages), so
    * `n_<cat>` equals redactions actually performed — an IP or digit run
    * consumed by an earlier pass is not double-counted — and each regex
    * runs exactly once per row. Stages are staged projections (not one
    * nested expression) so no scrub pass is re-evaluated per derived
    * count column. Pure regexp_replace chain — codegen'd, map-only, zero
    * shuffle at any scale.
    */
  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    var df = docs.withColumn("__pii_0", col(textCol))
    PiiPatterns.zipWithIndex.foreach { case ((_, re, tag), i) =>
      df = df.withColumn(s"__pii_${i + 1}",
        regexp_replace(col(s"__pii_$i"), re, tag))
    }
    PiiPatterns.zipWithIndex.foreach { case ((cat, _, tag), i) =>
      df = df.withColumn(s"n_${cat}s",
        tagCount(col(s"__pii_${i + 1}"), tag) - tagCount(col(s"__pii_$i"), tag))
    }
    df.withColumn("scrubbed", col(s"__pii_${PiiPatterns.length}"))
      .drop((0 to PiiPatterns.length).map(i => s"__pii_$i"): _*)
  }

  // ------------------------------------------------- HTML text extraction

  /** HTML → text, the first transform of a crawl pipeline: drop
    * script/style/comment blocks, strip tags, decode the five basic
    * entities, collapse whitespace. A pure regexp_replace chain in the
    * Java/RE2 shared dialect ((?s)-dotall + non-greedy, no lookaround) —
    * codegen'd, map-only, zero shuffle; a real deployment would swap in a
    * full parser via mapPartitions only if entity/encoding coverage
    * demands it. */
  def htmlToText(html: Column): Column = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(html,
      "(?s)<script[^>]*>.*?</script>", " "),
      "(?s)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&") // &amp; last so it can't re-trigger
      .foldLeft(noTags) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** URL host (lower-cased authority up to the first `/?#`) — the key
    * for domain-cap sampling (C4/RefinedWeb-style per-host page caps via
    * [[Sampling.stratifiedExactK]]). Shared-dialect regexp_extract, so
    * oracles reproduce it; ports/userinfo are kept verbatim (these are
    * cap keys, not canonical hosts). Non-URLs → empty string. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))

  /** Canonical URL form for crawl dedup: lowercase scheme + host, strip a
    * leading `www.`, strip the scheme's default port (:80 http / :443
    * https), drop the fragment, drop `utm_*` tracking params, and tidy
    * dangling `?`/`&`. Pure regexp composition in the shared
    * Spark/DuckDB-compatible dialect (no lookbehind), codegen'd map-only
    * — the normalization step ahead of exact URL dedup, where raw-string
    * grouping would miss ~every duplicate fetched via tracking links.
    */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host0 = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1))
    val host1 = regexp_replace(host0, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host1, ":80$", ""))
      .when(scheme === "https", regexp_replace(host1, ":443$", ""))
      .otherwise(host1)
    // path + query, fragment dropped
    val rest0 = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1)
    val rest1 = regexp_replace(rest0, "(?i)utm_[A-Za-z0-9_]*(=[^&#]*)?&?", "")
    val rest = regexp_replace(regexp_replace(rest1, "[?&]$", ""), "\\?&", "?")
    when(scheme === "" || host0 === "", lower(url)) // not a hierarchical URL
      .otherwise(concat(scheme, lit("://"), host, rest))
  }

  /** Exact URL dedup over the normalized form: `url_norm` plus a `keep`
    * flag on each group's lowest id. One 8-byte-ish key shuffle (the
    * normalized string), min-id via window — the id never leaves its
    * group's partition.
    */
  def urlDedup(df: DataFrame, urlCol: Column, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url_norm")).orderBy(col(idCol).asc)
    df.withColumn("url_norm", normalizeUrl(urlCol))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col(idCol), col("url_norm"), col("keep"))
  }

  // ----------------------------------------------------- inverted index

  /** Retrieval-index build: one row per distinct term with its document
    * frequency and an order-preserving digest of the posting list
    * (ascending doc ids). The digest stands in for the list itself so the
    * output stays one small row per term — the materialized index would
    * be written per-term-bucket in a real deployment.
    *
    * Scale shape: explode → groupBy(term, doc) (map-side combined — the
    * shuffle carries one row per distinct (term, doc), not per token) →
    * groupBy(term) with a sorted-collect of ids. Stopword-like terms make
    * hot keys: posting lists beyond `maxPostings` are truncated to the
    * FIRST `maxPostings` doc ids (deterministic — lowest ids), with
    * `truncated` flagged, so one mega-term can't blow an executor. */
  def invertedIndex(docs: DataFrame, maxPostings: Int = 100000,
      idCol: String = "doc_id", textCol: String = "text",
      capName: String = "inverted_index"): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), explode(terms(col(textCol))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        slice(array_sort(collect_list(col("doc_id"))), 1, maxPostings)
          .as("__postings"))
      // the truncation is observable like the dedup hot-bucket caps
      // (read via [[Dedup.capDiagnostics]]): here dropped_buckets =
      // truncated TERMS, dropped_ids = postings cut from them (the rows
      // themselves stay, flagged `truncated`), max_bucket_size = max df
      .observe(s"${Dedup.CapObservationPrefix}$capName",
        coalesce(sum(when(col("df") > maxPostings, 1L).otherwise(0L)),
          lit(0L)).as("dropped_buckets"),
        coalesce(sum(when(col("df") > maxPostings,
          col("df") - maxPostings).otherwise(0L)), lit(0L)).as("dropped_ids"),
        coalesce(max(col("df")), lit(0L)).as("max_bucket_size"))
      .select(col("term"), col("df"), col("total_tf"),
        (col("df") > maxPostings).as("truncated"),
        md5(array_join(transform(col("__postings"), _.cast("string")), ","))
          .as("postings_md5"))

  /** Out-of-vocabulary rate against the corpus' own top-K vocabulary —
    * the Dolma/C4-family "fraction of tokens not in the common
    * vocabulary" quality signal (high OOV ⇒ garbled text, code, or
    * wrong-language content). Vocabulary = the `topK` most frequent
    * [[terms]] corpus-wide, tie-broken (count DESC, term ASC) so the
    * boundary is deterministic. Docs with no terms produce no row.
    *
    * Scale shape: term counts are a map-side-combined shuffle with one
    * row per distinct term; the top-K cut sorts THAT (distinct terms,
    * not tokens) and the K-row vocabulary broadcasts back — the
    * per-doc score is then map-side. */
  def oovRate(docs: DataFrame, topK: Int = 1000,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(terms(col(textCol))).as("t"))
    val vocab = broadcast(toks.groupBy("t").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("t")).limit(topK)
      .select("t").withColumn("__in", lit(1)))
    toks.join(vocab, Seq("t"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("oov"))
      .select(col("id").as(idCol), col("tokens"), col("oov"),
        round(col("oov").cast("double") / col("tokens"), 6).as("oov_rate"))
  }

  // ------------------------------------------------------------- tf-idf

  /** Alphanumeric terms, lowercased. Split FIRST, lowercase per token:
    * tokens are then pure `[a-z0-9]+`, so lowercasing is ASCII-only and
    * dialect-independent (whole-string lower() differs across engines on
    * locale-sensitive codepoints). */
  def terms(text: Column): Column =
    transform(filter(split(text, "[^a-zA-Z0-9]+"), t => t =!= ""), lower(_))

  /** Top-k TF-IDF terms per document: (doc_id, term, tf, df, rank).
    *
    * Shuffle budget (the whole point at 100 TB): (1) groupBy (doc, term)
    * for tf — map-side combined, so the shuffle carries one row per
    * distinct (doc, term), not per token; (2) groupBy term over that tf
    * table for df — no second tokenization pass; (3) the tf⋈df join on
    * term (AQE picks broadcast when the realized vocabulary is small);
    * (4) a per-doc top-k window. Document text is read once and never
    * shuffled.
    *
    * The smooth-idf score tf·ln((N+1)/(df+1)) is used ONLY as the ranking
    * key and deliberately not emitted: ln differs by 1 ulp between
    * java.lang.StrictMath (Spark codegen), the Math.log intrinsic, and
    * libm (DuckDB) on ~0.1% of inputs (measured over this domain), so the
    * double is not an engine-portable value. The RANK is: equal (tf, df)
    * — and df = N, where the score is exactly 0.0 — tie exactly in every
    * engine and break on `term` ascending; mathematically distinct scores
    * are separated by ≥ ln((df+2)/(df+1))-scale gaps (~1e-4), nine orders
    * above the 1e-13 ulp error, so no engine can flip them. */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(terms(col(textCol))).as("term"))
    // tf feeds BOTH the score join and the df aggregation; without staging
    // it the corpus is scanned and tokenized twice (column pruning gives
    // the two consumers different exchanges, so ReusedExchange can't fire).
    // Persisting the compact (doc, term, tf) table costs far less than a
    // second pass over the raw text. df-via-window-over-term would avoid
    // the join but materializes one partition per term — a skew bomb on
    // stopwords — so it stays groupBy (map-side combined) + join.
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .transform(Staging.stage)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("score", col("tf").cast("double") *
        log((col("n") + lit(1)).cast("double") /
          (col("df") + lit(1)).cast("double")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rank"))
  }

  // --------------------------------- corpus-quantile length trimming

  /** Gopher-style length trim with CORPUS-DERIVED bounds: drop documents
    * whose whitespace token count falls outside the [pLow, pHigh]
    * quantile band of the corpus itself — outliers by construction, not
    * by a hand-tuned absolute threshold that rots as the corpus mix
    * shifts. Returns the surviving (idCol, tokens) rows.
    *
    * Scale shape: the bounds come from Spark's EXACT `percentile`
    * aggregate, which shuffles one counts-map entry per DISTINCT token
    * count (bounded small-int cardinality — thousands of entries at any
    * corpus size), not per row; the trim itself is a map-only filter on
    * the recomputed count. Linear-interpolation quantiles match DuckDB's
    * `quantile_cont` bit-for-bit on integer inputs, so the bounds are
    * oracle-exact without rounding. */
  def lengthTrim(docs: DataFrame, pLow: Double = 0.05, pHigh: Double = 0.95,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow <= pHigh, "bad quantile band")
    val d = docs.select(col(idCol),
      tokenCount(col(textCol)).cast("long").as("tokens"))
    val bounds = d.agg(
      expr(s"percentile(tokens, $pLow)").as("lo"),
      expr(s"percentile(tokens, $pHigh)").as("hi")).head
    d.filter(col("tokens") >= bounds.getDouble(0) &&
      col("tokens") <= bounds.getDouble(1))
  }

  // ------------------------------- LM perplexity (CCNet-style quality)

  /** Corpus-self-trained bigram language-model perplexity — the CCNet
    * quality signal (Wenzek et al. 2019) with the corpus itself standing
    * in for the external LM: typical text scores low, boilerplate scores
    * lower, token salad scores high. Add-one smoothing over the bigram
    * vocabulary: P(w2|w1) = (c(w1,w2)+1) / (c(w1,·)+V), where c(w1,·)
    * counts w1 as a bigram PREFIX and V is the number of distinct tokens
    * participating in at least one bigram (derived from the compact
    * bigram-count table, so single-token documents contribute no
    * vocabulary mass — documented, oracle-mirrored). Output per doc:
    * n_bigrams, avg negative log-likelihood (round 4), perplexity
    * (round 2); docs with fewer than two tokens get NULL scores.
    *
    * Scale shape: the bigram-count table `cb` (one row per DISTINCT
    * bigram, map-side combined) is the only thing persisted — the
    * prefix counts, the vocab scalar, and the scoring join all derive
    * from it, and the raw text is scanned exactly twice (column-pruned)
    * rather than materializing a corpus-sized token cache (same
    * trade as [[tfidfTopTerms]]). The scoring joins are keyed by
    * (w1,w2) then w1 — both sides hash-partitioned by the join key, no
    * broadcast of the (potentially huge at 100 TB) bigram table needed;
    * AQE will still broadcast it when the realized vocabulary is small.
    *
    * Float determinism: each -ln term carries ≤1-ulp engine skew and the
    * per-doc sum is order-sensitive, but both effects are ~1e-13
    * relative against a 1e-4/1e-2 rounding grid — unlike the ranking
    * ties that forced [[tfidfTopTerms]] to drop its score column, a
    * rounded continuous output is stable. */
  def lmPerplexity(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val d = docs.select(col(idCol).as("id"), terms(col(textCol)).as("toks"))
    val bi = d.select(col("id"), explode(
        when(size(col("toks")) >= 2,
          transform(sequence(lit(0), size(col("toks")) - 2), i =>
            struct(element_at(col("toks"), i + 1).as("w1"),
              element_at(col("toks"), i + 2).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
        .as("g"))
      .select(col("id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
    val cb = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .transform(Staging.stage)
    val cp = cb.groupBy("w1").agg(sum("cnt").as("pn"))
    val v = cb.select(col("w1").as("w")).union(cb.select(col("w2")))
      .agg(countDistinct("w")).head.getLong(0)
    val scored = bi.join(cb, Seq("w1", "w2")).join(cp, Seq("w1"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(-log((col("cnt") + 1).cast("double") / (col("pn") + v)))
          .as("nll"))
    d.select(col("id")).join(scored, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(col("nll") / col("n_bigrams"), 4).as("avg_nll"),
        round(exp(col("nll") / col("n_bigrams")), 2).as("ppl"))
  }

  // ------------------------------------------- text normalization

  /** Unicode text cleanup — the normalization pass crawled corpora get
    * before any hashing or tokenization (otherwise a NBSP makes two
    * byte-identical sentences distinct forever downstream): strip
    * non-whitespace control characters, map Unicode space variants
    * (NBSP, en/em/thin spaces, ideographic space, zero-width space) to
    * ASCII space, collapse whitespace runs, trim. Pure codegen'd
    * regexp chain, map-only; `\x{…}` escapes keep the pattern portable
    * across Java regex and RE2-style engines.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(c,
      "[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}\\x{7F}]", ""),
      "[\\x{00A0}\\x{2000}-\\x{200B}\\x{202F}\\x{3000}]", " "),
      "\\s+", " "))

  /** Per-source percentile normalization of a quality signal: replace
    * the raw score with its percent rank WITHIN the source (`tieBreak`
    * totalizes the order, so equal scores get adjacent distinct ranks,
    * deterministically), making scores from heterogeneous sources
    * comparable before mixing —
    * a source whose scorer runs hot no longer dominates a global
    * threshold. percent_rank is the exact rational (rank−1)/(n−1):
    * engine-portable with no float tolerance. One shuffle on the source
    * key.
    */
  def percentileNormalize(df: DataFrame, sourceCol: String,
      scoreCol: String, tieBreak: String,
      naiveMaxRows: Long = TwoPhase.NaiveMaxRows): DataFrame = {
    // TWO-PHASE rank (a plain per-source percent_rank window would sort
    // a whole source — the whole corpus, for a handful of sources —
    // through one task): range-exchange on (source, score, tie) so that
    // within a source, partition order respects key order; rank = the
    // partition's exclusive row offset (from a per-(source, partition)
    // count table, ≤ sources × partitions rows) + the local row number.
    // percent_rank semantics are reproduced exactly: tied full keys
    // share their MIN position (a narrow window over duplicate keys
    // only), and the quotient is (rank−1)/(n−1) with n from the same
    // tiny count table, 0.0 for a single-row source.
    TwoPhase.requireHelperColumnsFree(df,
      "__pid", "__k", "__c", "__off", "__n", "__pos", "__rank")
    // ADAPTIVE: when every source fits one task (plan-time probe;
    // naiveMaxRows <= 0 forces the two-phase form), the built-in
    // percent_rank over a per-source window IS the exact semantics the
    // lowering reproduces — same rational, same tie rule, same rounding
    if (!TwoPhase.useChunked(df, Seq(col(sourceCol)), naiveMaxRows)) {
      val w = Window.partitionBy(col(sourceCol))
        .orderBy(col(scoreCol), col(tieBreak))
      return df.withColumn("norm_score", round(percent_rank().over(w), 6))
    }
    // the shared scaffold keys on a STRUCT-wrapped source: a window
    // treats NULL as its own partition, so the lowering must too — a
    // bare-column equi-join would silently drop null-source rows
    val pos = TwoPhase.positioned(df, Seq(col(sourceCol)),
      Seq(col(scoreCol), col(tieBreak)))
    val wTies = Window.partitionBy(struct(col(sourceCol)), col(scoreCol),
      col(tieBreak))
    pos
      .withColumn("__rank", min(col("__pos")).over(wTies))
      .withColumn("norm_score", round(
        when(col("__n") === 1, lit(0.0)).otherwise(
          (col("__rank") - 1).cast("double") /
            (col("__n") - 1).cast("double")), 6))
      .select(df.columns.map(col) :+ col("norm_score"): _*)
  }

  /** Pairwise vocabulary overlap between sources: Jaccard of the
    * DISTINCT-term sets of every source pair (a < b) — the corpus-level
    * redundancy matrix that tells a mixing strategy which sources are
    * near-copies of each other before any document-level dedup runs.
    *
    * Scale shape: one distinct (term, source) table (map-side combined —
    * one row per distinct pair, not per token), a self-join ON TERM for
    * the intersection counts, and per-source distinct counts for the
    * union denominators. Shuffles carry vocabulary-sized tables only;
    * text is tokenized once. Quadratic only in the SOURCE count (tiny),
    * never in documents. */
  def sourceOverlap(docs: DataFrame, textCol: String = "text",
      sourceCol: String = "source"): DataFrame = {
    val ts = docs
      .select(col(sourceCol).as("src"), explode(terms(col(textCol))).as("term"))
      .distinct()
      .transform(Staging.stage)
    val sizes = ts.groupBy("src").agg(count(lit(1)).as("n_terms"))
    val inter = ts.as("a")
      .join(ts.as("b"), col("a.term") === col("b.term") &&
        col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("src", "src_a")
        .withColumnRenamed("n_terms", "n_a"), "src_a")
      .join(sizes.withColumnRenamed("src", "src_b")
        .withColumnRenamed("n_terms", "n_b"), "src_b")
      .select(col("src_a"), col("src_b"), col("n_common"), col("n_a"),
        col("n_b"),
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")), 6).as("jaccard"))
  }

  // --------------------------------------- PMI collocation extraction

  /** Top-`k` PMI-ranked adjacent-token collocations over the corpus:
    * (w1, w2, c_ab, c_a, c_b, pmi, rank). PMI = ln(N·c_ab / (c_a·c_b))
    * with N = total bigram occurrences, c_a/c_b the left/right bigram
    * marginals — so every statistic derives from the ONE compact
    * (w1, w2, count) pair table; text is tokenized once and never
    * shuffled (the pair table shuffles on 2-term keys, map-side
    * combined). Pairs below `minCount` are noise and dropped before
    * ranking; the global top-k plans as TakeOrderedAndProject — no full
    * sort shuffle.
    *
    * Float determinism: the RANKING key is c_ab·N/(c_a·c_b) computed as
    * exact-integer products (< 2^53 at bench SFs) then one
    * correctly-rounded IEEE division — bit-identical across engines, so
    * ranks never flip the way a ln-based key could. `pmi` itself is
    * emitted rounded to 6 dp (ln's ≤1-ulp skew is ~1e-13 against that
    * grid; same argument as [[lmPerplexity]]). */
  def pmiBigrams(docs: DataFrame, minCount: Long = 5, k: Int = 20,
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(terms(col(textCol)).as("toks"))
    val bi = toks.select(explode(
        when(size(col("toks")) >= 2,
          transform(sequence(lit(0), size(col("toks")) - 2), i =>
            struct(element_at(col("toks"), i + 1).as("w1"),
              element_at(col("toks"), i + 2).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
        .as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
    val cab = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      .transform(Staging.stage)
    val ca = cab.groupBy("w1").agg(sum("c_ab").as("c_a"))
    val cb = cab.groupBy("w2").agg(sum("c_ab").as("c_b"))
    val n = cab.agg(sum("c_ab").as("n"))
    val ratio = col("c_ab").cast("double") * col("n").cast("double") /
      (col("c_a").cast("double") * col("c_b").cast("double"))
    cab.filter(col("c_ab") >= minCount)
      .join(ca, "w1").join(cb, "w2").crossJoin(broadcast(n))
      .withColumn("ratio", ratio)
      .orderBy(col("ratio").desc, col("w1"), col("w2"))
      .limit(k)
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        round(log(col("ratio")), 6).as("pmi"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pmi").desc, col("w1"), col("w2"))).cast("long"))
  }

  // ------------------------------------------------- BM25 retrieval

  /** Okapi BM25 top-`k` documents for a bag-of-terms query:
    * (doc_id, matched, score, rank). idf(t) = ln(1 + (N−df+½)/(df+½));
    * per-term contribution idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)).
    *
    * Scale shape: tokens are filtered to the query's terms BEFORE any
    * aggregation, so the per-doc tf table carries ≤|query| rows per doc;
    * df and avgdl are scalar/near-scalar aggregates broadcast back.
    * Corpus text is read once, never shuffled; the only wide exchange
    * keys on doc_id with map-side combine. Top-k is
    * TakeOrderedAndProject.
    *
    * Float determinism: rank is computed over the 6-dp-ROUNDED score
    * (ties broken on doc_id), so the ≤1-ulp ln/division skew between
    * engines (~1e-13 relative) cannot flip an ordering the way a
    * raw-double rank could — rounding collisions tie and the doc_id
    * break resolves them identically everywhere. */
  def bm25TopDocs(docs: DataFrame, queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), terms(col(textCol)).as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).cast("long").as("dl"))
      .transform(Staging.stage)
    val tf = d.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = d.agg(count(lit(1)).as("n"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val contrib = idf * col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    tf.join(broadcast(dfreq), "term").crossJoin(broadcast(stats))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("matched"), round(sum(contrib), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
  }
}
