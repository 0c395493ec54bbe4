package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{tokens => tok}

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token/char statistics, quality scoring, n-gram
  * language ID, and document fingerprinting.
  *
  * All pure column expressions — whole-stage-codegen'd, no UDFs, no
  * shuffles (per-row work scales embarrassingly at 100 TB).
  */
object TextAnalysis {

  /** Per-document surface statistics + a simple quality score
    * (length/stopword-ratio heuristics, the shape of reference-style quality
    * gates).
    */
  def textStats(docs: DataFrame, text: Column): DataFrame = {
    // Materialize tokens as an attribute: interpreted HOFs re-evaluate
    // non-attribute subtrees per lambda element (O(tokens²) otherwise).
    val ts = col("__toks")
    docs.withColumn("__toks", tok(text))
      .withColumn("n_tokens", size(ts).cast("long"))
      .withColumn("n_uniq_tokens", size(array_distinct(ts)).cast("long"))
      .withColumn("n_chars_measured", length(text).cast("long"))
      .withColumn("sum_token_len",
        aggregate(transform(ts, t => length(t)), lit(0L),
          (a, b) => a + b.cast("long")))
      .withColumn("uniq_ratio",
        round(size(array_distinct(ts)).cast("double") / size(ts), 6))
      .withColumn("quality_score",
        round(least(lit(1.0), size(ts).cast("double") / lit(100.0)) *
          (size(array_distinct(ts)).cast("double") / size(ts)), 6))
      .drop("__toks")
  }

  /** Per-document top-k terms by tf·idf with a LINEAR inverse document
    * frequency weight: score = tf · N / df. The usual log damping
    * (tf·ln(N/df)) is deliberately not applied — ln's last-ULP behavior is
    * libm-specific, so a log-scored rank could flip between engines at
    * near-ties, while tf·N/df is one IEEE multiply and divide of exact
    * integers, bit-identical everywhere. The linear weight favors rarer
    * terms more aggressively than the log form; for "characteristic terms
    * per document" (keyword extraction, near-dup explanation) that bias is
    * the useful direction.
    *
    * Physical shape, all corpus-linear: tf = one combinable count on
    * (doc, token); df = one combinable distinct-doc count on token
    * (uniform high-cardinality keys); N rides a broadcast single-row
    * frame (never a driver collect in the plan); the top-k window
    * partitions on doc_id, bounded per document. Ties break on token
    * order so the rank is total.
    */
  def tfidfTopTerms(docs: DataFrame, id: Column, text: Column,
                    k: Int): DataFrame = {
    require(k >= 1, s"tfidfTopTerms: k must be positive, got $k")
    val postings = docs
      .withColumn("__toks", tok(text))
      .select(id.cast("long").as("doc_id"), explode(col("__toks")).as("token"))
    val tf = postings.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = postings.groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.select(countDistinct(id.cast("long")).as("n_docs"))
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token").asc)
    tf.join(df, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf").cast("double") * col("n_docs") / col("df"), 6))
      .withColumn("rank", row_number().over(byDoc).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"),
        col("df"), col("score"))
  }

  /** BM25 top-k retrieval (Robertson-Spärck Jones, the Okapi weighting):
    * score(q, d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)).
    * idf is the LINEAR N/df weight for the same reason as
    * [[tfidfTopTerms]]: ln's last-ULP behavior is libm-specific, while
    * N/df is one IEEE divide of exact integers — bit-identical across
    * engines. Per-term contributions are single IEEE expression trees
    * (deterministic given identical inputs); the CROSS-TERM sum runs in
    * DECIMAL(38,15) so the score is independent of aggregation order and
    * partial-agg plan (the kmeansStep discipline).
    *
    * Physical shape: the postings frame (doc, term, tf) is corpus-linear
    * and SEMI-JOINS to the broadcast query-term list before anything
    * else — work after that point is proportional to matching postings,
    * not the corpus. df joins on term (uniform key), doc length joins on
    * doc_id, corpus stats (N, Σdl) ride one broadcast row, and the top-k
    * window partitions per query. This is posting-list retrieval as a
    * declarative plan; at 100 TB the same shape serves a production
    * keyword-search batch (query list = the broadcast side, always
    * config-scale).
    *
    * `queries` carries (query_id, term), one row per query term; terms
    * repeated in one query count once (dedup inside). Returns
    * (query_id, rank, doc_id, score) with rank ≤ k, ties on doc_id asc.
    */
  def bm25TopK(docs: DataFrame, id: Column, text: Column,
               queries: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toked = docs.select(id.cast("long").as("doc_id"), tok(text).as("__toks"))
    val dl = toked.select(col("doc_id"), size(col("__toks")).cast("long").as("dl"))
    val postings = toked
      .select(col("doc_id"), explode(col("__toks")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    bm25FromIndex(postings, dl, queries, k, k1, b)
  }

  /** [[bm25TopK]]'s scoring tail over a PREBUILT index: `postings` =
    * (doc_id, term, tf), `dl` = (doc_id, dl). This is the production
    * entry point at scale — the postings/length tables are maintained
    * INCREMENTALLY (tf and dl are pure sums, so additive folds of
    * per-batch deltas compose exactly), and queries read the stored
    * index instead of re-tokenizing 100 TB per search. df and corpus
    * stats derive from the stored frames, so an incrementally-built
    * index answers bit-identically to a one-shot build over the same
    * corpus.
    */
  def bm25FromIndex(postings: DataFrame, dl: DataFrame, queries: DataFrame,
                    k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"bm25FromIndex: k must be positive, got $k")
    val df = postings.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val q = queries.select(col("query_id").cast("long"), col("term")).distinct()
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    // arithmetic shape mirrored verbatim in the oracle SQL: same literal
    // folds, same association, so every double op rounds identically
    val w = (col("tf").cast("double") * (lit(k1) + lit(1.0))) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / avgdl))
    val idfLin = col("n_docs").cast("double") / col("df")
    val byQuery = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    postings
      .join(broadcast(q), Seq("term")) // prune to query terms FIRST
      .join(df, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        (idfLin * w).cast("decimal(38,15)").as("contrib"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("contrib")).cast("double"), 6).as("score"))
      .withColumn("rank", row_number().over(byQuery).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"))
  }

  /** Mixture construction to a TOKEN budget (the data-mixing step of a
    * training run: each domain/language gets `weight·budget` tokens,
    * filled by deterministic priority): per group, documents are taken
    * in `priority` order while the running token total stays within the
    * group's budget; the crossing document is dropped. Returns one row
    * per group with its budget and what the fill actually selected.
    *
    * The running total is a distributed PREFIX SUM, not a single
    * per-group window: a group is corpus-scale (the q111 trap — a
    * 4-language corpus would funnel 25% of 100 TB through one sort
    * task), so the cumsum runs two-phase — priority-range buckets give
    * (group, bucket) partials, an exclusive prefix over the per-group
    * bucket totals (metadata-scale window) gives each bucket its
    * offset, and the intra-bucket window partitions on (group, bucket),
    * bounded by bucket width. Priorities must be near-uniform on
    * [0, 2^31) — an LCG residue of the doc id is the intended input.
    */
  def tokenBudgetMixture(docs: DataFrame, id: Column, text: Column,
                         group: Column, priority: Column,
                         weights: Map[String, Double],
                         budget: Long): DataFrame = {
    require(weights.nonEmpty, "tokenBudgetMixture: weights required")
    require(budget > 0, s"tokenBudgetMixture: positive budget, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val w = weights.toSeq.toDF("grp", "w")
    val base = docs.select(id.cast("long").as("doc_id"),
        group.cast("string").as("grp"), priority.cast("long").as("pri"),
        size(tok(text)).cast("long").as("n_tokens"))
      .join(broadcast(w), Seq("grp")) // groups without a weight drop out
      .withColumn("grp_budget",
        floor(col("w") * lit(budget.toDouble)).cast("long"))
      // 256 ORDER-PRESERVING priority ranges (pri >> 23 on [0, 2^31))
      .withColumn("bucket", (col("pri") / lit(1L << 23)).cast("long"))
    val byBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("grp"), col("bucket"))
      .agg(sum(col("n_tokens")).as("bucket_tokens"))
      .withColumn("offset",
        coalesce(sum(col("bucket_tokens")).over(byBucket), lit(0L)))
      .select(col("grp"), col("bucket"), col("offset"))
    val intra = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"), col("bucket"))
      .orderBy(col("pri"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    base.join(offsets, Seq("grp", "bucket"))
      .withColumn("cum", col("offset") + sum(col("n_tokens")).over(intra))
      .filter(col("cum") <= col("grp_budget"))
      .groupBy(col("grp"), col("grp_budget"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_kept_tokens"))
      .select(col("grp"), col("grp_budget"), col("n_docs"),
        col("n_kept_tokens"))
  }

  /** N-gram language-model quality filter (the CCNet shape, Wenzek et
    * al. 2020: score text against an LM trained on a trusted reference
    * corpus; low-scoring documents are filtered): a bigram model with
    * add-one smoothing is TRAINED on the `trainFilter` slice —
    * P(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V) — and every document scores the
    * MEAN bigram probability. CCNet uses perplexity (geometric mean);
    * the arithmetic mean is used here for the same reason as the linear
    * idf in [[tfidfTopTerms]]: no libm `ln`/`exp` in the score, so with
    * per-bigram probabilities as single IEEE expression trees and the
    * cross-bigram sum in DECIMAL(38,15), the score is bit-identical
    * across engines. Both means order documents by LM fit; thresholds
    * are calibrated to whichever is used.
    *
    * Scale shape: model counts are two combinable aggregations over the
    * train slice keyed on (w₁,w₂)/w₁ (uniform high-cardinality); scoring
    * joins each doc bigram to the counts on those keys (model size is
    * vocabulary², typically join—not broadcast—scale); V rides one
    * broadcast row; the per-doc mean partitions on doc_id. Documents
    * with fewer than 2 tokens have no bigrams and are not scored.
    *
    * Returns (doc_id, n_bigrams, lm_score, keep).
    */
  def lmScoreFilter(docs: DataFrame, id: Column, text: Column,
                    trainFilter: Column, threshold: Double): DataFrame = {
    val toked = docs.select(id.cast("long").as("doc_id"), tok(text).as("__toks"),
      trainFilter.as("__train"))
    val bigrams = toked
      .select(col("doc_id"), col("__train"),
        // sequence(0, -1) DESCENDS in Spark: a <2-token doc must produce
        // an empty bigram list, not walk off the array
        explode(when(size(col("__toks")) >= 2,
          transform(sequence(lit(0), size(col("__toks")) - 2),
            i => struct(element_at(col("__toks"), i + 1).as("w1"),
              element_at(col("__toks"), i + 2).as("w2"))))
          .otherwise(array().cast("array<struct<w1:string,w2:string>>")))
          .as("bg"))
      .select(col("doc_id"), col("__train"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val train = bigrams.filter(col("__train"))
    val c2 = train.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = train.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val v = toked.filter(col("__train"))
      .select(explode(col("__toks")).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    val p = (col("c2").cast("double") + lit(1.0)) /
      (col("c1").cast("double") + col("v").cast("double"))
    bigrams
      .join(c2, Seq("w1", "w2"), "left").na.fill(0L, Seq("c2"))
      .join(c1, Seq("w1"), "left").na.fill(0L, Seq("c1"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"), p.cast("decimal(38,15)").as("pd"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("pd")).cast("double") / count(lit(1)), 6)
          .as("lm_score"))
      .withColumn("keep", col("lm_score") >= threshold)
  }

  /** Stopword lists per language for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny and deterministic.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "los", "y", "en", "es"),
    "fr" -> Seq("le", "la", "de", "les", "et", "en", "est"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /** Language ID: count stopword hits per language, predict the argmax with
    * a fixed language preference order on ties ("en" > "es" > "fr" > "zh" >
    * unknown).
    */
  def languageId(docs: DataFrame, text: Column): DataFrame = {
    val ts = col("__toks")
    val langs = Seq("en", "es", "fr", "zh")
    val scored = langs.foldLeft(docs.withColumn("__toks", tok(text))) { (df, lang) =>
      df.withColumn(s"score_$lang",
        size(filter(ts, t => t.isInCollection(stopwords(lang)))).cast("long"))
    }
    // argmax with a fixed preference order on ties: en > es > fr > zh
    val predicted =
      when(col("score_en") >= col("score_es") && col("score_en") >= col("score_fr") &&
        col("score_en") >= col("score_zh") && col("score_en") > 0, "en")
        .when(col("score_es") >= col("score_fr") && col("score_es") >= col("score_zh") &&
          col("score_es") > 0, "es")
        .when(col("score_fr") >= col("score_zh") && col("score_fr") > 0, "fr")
        .when(col("score_zh") > 0, "zh")
        .otherwise("unknown")
    scored.withColumn("predicted_lang", predicted).drop("__toks")
  }

  /** Content-defined fingerprint: md5 of the whitespace-normalized,
    * lowercased text — the exact-dup key that survives formatting noise.
    */
  def normalizedFingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** GPT-2-style pre-tokenizer pattern, RE2-safe (no lookahead) so the
    * DuckDB oracle evaluates the identical regex: contraction suffixes,
    * letter runs, digit runs, punctuation runs. Counting its matches is
    * the standard cheap token-budget estimate a training-data pipeline
    * stamps on every document before packing.
    */
  val BpeTokenPattern: String =
    "'(?:[sdmt]|ll|ve|re)|\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+"

  /** BPE-ish token count: matches of [[BpeTokenPattern]] — punctuation and
    * digit runs count separately from words, unlike whitespace tokens.
    * Pure codegen'd expression, no shuffle.
    */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenPattern)).cast("long")

  /** Token-window chunking — the sequence-packing precursor: each document
    * becomes overlapping windows of `chunkSize` whitespace tokens starting
    * every `stride` tokens (last windows may be short). One narrow
    * explode, no shuffle; chunk counts scale with corpus size, never with
    * driver memory.
    */
  def chunk(docs: DataFrame, id: Column, text: Column,
            chunkSize: Int, stride: Int): DataFrame = {
    val ts = col("__toks")
    docs.withColumn("__toks", tok(text))
      .select(id, posexplode(transform(
        sequence(lit(0), floor((size(ts) - 1) / stride).cast("int")),
        i => slice(ts, i * stride + lit(1), lit(chunkSize)))).as(Seq("chunk_id", "__c")))
      .select(id, col("chunk_id").cast("long"),
        concat_ws(" ", col("__c")).as("chunk_text"),
        size(col("__c")).cast("long").as("n_chunk_tokens"))
  }

  /** Email-address pattern, expressible identically in Java regex (Spark)
    * and RE2 (the oracle) — unambiguous greedy character classes, so both
    * engines find the same matches.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** IPv4-literal pattern (word-bounded; RE2 supports \b). */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII scrubbing for a training corpus: redact email addresses and IPv4
    * literals, reporting per-document match counts. Emails are replaced
    * FIRST (the placeholder carries no digits, so the IP pass cannot
    * re-match inside it). Pure codegen'd per-row expressions, no shuffle;
    * extend the pattern list for fuller coverage (phone formats are
    * locale-ambiguous and deliberately out of this deterministic core).
    */
  def redactPii(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id,
      regexp_count(text, lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(text, lit(Ipv4Pattern)).cast("long").as("n_ips"),
      regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>").as("redacted"))

  /** Fixed-budget contiguous sequence packing over [[chunk]] output: chunk
    * k of a document goes to bin `floor(tokens-before-k / capacity)` — the
    * distributed approximation of greedy packing (exact greedy is
    * inherently sequential; this keeps chunks contiguous and lets a bin
    * overflow by at most one chunk). One window on the document id + one
    * map-side-combinable aggregation — nothing driver-bound, and the
    * window key is the id (high cardinality, no skew).
    */
  def packChunks(chunks: DataFrame, id: Column, chunkId: Column,
                 nTokens: Column, capacity: Int): DataFrame = {
    require(capacity > 0, s"pack capacity must be positive, got $capacity")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(id).orderBy(chunkId)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    chunks.withColumn("__prior", coalesce(sum(nTokens).over(w), lit(0L)))
      .withColumn("bin", floor(col("__prior") / lit(capacity.toDouble)).cast("long"))
      .groupBy(id, col("bin"))
      .agg(count(lit(1)).as("n_chunks"), sum(nTokens).as("n_tokens"))
  }

  /** Word n-gram shingles (space-joined), the unit for Jaccard/MinHash.
    *
    * IMPORTANT for callers: pass a *materialized tokens attribute* (a column
    * produced by a prior projection), not a nested `split(...)` expression —
    * interpreted higher-order functions re-evaluate non-attribute
    * subexpressions per lambda element, turning shingling O(tokens²).
    */
  def shinglesFromTokens(ts: Column, n: Int): Column =
    array_distinct(
      when(size(ts) < n, array(concat_ws(" ", ts)))
        .otherwise(transform(sequence(lit(0), size(ts) - n),
          i => concat_ws(" ", slice(ts, i + lit(1), lit(n))))))

  /** Convenience composition of [[tokens]] + [[shinglesFromTokens]] — only
    * for small inputs; prefer the two-step form on large tables.
    */
  def shingles(text: Column, n: Int): Column = shinglesFromTokens(tok(text), n)

  /** All n-gram shingle OCCURRENCES (duplicates kept — the unit of
    * repetition measurement, unlike [[shinglesFromTokens]]'s distinct
    * set). Same materialized-tokens-attribute caveat as the class doc.
    */
  def shinglesAllFromTokens(ts: Column, n: Int): Column =
    when(size(ts) < n, array(concat_ws(" ", ts)))
      .otherwise(transform(sequence(lit(0), size(ts) - n),
        i => concat_ws(" ", slice(ts, i + lit(1), lit(n)))))

  /** The first iteration of BPE tokenizer TRAINING: corpus-weighted
    * adjacent character-pair frequencies — the statistic each BPE merge
    * step maximizes (Sennrich et al. 2016, public). Distributed shape:
    * aggregate the corpus to DISTINCT words with counts first (the word
    * histogram is vocabulary-sized, orders of magnitude smaller than the
    * corpus, and the aggregation is map-side combinable), then explode
    * each distinct word's adjacent pairs once and weight by the word's
    * frequency. Top pairs ranked with a deterministic tie-break.
    */
  def bpePairCounts(docs: DataFrame, text: Column, topN: Int): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val words = docs.select(explode(tok(text)).as("word"))
      .filter(length(col("word")) >= 2)
      .groupBy(col("word")).agg(count(lit(1)).as("n_word"))
    // dynamic-start substring inside the lambda needs the SQL form; the
    // lambda runs over DISTINCT words only (vocabulary-scale)
    val pairs = words.select(col("n_word"),
      explode(expr(
        "transform(sequence(0, length(word) - 2), i -> substring(word, i + 1, 2))"))
        .as("pair"))
    // the unpartitioned rank window is safe BY CONSTRUCTION: its input is
    // one row per distinct character pair — alphabet²-bounded, never
    // corpus-scale (do not imitate for data-scale frames)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("weight").desc, col("pair").asc)
    pairs.groupBy(col("pair"))
      .agg(sum(col("n_word")).as("weight"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topN)
      .select(col("rank"), col("pair"), col("weight"))
  }

  /** Cross-document packing into fixed-token-budget bins, sharded — the
    * other half of [[packChunks]] (which packs within one document):
    * whole documents are packed into shared training-sequence bins.
    * Exact global first-fit-decreasing is inherently sequential, so the
    * distributed shape shards first: within each shard, documents are
    * ordered longest-first (deterministic id tie-break) and document k
    * goes to bin `floor(tokens-before-k / capacity)` — contiguous, each
    * bin overflowing by at most one document.
    *
    * SCALE CONTRACT on `shard`: per-shard work runs in one task, so the
    * caller must size shard COUNT proportional to the corpus (a constant
    * documents-per-shard target, e.g. corpus/10k) — then per-task work is
    * bounded by construction no matter how large the corpus grows, unlike
    * a data-dependent group key whose groups grow with the data (that
    * shape needs [[Caps.perGroupCap]]-style two-phase handling instead).
    * A deterministic id residue (never rand()) keeps assignment
    * retry-stable.
    */
  def packItems(items: DataFrame, shard: Column, id: Column,
                nTokens: Column, capacity: Int): DataFrame = {
    require(capacity > 0, s"pack capacity must be positive, got $capacity")
    val base = items.select(shard.cast("long").as("shard"), id.as("doc_id"),
      nTokens.cast("long").as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    base.withColumn("__prior", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", floor(col("__prior") / lit(capacity.toDouble)).cast("long"))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_bin_tokens"))
  }

  /** Repetition signals for corpus curation (the Gopher/MassiveText
    * repetition-filter family, token-count formulation): per document,
    * the total n-gram occurrence count, the most frequent n-gram's count
    * and fraction, and the fraction of occurrences belonging to n-grams
    * that appear more than once. High values flag boilerplate/looping
    * text that the plain q08 surface stats miss. Shapes: one explode +
    * two map-side-combinable aggregations keyed on the high-cardinality
    * (doc, shingle) then doc — no skew, no driver state.
    */
  def repetitionStats(docs: DataFrame, id: Column, text: Column,
                      n: Int = 2): DataFrame = {
    require(n > 0, s"repetition n-gram order must be positive, got $n")
    val toked = docs.select(id.as("doc_id"), tok(text).as("__toks"))
    toked
      .select(col("doc_id"),
        explode(shinglesAllFromTokens(col("__toks"), n)).as("shingle"))
      .groupBy(col("doc_id"), col("shingle"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__n")).cast("long").as("n_ngrams"),
        max(col("__n")).cast("long").as("top_ngram_count"),
        round(max(col("__n")).cast("double") / sum(col("__n")), 6)
          .as("top_ngram_frac"),
        round(sum(when(col("__n") > 1, col("__n")).otherwise(0L))
          .cast("double") / sum(col("__n")), 6).as("dup_ngram_frac"))
  }

  /** EXACT per-group discrete percentiles of an integer-valued column,
    * computed scalably: a 100 TB corpus profiled by language cannot sort
    * each language's rows under one window (the low-cardinality-key skew
    * trap), but it doesn't need to — the value domain is bounded (token
    * counts, document lengths), so the rows compress to a per-(group,
    * value) HISTOGRAM with one combinable count shuffle, and the
    * percentile scan is a window over the histogram: thousands of rows
    * per group regardless of corpus size. Result is percentile_disc
    * semantics exactly: the smallest value whose cumulative count reaches
    * ceil(q·n).
    *
    * Percentiles are whole percents so the target rank ceil(p·n/100) is
    * computed in INTEGER arithmetic ((p·n + 99) div 100) — a fractional q
    * times n in doubles can land an epsilon past an integer and flip the
    * ceil; integers cannot.
    *
    * Returns one row per (group, percent p): (grp, pct, value).
    */
  def discretePercentiles(df: DataFrame, group: Column, value: Column,
                          percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      "discretePercentiles: every percent must be in [1, 100]")
    val hist = df.select(group.as("grp"), value.cast("long").as("v"))
      .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("n"))
    val byGrp = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
    val byGrpOrdered = byGrp.orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("cum_n", sum(col("n")).over(byGrpOrdered))
      .withColumn("total_n", sum(col("n")).over(byGrp))
    percents.map { p =>
      // ceil(p·n/100) as exact integer math; the double division is by a
      // constant 100 of an int < 2^53 — floor cannot flip
      val target = floor((lit(p.toLong) * col("total_n") + 99L) / 100.0)
        .cast("long")
      cum.filter(col("cum_n") >= target &&
          col("cum_n") - col("n") < target)
        .select(col("grp"), lit(p.toLong).as("pct"), col("v").as("value"))
    }.reduce(_ unionByName _)
  }

  /** Corpus-familiarity quality score — the integer-exact analog of
    * CCNet-style LM filtering (Wenzek et al. 2020 score documents by a
    * language model trained on a reference corpus; the distributional
    * signal survives without the model): a document's score is the
    * fraction of its bigram OCCURRENCES whose bigram appears at least
    * `minCount` times in its own LANGUAGE's corpus. Boilerplate and
    * common prose score high, garbled or off-distribution text scores
    * low — and the per-language reference means a French document is
    * judged against French statistics, as CCNet does.
    *
    * No logs, no model: counts are integers, the only division is the
    * final ratio (round 6), so the score is engine-identical. Shapes:
    * one map-side-combinable count on the high-cardinality (lang, bigram)
    * key, a LEFT SEMI back onto occurrences (same key), and a per-doc
    * count — no skew (the hottest bigram still flows through the
    * combiner), no broadcast of anything data-scale.
    *
    * Returns (doc_id, lang, n_bigrams, n_familiar, familiarity).
    */
  def bigramFamiliarity(docs: DataFrame, id: Column, text: Column,
                        lang: Column, minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val occ = graft.CacheRegistry.persist(
      docs.select(id.cast("long").as("doc_id"), lang.as("lang"),
          tok(text).as("__toks"))
        .select(col("doc_id"), col("lang"),
          explode(shinglesAllFromTokens(col("__toks"), 2)).as("bg")))
    val common = occ.groupBy(col("lang"), col("bg"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= minCount)
      .select(col("lang"), col("bg"))
    val familiar = occ.join(common, Seq("lang", "bg"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_familiar"))
    occ.groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"))
      .join(familiar, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_familiar"))
      .withColumn("familiarity",
        round(col("n_familiar").cast("double") / col("n_bigrams"), 6))
  }
}
