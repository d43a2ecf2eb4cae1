package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * language ID, quality scoring, fingerprinting. Everything is built from
  * codegen'd builtins (split / higher-order array functions / regexp) — no
  * UDFs — so the whole pipeline stays inside WholeStageCodegen and scales
  * linearly with input splits at 100 TB.
  *
  * All arithmetic is integer- or exactly-reproducible double arithmetic so
  * results are engine-independent (DuckDB-oracle-comparable).
  */
object TextAnalysis {

  /** Space-tokenize, dropping empties (mirrors DuckDB
    * `list_filter(string_split(text,' '), x -> x <> '')`).
    */
  def tokens(text: Column): Column =
    // array_remove, not filter(_ =!= ""): identical result (split yields
    // no nulls), but ArrayFilter is a CodegenFallback higher-order
    // function — the whole split+filter subtree evaluates interpreted at
    // EVERY tokens() call site, which at corpus scale is the dominant CPU
    // of the text family. ArrayRemove stays inside whole-stage codegen.
    array_remove(split(text, " ", -1), "")

  /** BPE-ish subword segments: maximal runs of lowercase letters or digits. */
  def regexTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+"), lit(0))

  /** Small fixed stopword list used by quality scoring and language ID. */
  val stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it", "on", "for")

  /** Per-language marker lexicons for the n-gram/lexicon language-ID
    * heuristic. Deliberately tiny and deterministic; real deployments swap
    * in larger lexicons without changing the plan shape.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "it"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "zh" -> Seq("de", "shi", "le", "wo", "bu"))


  /** doc_id, n_tokens, n_chars_obs, avg_token_len, stopword_ratio,
    * punct_ratio, quality_score — one pass, all map-side.
    */
  def quality(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // spread: CPU-heavy map pass; a single-split source otherwise runs it
    // on one task (no-op on well-split / already-shuffled inputs).
    // token count, summed token code-point length, and stopword hits come
    // from ONE fused native pass (TokenSetHits) — the aggregate/transform/
    // filter composition is interpreted HigherOrderFunction plumbing.
    graft.core.Spread.ensureParallel(docs)
      .withColumn("_ts",
        org.apache.spark.sql.GraftBridge.tokenSetHits(col(textCol), Seq(stopwords)))
      .withColumn("n_tokens", element_at(col("_ts"), 1))
      .withColumn("n_chars_obs", length(col(textCol)).cast("long"))
      .withColumn("_tok_chars", element_at(col("_ts"), 2))
      .withColumn("_punct", element_at(col("_ts"), 3))
      .withColumn("_stop", element_at(col("_ts"), 4))
      .withColumn("avg_token_len",
        round(col("_tok_chars").cast("double") / col("n_tokens"), 6))
      .withColumn("stopword_ratio",
        round(col("_stop").cast("double") / col("n_tokens"), 6))
      .withColumn("punct_ratio",
        round(col("_punct").cast("double") / col("n_chars_obs"), 6))
      // score: in-range token count, low punctuation, some-but-not-all stopwords
      .withColumn("quality_score", round(
        when(col("n_tokens").between(5, 1000), lit(0.4)).otherwise(lit(0.0))
          + when(col("punct_ratio") <= 0.1, lit(0.3)).otherwise(lit(0.0))
          + when(col("stopword_ratio").between(0.01, 0.6), lit(0.3)).otherwise(lit(0.0)), 6))
      .drop("_ts", "_tok_chars", "_stop", "_punct")
  }

  /** Language ID: lexicon-hit counts per language, argmax with deterministic
    * lexicographic tiebreak, 'und' when nothing matches.
    */
  def languageId(docs0: DataFrame, textCol: String = "text"): DataFrame = {
    val docs = graft.core.Spread.ensureParallel(docs0)
    // ONE fused tokenize-and-count pass for all five marker lexicons
    // (TokenSetHits) — the per-language filter/isin chains each re-ran the
    // interpreted tokenizer over every row.
    val langs = langMarkers.toSeq.sortBy(_._1)
    // argmax = array_max over (hits, nrank, lang) structs compared
    // field-by-field; `nrank` = negated alphabetical rank makes equal-hit
    // ties pick the alphabetically FIRST language (matching the oracle's
    // CASE chain, which tests languages in alphabetical order).
    val scored = langs.zipWithIndex.map { case ((lang, _), rank) =>
      struct(element_at(col("_lh"), 4 + rank).as("hits"),
        lit(-rank).as("nrank"), lit(lang).as("lang"))
    }
    docs
      .withColumn("_lh", org.apache.spark.sql.GraftBridge.tokenSetHits(
        lower(col(textCol)), langs.map(_._2)))
      .withColumn("_best", array_max(array(scored: _*)))
      .withColumn("predicted_lang",
        when(col("_best.hits") > 0, col("_best.lang")).otherwise(lit("und")))
      .withColumn("lang_hits", col("_best.hits").cast("long"))
      .drop("_best", "_lh")
  }

  /** Document fingerprint: md5 over whitespace-collapsed, lowercased,
    * punctuation-stripped text — the canonical-form hash used for
    * normalized exact dedup. One fused native pass (CanonFingerprint) —
    * the regexp_replace chain ran two full regex scans per row and was
    * the dominant CPU of every normalized/incremental dedup path.
    */
  def fingerprint(text: Column): Column =
    org.apache.spark.sql.GraftBridge.canonFingerprint(text)

  /** Token counts via both tokenizers — both as native counting scans
    * (TokenCount / AlnumRunCount): the composable forms materialized
    * every token / regex match as a string just to take the array size.
    */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    graft.core.Spread.ensureParallel(docs)
      .withColumn("ws_tokens", org.apache.spark.sql.GraftBridge.tokenCount(col(textCol)))
      .withColumn("re_tokens",
        org.apache.spark.sql.GraftBridge.alnumRunCount(lower(col(textCol))))

  /** Corpora at or below this many DOCUMENTS (proven by zero-job parquet
    * footer counts) broadcast the df (document-frequency) side of the
    * tf-idf join. The broadcast side is one row per DISTINCT TERM, which
    * Heaps' law keeps far below the token count (every tier measured:
    * sf0.1 ≈ 10^4 distinct terms over 5k docs, sf10 ≈ 10^6 over 500k
    * docs ≈ tens of MB serialized — dimension-sized); at the 4M-doc
    * cutoff a web-like corpus bounds the vocabulary in the low hundreds
    * of MB, inside any executor. Above the cutoff (or when footers can't
    * bound the input) the vocabulary is corpus-scale-unknown and the
    * join stays a shuffle join — the same footer-gated dispatch as the
    * dedup family's isSmallCorpus.
    */
  private val dictBroadcastDocCutoff = 4000000L

  /** Second, STRUCTURAL leg of the broadcast gate: total uncompressed
    * bytes of the text column (zero-job, from footer chunk metadata). A
    * document count alone does not bound vocabulary — a corpus of
    * few-but-huge or high-entropy-token documents can push the term
    * dictionary past executor/broadcast limits while passing the 4M-doc
    * cutoff. Bytes do bound it: every distinct term occurs in the text,
    * so the dictionary's term bytes can never exceed the text bytes, and
    * with hash-relation overhead (~6x for short tokens, worst case
    * all-distinct) 512 MiB of text stays well inside the 8 GiB broadcast
    * hard cap with margin. The measured sf10 tier (229 MB) qualifies.
    */
  private val dictBroadcastTextBytesCutoff = 512L * 1024 * 1024

  /** Top-k terms per document by tf-idf.
    *
    * tf = in-doc term count; idf = ln(N / df) over the corpus; ties break
    * by term for determinism. The per-doc top-k is ranked in-row (no
    * window — see below).
    *
    * Join dispatch: below [[dictBroadcastDocCutoff]] footer-counted docs
    * the df side broadcasts, so the exploded (doc, term, tf) stream — the
    * corpus-proportional side — is never shuffled by term at all: the
    * only wide exchange left in the whole plan is the packed
    * one-row-per-doc top-k aggregation. The trade priced in: the probe
    * side re-tokenizes the corpus (the shuffle plan's ReusedExchange
    * served both join inputs from one pass) — one extra map-only native
    * pass bought the removal of the full-width term shuffle + both SMJ
    * sorts (same-session sf10 A/B in SCALE_STRESS.md). Above the cutoff
    * the shuffle join stands: an unbounded vocabulary must not ride a
    * broadcast (driver/executor OOM class at 100 TB).
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3,
                    textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // Corpus size N rides in the plan as a single-row scalar aggregate
    // cross-joined in (BroadcastNestedLoopJoin of one row) — no separate
    // driver-side count() job / extra scan per call.
    val nDf = docs.select(count(lit(1)).cast("double").as("_n"))
    // per-(doc, term) counts aggregate IN-ROW (TokenTermTfs): tf needs no
    // shuffle at all, and since the exploded rows are distinct per
    // (doc, term) by construction, df is a plain count — the old
    // formulation paid a (doc, term) shuffle for tf plus a distinct pass
    // for df. when() guard: see shinglesN.
    val tf = graft.core.Spread.ensureParallel(docs)
      .select(col(idCol).as("doc"),
        org.apache.spark.sql.GraftBridge.tokenTermTfs(lower(col(textCol))).as("_tc"))
      .select(col("doc"), explode(when(size(col("_tc")) > 0, col("_tc"))).as("t"))
      .select(col("doc"), col("t.term").as("term"), col("t.tf").as("tf"))
    val df0 = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // footer-gated broadcast of the term dictionary (scaladocs above); the
    // explode-derived size estimate oversells df0 so the size-based
    // planner never broadcasts it unhinted, and the hint must not be
    // unconditional — a web-scale vocabulary outgrows an executor. BOTH
    // legs must prove: document count (the Heaps'-law web-corpus bound)
    // AND text bytes (the structural vocabulary bound that holds for
    // any token distribution).
    val df_ =
      if (graft.core.RowCounts.upperBound(docs).exists(_ <= dictBroadcastDocCutoff)
          && graft.core.RowCounts.columnUncompressedBytes(docs, textCol)
            .exists(_ <= dictBroadcastTextBytesCutoff))
        broadcast(df0)
      else df0
    // Per-doc top-k WITHOUT a window: re-aggregate by doc and rank
    // in-row — array_sort on struct(-tfidf, term, ...) is lexicographic
    // (tfidf desc, then term asc — UTF8 byte order, exactly the
    // window's ORDER BY), slice keeps k, posexplode numbers the ranks.
    // The window formulation range-partitioned every (doc, term) row
    // and SORTED whole partitions to rank ~30 terms per doc; here the
    // exchange carries one packed row per doc and each doc sorts its
    // own term list (the reduce side is a hash agg, no sort at all).
    // Ties: term is unique within a doc, and -tfidf of equal values is
    // bitwise-equal (all tfidf >= 0, so no mixed +/-0.0), so the struct
    // order is total — bit-identical ranks to the window.
    tf.join(df_, "term")
      .crossJoin(nDf)
      .withColumn("tfidf", round(col("tf") * log(col("_n") / col("df")), 6))
      .groupBy(col("doc"))
      .agg(slice(array_sort(collect_list(struct(
        (-col("tfidf")).as("_neg"), col("term"), col("tf"),
        col("df"), col("tfidf")))), 1, k).as("_top"))
      .select(col("doc"), posexplode(col("_top")))
      .select(col("doc"), col("col.term").as("term"), col("col.tf").as("tf"),
        col("col.df").as("df"), col("col.tfidf").as("tfidf"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Repetition scores (the Gopher-family repetition quality rules):
    * `dup_token_frac` = 1 − distinct/total tokens, `top_bigram_frac`
    * = occurrences of the most frequent bigram / total bigrams (0 when a
    * doc has fewer than 2 tokens), and `dup_trigram_frac` = fraction of
    * trigram slots whose trigram occurs more than once in the document.
    * High values flag the boilerplate/keyword-stuffing documents that
    * survive length and punctuation filters; the trigram rule catches
    * longer-phrase loops that single-token and bigram stats miss.
    *
    * Map-side only, builtins only. The bigram mode (max multiplicity) is
    * computed per row by sorting the bigram array and counting the
    * longest equal run in one aggregate pass — O(n log n) per doc (the
    * naive distinct×scan form was O(u·n) and 3× slower at sf0.1); the
    * duplicated-trigram count sorts once and counts non-singletons by
    * comparing sorted neighbors. No shuffle, linear at 100 TB.
    */
  def repetitionScores(docs0: DataFrame, textCol: String = "text"): DataFrame = {
    val docs = graft.core.Spread.ensureParallel(docs0)
    // one fused native pass (RepetitionStats): token/bigram/trigram
    // multiplicity stats via sorted 64-bit n-gram hashes — the
    // composable form (three zip_with windows, an aggregate fold for the
    // longest run, filter-over-sequence for singletons) is interpreted
    // per row and was the costliest map pass of the text family.
    val rs = col("_rs")
    docs
      .withColumn("_rs", org.apache.spark.sql.GraftBridge.repetitionStats(col(textCol)))
      .withColumn("n_tokens", element_at(rs, 1))
      .withColumn("dup_token_frac",
        when(col("n_tokens") === 0, lit(0.0)).otherwise(round(
          lit(1.0) - element_at(rs, 2).cast("double") / col("n_tokens"), 6)))
      .withColumn("top_bigram_frac",
        when(element_at(rs, 3) === 0, lit(0.0)).otherwise(round(
          element_at(rs, 4).cast("double") / element_at(rs, 3), 6)))
      .withColumn("dup_trigram_frac",
        when(element_at(rs, 5) === 0, lit(0.0)).otherwise(round(
          element_at(rs, 6).cast("double") / element_at(rs, 5), 6)))
      .drop("_rs")
  }

  /** Gopher quality-filter rules (Rae et al., "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", 2021, §A1.1),
    * composed from the fused native signals already in this family:
    * word count in [50, 100000], mean word length in [3, 10],
    * symbol-to-word ratio (# and ... occurrences / words) <= 0.1,
    * >= 80% of words containing an alphabetic character, >= 2 hits from
    * the stopword set, and the repetition rules mapped onto
    * [[repetitionScores]]'s fractions (dup_token_frac <= 0.4,
    * top_bigram_frac <= 0.2, dup_trigram_frac <= 0.3 — the paper states
    * per-n-gram thresholds of the same family). Emits every signal plus
    * the composite keep flag, so downstream can re-threshold without
    * recomputing.
    *
    * One chained map pass (RepetitionStats + TokenSetHits + builtins) —
    * no shuffle, linear at 100 TB.
    */
  def gopherFilter(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val withRep = repetitionScores(docs, textCol)
    val t = col(textCol)
    withRep
      .withColumn("_ts",
        org.apache.spark.sql.GraftBridge.tokenSetHits(t, Seq(stopwords)))
      .withColumn("stop_hits", element_at(col("_ts"), 4))
      .withColumn("mean_word_len",
        when(col("n_tokens") === 0, lit(0.0)).otherwise(round(
          element_at(col("_ts"), 2).cast("double") / col("n_tokens"), 6)))
      .withColumn("symbol_ratio",
        when(col("n_tokens") === 0, lit(0.0)).otherwise(round(
          ((length(t) - length(replace(t, lit("#"), lit("")))).cast("double")
            + (length(t) - length(replace(t, lit("..."), lit("")))).cast("double") / 3)
            / col("n_tokens"), 6)))
      // alpha-token count is the native pass's trailing element — no
      // interpreted re-tokenization / per-token regex (the cost this
      // family's fused natives exist to remove)
      .withColumn("alpha_word_frac",
        when(col("n_tokens") === 0, lit(0.0)).otherwise(round(
          element_at(col("_ts"), 5).cast("double") / col("n_tokens"), 6)))
      .withColumn("keep",
        when(col("n_tokens").between(50, 100000)
          && col("mean_word_len").between(3.0, 10.0)
          && col("symbol_ratio") <= 0.1
          && col("alpha_word_frac") >= 0.8
          && col("stop_hits") >= 2
          && col("dup_token_frac") <= 0.4
          && col("top_bigram_frac") <= 0.2
          && col("dup_trigram_frac") <= 0.3, lit(1L)).otherwise(lit(0L)))
      .drop("_ts")
  }

  /** PII scrubbing: redact emails, IPv4 literals, and long (>= 7) digit
    * runs, reporting per-category match counts. Patterns are RE2-safe
    * (character classes, bounded repeats, \b — no backreferences or
    * lookaround) so the SAME pattern is engine-reproducible in the
    * DuckDB oracle. Pure `regexp_replace`/`regexp_extract_all` — one
    * codegen'd map pass, no shuffle.
    *
    * Order matters and is part of the contract: emails first (their
    * local parts may contain digit runs), then IPv4 (dotted quads would
    * otherwise be eaten piecemeal by the digit-run rule), then bare
    * digit runs.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val DigitRunRe = "\\b[0-9]{7,}\\b"

  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // Hand-rolled fused scanner (PiiRedact): ONE expression evaluates
    // the whole three-pattern chain — one UTF8String decode, three
    // linear run-skipping char passes, one re-encode — replacing three
    // java-regex Matcher passes whose greedy local-part class re-scans
    // every word from each retry offset. Bit-identical to the
    // java-regex chain (randomized differential spec + composable-plan
    // spec in ScaleTechniquesSpec); A/B vs the RegexRedact chain
    // recorded in SCALE_STRESS.md round 14.
    val br = org.apache.spark.sql.GraftBridge
    graft.core.Spread.ensureParallel(docs)
      .withColumn("_p", br.piiRedact(col(textCol)))
      .withColumn("n_emails", col("_p.n_emails"))
      .withColumn("n_ipv4", col("_p.n_ipv4"))
      .withColumn("n_digit_runs", col("_p.n_digit_runs"))
      .withColumn("text_redacted", col("_p.redacted"))
      .drop("_p")
  }

  /** Sliding-window token chunking (training-example construction: split
    * each document's token stream into windows of `window` tokens every
    * `stride` tokens — overlapping when stride < window). Emits one row
    * per chunk with its 0-based index, token count, and re-joined text.
    * Empty documents produce no chunks.
    *
    * Map-side explode — per-row fanout of ~n/stride chunks, no shuffle;
    * chunking 100 TB is a single pass.
    */
  def chunkTokens(docs: DataFrame, window: Int, stride: Int,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    // fused native chunker (TokenChunks); chunk strings are always
    // single-spaced, so the per-chunk token count is an exact re-split.
    // Empty docs explode to nothing (the old size > 0 filter).
    docs
      .withColumn("_c",
        org.apache.spark.sql.GraftBridge.tokenChunks(col(textCol), window, stride))
      .select(col(idCol), posexplode(when(size(col("_c")) > 0, col("_c"))))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        size(split(col("col"), " ", -1)).cast("long").as("chunk_tokens"),
        col("col").as("chunk_text"))
  }

  /** C4-style line filtering (boilerplate removal): keep only lines with
    * at least `minWords` words that end in terminal punctuation (./!/?),
    * and keep only documents with at least `minLines` surviving lines —
    * the two structural rules of the C4 cleaning recipe. Navigation
    * menus, cookie banners, and list fragments fail the sentence test;
    * documents reduced to nothing fail the document test.
    *
    * Pure per-row array work (split → filter → re-join) — zero shuffle,
    * one codegen'd map pass; at 100 TB this is scan-bound.
    */
  def c4LineFilter(docs: DataFrame, minWords: Int = 5, minLines: Int = 2,
                   textCol: String = "text"): DataFrame =
    // one fused native pass (C4LineStats) — the nested filter/split HOF
    // chain was interpreted AND its alias leaked into a pushed-down
    // filter (see below).
    graft.core.Spread.ensureParallel(docs)
      .withColumn("_c4",
        org.apache.spark.sql.GraftBridge.c4LineStats(col(textCol), minWords))
      // the document gate rides explode's null-drop, NOT a Filter node:
      // filtering on an alias of the expensive expression gets the full
      // expression substituted into the filter by PushDownPredicates (no
      // expensive-expression guard — NOTES.md round-1 finding 1) and
      // pushed below the spread exchange, re-evaluating the pass per row
      // on the un-spread source. A when()-guarded explode is not
      // inferable and drops failing rows identically (shinglesN pattern).
      .withColumn("_gate",
        explode(when(col("_c4")("n_kept_lines") >= minLines, array(lit(1)))))
      .withColumn("n_lines", col("_c4")("n_lines"))
      .withColumn("n_kept_lines", col("_c4")("n_kept_lines"))
      .withColumn("text_filtered", col("_c4")("text_filtered"))
      .drop("_c4", "_gate")

  /** Corpus-unigram language-model scoring — the classic cheap "quality
    * by typicality" signal: train token frequencies on the corpus itself,
    * then score each document by the mean log-probability of its tokens
    * under that unigram model with add-one smoothing,
    * p(t) = (c(t)+1) / (T+V). Keyword-stuffed or garbled documents score
    * far below the corpus mode; the score is also the standard filter for
    * matching a target-domain distribution (train counts on the target,
    * score the crawl).
    *
    * Scale shape: one shuffle for the token-count dictionary (vocabulary-
    * sized — the size-based planner broadcasts it back while it fits, and
    * degrades to a shuffle join beyond that), one shuffle for the per-doc
    * mean. Corpus totals (T, V) ride the plan as a one-row scalar
    * aggregate cross-joined in — no driver-side action.
    */
  def unigramLogProb(docs: DataFrame,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // Per-(doc, term) counts aggregated IN-ROW (TokenTfs): the first
    // shuffle of the old explode → groupBy(doc, term) formulation moved
    // every token occurrence; now there is NO doc-term shuffle at all —
    // the explode emits pre-counted (hash, tf) pairs, the vocabulary
    // rollup keys on the 8-byte hash, and the term string (which never
    // reaches the output) is gone from the plan entirely.
    // docTerm feeds both the dictionary rollup and the per-doc join;
    // deliberately NOT cached: the duplicated subplan is map-side work
    // the partial aggregation overlaps with the shuffle, and measured
    // end-to-end the cache's materialization barrier + columnar
    // conversion costs more than the recompute at every tier tried.
    val docTerm = graft.core.Spread.ensureParallel(docs)
      .select(col(idCol).as("doc"),
        org.apache.spark.sql.GraftBridge.tokenTfs(lower(col(textCol))).as("_tc"))
      // when() guard: explode over a bare computed alias would get an
      // inferred size filter substituted below the spread exchange
      // (NOTES.md round-1 finding 1)
      .select(col("doc"), explode(when(size(col("_tc")) > 0, col("_tc"))).as("tc"))
      .select(col("doc"), col("tc.h").as("term"), col("tc.tf").as("tf"))
    // footer-gated dictionary broadcast — the same two-leg gate as
    // tfidf's (doc-count Heaps'-law bound AND structural text-byte
    // bound): below it the corpus-proportional docTerm stream is never
    // shuffled by term, and because each doc's rows stay contiguous in
    // their scan partition, the per-doc aggregation's map-side partial
    // collapses to ~one row per doc before its exchange — the plan's
    // only corpus-sized shuffle. Above the gate (or when footers can't
    // bound the input) the shuffle join stands: an unbounded vocabulary
    // must not ride a forced broadcast. In the gated arm the
    // DICTIONARY-SIZED counts frame is cached: the broadcast build and
    // the (_T, _V) stats aggregate both consume it, and a
    // ShuffleExchange and a BroadcastExchange over the same subplan
    // cannot ReusedExchange-share — uncached, the corpus would tokenize
    // three times (dictionary build ×2 + probe) instead of twice.
    val broadcastDict =
      graft.core.RowCounts.upperBound(docs).exists(_ <= dictBroadcastDocCutoff) &&
        graft.core.RowCounts.columnUncompressedBytes(docs, textCol)
          .exists(_ <= dictBroadcastTextBytesCutoff)
    val counts0 = {
      val c = docTerm.groupBy(col("term")).agg(sum(col("tf")).as("c"))
      if (broadcastDict) graft.core.CacheScope.cached(c) else c
    }
    val counts = if (broadcastDict) broadcast(counts0) else counts0
    val stats = counts0.agg(sum(col("c")).cast("double").as("_T"),
      count(lit(1)).cast("double").as("_V"))
    docTerm.join(counts, "term")
      .crossJoin(stats)
      .groupBy(col("doc"))
      .agg(sum(col("tf")).as("n_tokens"),
        // ORDER-INVARIANT mean: each per-term log is truncated to a
        // decimal(28,18) before summing (weighted by the exact integer
        // term frequency), so the aggregate is exact integer arithmetic —
        // identical under any partitioning / merge order (double summation
        // is partition-order-dependent; the gate hash is the contract, so
        // "round(,6) absorbs it" is not enough). sum(tf*x)/sum(tf) over
        // exact decimals equals the expanded-multiset mean.
        // EXACTLY Average-over-decimal(28,18) semantics, reproduced in
        // weighted form: conceptually tf.cast(decimal(9,0)) ×
        // log(...).cast(decimal(28,18)) summed to decimal(38,18) and
        // divided by the decimal(20,0) token count — the same result
        // type (scale 18, MathContext-38 HALF_UP) that Average's
        // internal Divide produces, so this rounds identically to the
        // per-occurrence avg() it replaces, and stays order-invariant.
        // The decimal multiply + decimal(38,18) sum are executed as
        // int128 long arithmetic (sum128Product — bit-identical arms
        // including both cast overflow→null branches; differential spec
        // in OperatorsSpec), keeping the per-row hot path out of
        // BigDecimal: only the double→scale-18 rounding (defined by
        // Double.toString semantics) remains a BigDecimal op per row.
        round(org.apache.spark.sql.GraftBridge.sum128Product(
            col("tf").cast("long"),
            log((col("c") + lit(1)) / (col("_T") + col("_V"))), 18)
          / sum(col("tf")).cast(org.apache.spark.sql.types.DecimalType(20, 0)), 6)
          .cast("double").as("avg_logprob"))
  }

  /** Sketch-based distinct counts per group (HyperLogLog++, SURVEY §4):
    * the opt-in replacement for exact `countDistinct` at 100 TB — one
    * fixed-size sketch per group instead of the exact two-phase expand,
    * with relative error `rsd`. No external-engine oracle exists for the
    * sketch (algorithm-specific), so correctness is bounded-error
    * unit-tested against the exact count.
    */
  def approxDistinctPerGroup(df: DataFrame, groupCol: String, valueCol: String,
                             rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Token-budget document packing (training-batch construction): walk
    * documents in id order, accumulate token counts, and assign each
    * document to the bin its *starting* offset falls in — the prefix-sum
    * formulation of greedy sequential packing.
    *
    * The global prefix sum is computed in two passes so no stage funnels
    * the corpus through one task: (1) per-shard token totals (shard =
    * `idCol DIV shardSize`, monotone in id) are aggregated and collected —
    * one row per shard, the same bounded driver collect
    * `RDD.zipWithIndex` performs for per-partition counts; (2) a window
    * cumsum PARTITIONED BY shard plus the broadcast per-shard offset
    * reconstructs the exact global prefix sum. Results are independent of
    * `shardSize` (unit-tested); partition width is bounded by it.
    *
    * Pass 1 makes the operator eager (it runs one aggregation job at call
    * time), which is the standard cost of distributed prefix sums.
    */
  def packByTokenBudget(docs: DataFrame, budget: Long,
                        textCol: String = "text", idCol: String = "doc_id",
                        shardSize: Long = 1L << 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val withTok = docs
      .withColumn("n_tokens", org.apache.spark.sql.GraftBridge.tokenCount(col(textCol)))
      .withColumn("_shard", expr(s"CAST($idCol AS BIGINT) DIV $shardSize"))
    // shard prefix offsets IN-PLAN (r17): the collected one-row-per-shard
    // totals and the driver prefix sum become a window over the same
    // grouped frame (shard count = N/shardSize — dimension-sized at any
    // tier, ~15k rows per 10^9 docs), removing the extra action +
    // barrier per call and making the whole plan lazy (prepared-plan
    // reusable). Same long sums, same shard-order prefix. Broadcast is
    // now explicit — the frame is no longer a LocalRelation the planner
    // can size on its own.
    val wOff = Window.orderBy(col("_shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsetsDf = broadcast(withTok.groupBy(col("_shard"))
      .agg(sum(col("n_tokens")).as("_t"))
      .select(col("_shard"),
        coalesce(sum(col("_t")).over(wOff), lit(0L)).as("_offset")))
    val w = Window.partitionBy(col("_shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withTok
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .join(offsetsDf, Seq("_shard"))
      .withColumn("bin",
        expr(s"CAST((_offset + _cum - n_tokens) DIV $budget AS BIGINT)"))
      .select(col(idCol), col("n_tokens"), col("bin"))
  }
}
