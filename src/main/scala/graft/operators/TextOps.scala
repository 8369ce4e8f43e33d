package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-data-pipeline surface: tokenizing,
  * quality scoring, language ID, fingerprinting. All pure `functions._`
  * compositions — codegen'd, no UDFs, shuffle-free (per-row), so they
  * stream through a 100 TB `documents` scan at parquet-read speed.
  *
  * Determinism contract: only exact string/integer ops and IEEE +,-,*,/
  * so results hash-match a DuckDB oracle bit-for-bit.
  */
object TextOps {

  /** Whitespace tokens of trimmed, lowercased text.
    *
    * NOTE for hot paths: expressions that reference `tokens(text)` more
    * than once re-execute the regex split per reference (Catalyst does
    * not CSE across lambda boundaries). Materialize the token array as
    * a column first (`df.withColumn("toks", tokens(col) )`) and use the
    * `...FromTokens` variants below. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word segmentation: runs of letters, runs of digits, or a
    * single other non-space symbol — the classic pre-tokenizer split. */
  val BpeTokenPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpeTokenPattern), lit(0))
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Quality components (all exact or single-IEEE-op ratios). */
  def charCount(text: Column): Column = length(text)
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[\\.,;:!\\?]"), lit(0)))
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    graft.functions.StringSetFunctions.count_in_set(tokens(text), stopwords)

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Composite quality score ∈ [0, ~1]: mean-word-length band + low
    * punctuation density + nonzero-ish stopword presence. Purely
    * arithmetic; thresholds chosen for the classic "is this prose"
    * heuristic. */
  def qualityScore(text: Column): Column =
    qualityScoreFromTokens(text, tokens(text))

  /** Hot-path variant: `toks` should be a materialized column. */
  def qualityScoreFromTokens(text: Column, toks: Column): Column = {
    val n = size(toks).cast("double")
    val chars = charCount(text).cast("double")
    val meanWordLen = chars / greatest(n, lit(1.0))
    val punctRatio = punctCount(text).cast("double") / greatest(chars, lit(1.0))
    // native codegen set-count (CountInSet): identical to
    // size(filter(toks, isInCollection)) but not interpreter-bound
    val stopRatio =
      graft.functions.StringSetFunctions.count_in_set(toks, EnglishStopwords)
        .cast("double") / greatest(n, lit(1.0))
    val lenOk = when(n >= 5 && n <= 100000, lit(1.0)).otherwise(lit(0.0))
    val wordOk = when(meanWordLen >= 2.0 && meanWordLen <= 12.0, lit(1.0))
      .otherwise(lit(0.0))
    val punctOk = when(punctRatio <= 0.2, lit(1.0)).otherwise(lit(0.0))
    (lenOk * 0.25) + (wordOk * 0.25) + (punctOk * 0.25) +
      (least(stopRatio * 5.0, lit(1.0)) * 0.25)
  }

  /** Tiny per-language marker lexicons for n-gram/stopword language ID.
    * Deliberately minimal — the operator shape (score-per-language,
    * argmax with lexicographic tie-break) is what scales; swap lexicons
    * for real ones in production. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des"))

  /** Language-ID: hit-count per lexicon, argmax, ties → lexicographically
    * first language, zero hits → "und" (undetermined). */
  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  /** Hot-path variant: `toks` should be a materialized column.
    *
    * Scalar hit counts + greatest + first-match decode: every
    * subexpression is codegen'd (count_in_set is the native
    * expression; greatest and CASE WHEN are built-ins), so the whole
    * predicate stays inside whole-stage codegen with subexpression
    * elimination — unlike the previous transform/filter HOF
    * formulation, which evaluated interpreted and rebuilt the
    * (hits, lang) struct array three times (12 count_in_set calls per
    * row). Tie-break: [[LangMarkers]] is ordered alphabetically by
    * language code, so first-match == min-lang-among-winners — the
    * documented rule, and exactly the oracle's CASE chain. A null
    * token array still yields null (not "und"), as before. */
  def langIdFromTokens(toks: Column): Column = {
    val hits = LangMarkers.map { case (lang, words) =>
      lang -> graft.functions.StringSetFunctions.count_in_set(toks, words)
    }
    val m = greatest(hits.map(_._2): _*)
    val decode = hits.foldRight(lit("und")) { case ((lang, h), acc) =>
      when(h === m, lit(lang)).otherwise(acc)
    }
    when(m.isNull, lit(null).cast("string"))
      .when(m <= 0, lit("und"))
      .otherwise(decode)
  }

  /** Polynomial rolling hash over the UTF-16 code units of lowercased
    * text: `h = fold(units, 0, (a, c) -> (a * 31 + c) mod (2^31 - 1))`.
    * Runs as the native codegen'd [[graft.functions.RollingHash]] — one
    * tight loop per row — instead of a per-character array split folded
    * through interpreted lambdas. Deterministic sequential fold; int64
    * never overflows (a < 2^31, a*31 + c < 2^36). */
  def rollingHash(text: Column): Column =
    graft.functions.HashFunctions.rolling_hash(lower(text))

  /** Order-insensitive content fingerprint: md5 of the sorted distinct
    * token multiset — catches shuffled near-identical docs. */
  def contentFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Aggressive dedup normalization (the canonical pre-exact-dedup
    * canonicalization): lowercase, strip everything but [a-z0-9 ],
    * collapse whitespace runs, trim. Exact dedup over
    * `md5(normalizeForDedup(text))` catches case/punctuation/spacing
    * variants that plain body-hash dedup misses. Pure regexp chain —
    * codegen'd, shuffle-free, RE2-compatible patterns. */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Repetition ratio (the classic "repeated n-grams" quality signal):
    * fraction of the document's w-grams that are duplicates,
    * `1 - distinct(grams)/total(grams)` ∈ [0, 1). Boilerplate and
    * looping generations score high; clean prose scores near 0.
    * Shuffle-free per-row arithmetic; the distinct count runs as the
    * native [[graft.functions.DistinctWGramCount]] — one pass and one
    * hash set per row instead of materializing every gram string
    * through interpreted `transform`/`concat_ws`/`array_distinct`
    * lambdas (7.6 s → sub-second at sf0.1). */
  def repetitionRatio(text: Column, w: Int = 2): Column = {
    val toks = tokens(text)
    val total = greatest(size(toks) - lit(w - 1), lit(1))
    lit(1.0) -
      graft.functions.HashFunctions.distinct_wgram_count(toks, w)
        .cast("double") / total.cast("double")
  }

  /** PII-pattern scan: counts of email-like and phone-like matches plus
    * a has_pii flag — the redaction-triage pass of a corpus pipeline.
    * Patterns are deliberately RE2-compatible (no backreferences, no
    * lookaround) so the same regex text runs identically in Spark's
    * Java engine and in RE2-based engines — which is also what keeps
    * the operator oracle-checkable. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  def piiCounts(text: Column): (Column, Column, Column) = {
    val emails = size(regexp_extract_all(text, lit(EmailPattern), lit(0)))
    val phones = size(regexp_extract_all(text, lit(PhonePattern), lit(0)))
    (emails.cast("long"), phones.cast("long"), emails + phones > 0)
  }

  /** PII redaction: the action [[piiCounts]] triages for — every
    * email-like and phone-like match replaced with a fixed placeholder
    * token, plus the redaction counts for the audit trail. Fixed
    * tokens (not per-match hashes) keep redacted corpora join-safe on
    * text equality and the operator deterministic in any regex engine
    * running the same RE2-compatible pattern; projection-only, so the
    * pass costs one scan at any corpus size. */
  def piiRedact(text: Column): (Column, Column, Column) = {
    val (emails, phones, _) = piiCounts(text)
    val redacted = regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")
    (redacted, emails, phones)
  }

  /** Shingle novelty score — the data-curation signal "how much of this
    * document is new relative to everything before it": every distinct
    * shingle is attributed to its FIRST owner (min doc_id; ingestion
    * order in production), and a document's novelty is the fraction of
    * its shingles it owns. Exact duplicates of an earlier doc score 0,
    * fully-original docs score 1, boilerplate-heavy docs land
    * proportionally between — a cheap corpus-ORDER-aware complement to
    * pairwise near-dup joins.
    *
    * Scale: two aggregations over the (doc, shingle-key) long form —
    * min-owner per 8-byte shingle key, join back, one count-sum per
    * doc. No self-join of the corpus. Output: (doc_id, n_sh, n_novel,
    * novelty). */
  def noveltyScores(documents: DataFrame, w: Int = 3): DataFrame = {
    val docSh = Dedup.docShinglesRaw(documents, w)
      .select(col("doc_id"), xxhash64(col("shingle")).as("shk"))
      .localCheckpoint(true)
    val owner = docSh.groupBy(col("shk"))
      .agg(min(col("doc_id")).as("owner_id"))
    docSh.join(owner, Seq("shk"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("owner_id") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_sh"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_sh").cast("double"))
          .as("novelty"))
  }

  /** Gopher-style rule-based quality filtering (Rae et al. 2021,
    * "Scaling Language Models: ... Gopher", §A1.1 — public): instead of
    * one blended score ([[qualityScore]]), each heuristic is its own
    * boolean column so a pipeline can audit WHICH rule dropped a
    * document — the operational difference between a filter you can
    * tune and one you can only rerun:
    *
    *   - `ok_words`:    token count within [minWords, maxWords]
    *   - `ok_word_len`: mean token length within [minMeanLen, maxMeanLen]
    *   - `ok_stop`:     stopword fraction ≥ minStopRatio (prose signal)
    *   - `ok_rep`:      most-frequent-token share ≤ maxTopTokenRatio
    *                    (the degenerate-repetition rule)
    *   - `keep`:        conjunction of all four
    *
    * Exactness: every ratio is ONE double division of two exact longs,
    * and thresholds are compared on that single-division value — no
    * float accumulation, so the booleans are engine-independent.
    *
    * Scale: the three per-row stats are codegen'd array expressions
    * (zero shuffle); the top-token share needs token-level grouping, so
    * the long form explodes and hash-aggregates on (doc_id, token) —
    * linear in corpus tokens, the same shape as [[noveltyScores]] —
    * and max-reduces to one row per doc before joining back.
    *
    * Output: (doc_id, n_words, mean_word_len, stop_ratio,
    * max_token_ratio, ok_words, ok_word_len, ok_stop, ok_rep, keep);
    * empty/whitespace-only docs have no tokens and are absent. */
  def gopherFilters(documents: DataFrame,
      minWords: Int = 25, maxWords: Int = 90,
      minMeanLen: Double = 4.3, maxMeanLen: Double = 4.75,
      minStopRatio: Double = 0.02,
      maxTopTokenRatio: Double = 0.12): DataFrame = {
    val toks = documents
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      // whitespace-only text splits to [""] — the one shape where the
      // tokenizer yields a token that isn't a word; null text → null
      // array, dropped by the same (null-propagating) comparison
      .where(col("ts") =!= array(lit("")))
    val perRow = toks.select(
      col("doc_id"), col("ts"),
      size(col("ts")).cast("long").as("n_words"),
      aggregate(transform(col("ts"), t => length(t).cast("long")),
        lit(0L), (acc, x) => acc + x).as("sum_len"),
      graft.functions.StringSetFunctions
        .count_in_set(col("ts"), EnglishStopwords).cast("long")
        .as("n_stop"))
    val topToken = toks
      .select(col("doc_id"), explode(col("ts")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("max_token_n"))
    perRow.join(topToken, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"),
        (col("sum_len").cast("double") / col("n_words").cast("double"))
          .as("mean_word_len"),
        (col("n_stop").cast("double") / col("n_words").cast("double"))
          .as("stop_ratio"),
        (col("max_token_n").cast("double") / col("n_words").cast("double"))
          .as("max_token_ratio"))
      .withColumn("ok_words",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("ok_word_len", col("mean_word_len") >= minMeanLen &&
        col("mean_word_len") <= maxMeanLen)
      .withColumn("ok_stop", col("stop_ratio") >= minStopRatio)
      .withColumn("ok_rep", col("max_token_ratio") <= maxTopTokenRatio)
      .withColumn("keep", col("ok_words") && col("ok_word_len") &&
        col("ok_stop") && col("ok_rep"))
  }

  /** Bigram-LM familiarity scoring — the model-based quality signal of
    * CCNet (Wenzek et al., LREC'20 — public) with the external n-gram
    * LM replaced by the corpus's OWN bigram statistics, in exact
    * arithmetic: a document whose word bigrams are common across the
    * corpus reads like the corpus (high familiarity); one full of
    * never-seen-again transitions is either novel or noise. The usual
    * log-probability is deliberately replaced by integer aggregates
    * (Σ corpus-frequency, count of bigrams seen outside this doc's
    * sole occurrence) so every engine reproduces the score bit-for-bit
    * — transcendental `ln` has no cross-engine parity guarantee.
    *
    * Scale: the bigram long form is linear in corpus tokens; the model
    * is one hash aggregation over it and the scoring one join back +
    * one per-doc aggregation — the exact shape of [[noveltyScores]].
    * The long form is checkpointed once because both the model build
    * and the scoring join consume it.
    *
    * Output: (doc_id, n_bigrams, familiar_bigrams, sum_freq,
    * familiarity, avg_bigram_freq); docs with < 2 tokens have no
    * bigrams and are absent. */
  def lmFamiliarity(documents: DataFrame): DataFrame = {
    val bi = docBigrams(documents).localCheckpoint(true)
    val model = bi.groupBy(col("bigram"))
      .agg(count(lit(1)).as("c12"))
    bi.join(model, Seq("bigram"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c12") >= 2, 1L).otherwise(0L))
          .as("familiar_bigrams"),
        sum(col("c12")).as("sum_freq"))
      .select(col("doc_id"), col("n_bigrams"), col("familiar_bigrams"),
        col("sum_freq"),
        (col("familiar_bigrams").cast("double") /
          col("n_bigrams").cast("double")).as("familiarity"),
        (col("sum_freq").cast("double") /
          col("n_bigrams").cast("double")).as("avg_bigram_freq"))
  }

  /** Shannon entropy (nats) of the element distribution of `arr` —
    * over characters it is the classic gibberish/compression-ratio
    * quality signal (low = repetitive or degenerate text, high =
    * natural prose or random noise), over tokens a vocabulary-richness
    * score.
    *
    * Per-row and shuffle-free: the array sorts IN THE ROW and a single
    * HOF `aggregate` pass counts runs — no explode, no per-(doc, char)
    * aggregation rows, so a 100 TB corpus streams through at scan
    * speed like every other TextOps signal.
    *
    * Cross-engine determinism: `ln` is the one libm call two engines
    * may round differently (measured: 4 ulps-off values in the first
    * 200 000 integers), so each `ln(count)` is QUANTIZED to
    * DECIMAL(14,12) before the exact decimal accumulation
    * `Σ cᵢ·ln(cᵢ)`, and the final `ln(N) − Σ/N` combines those exact
    * decimals in IEEE double — bit-identical in any engine that
    * applies the same quantization. */
  def elementEntropy(arr: Column): Column = {
    import org.apache.spark.sql.types.DecimalType
    val dS = DecimalType(23, 12) // (14,12) · (8,0) product precision
    val term = (run: Column) =>
      (log(run.cast("double")).cast(DecimalType(14, 12)) *
        run.cast(DecimalType(8, 0))).cast(dS)
    // re-cast after each add so both when-branches (and the zero value)
    // keep the accumulator's exact declared type — values stay < 10^4,
    // far inside (23,12), so the cast never rounds
    val flushed = (acc: Column, runOverride: Column) =>
      when(runOverride > 0,
        (acc.getField("s") + term(runOverride)).cast(dS))
        .otherwise(acc.getField("s"))
    val stepped = aggregate(
      array_sort(arr),
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0).cast(dS).as("s")),
      (acc, c) => when(c === acc.getField("prev"),
        struct(acc.getField("prev").as("prev"),
          (acc.getField("run") + 1L).as("run"), acc.getField("s").as("s")))
        .otherwise(struct(c.as("prev"), lit(1L).as("run"),
          flushed(acc, acc.getField("run")).as("s"))),
      acc => flushed(acc, acc.getField("run")))
    val n = size(arr)
    when(n > 0,
      log(n.cast("double")).cast(DecimalType(14, 12)).cast("double") -
        stepped.cast("double") / n.cast("double"))
      .otherwise(lit(0.0))
  }

  /** The word-bigram relation (doc_id, bigram) shared by
    * [[lmFamiliarity]] and [[dsirWeights]]. */
  def docBigrams(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), tokens(col("text")).as("ts"))
      .where(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("ts")) - 1),
        i => concat_ws(" ", element_at(col("ts"), i),
          element_at(col("ts"), i + 1)))).as("bigram"))

  /** DSIR-style hashed n-gram importance weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling",
    * public): word bigrams feature-hash into `buckets` buckets; the
    * TARGET distribution (here the deterministic in-corpus slice
    * `targetPred`, standing in for a held-out quality corpus) and the
    * RAW pool distribution are estimated over those buckets with add-1
    * smoothing, and each document scores the log importance weight
    *   Σ_f n_f(doc) · [ln p̂_tgt(f) − ln p̂_raw(f)].
    * High weight ⇒ the document's feature profile looks like the
    * target ⇒ keep under importance resampling.
    *
    * Bucket = first two hex digits of md5(bigram) (md5-parity with any
    * engine, same dodge as MinHash); each ln is quantized to
    * DECIMAL(14,12) and the per-doc Σ accumulates exactly in decimal
    * (the ln-ulp parity dodge, see [[elementEntropy]]).
    *
    * Scale: two linear shuffles (per-doc bucket counts, global bucket
    * counts); the model is `buckets` rows — broadcast-joined, never a
    * driver collect. At 100 TB the model side stays a few KB. */
  def dsirWeights(documents: DataFrame, buckets: Int = 256,
      targetPred: Column = col("doc_id") % 5 === 0): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val bi = docBigrams(documents)
      .withColumn("f", conv(substring(md5(col("bigram")), 1, 2), 16, 10)
        .cast("int") % buckets)
    val perDoc = bi.groupBy(col("doc_id"), col("f"))
      .agg(count(lit(1)).as("n"))
    val global = perDoc
      .join(documents.select(col("doc_id"),
        targetPred.as("is_tgt")), "doc_id")
      .groupBy(col("f"))
      .agg(sum(when(col("is_tgt"), col("n")).otherwise(0L)).as("tgt"),
        sum(col("n")).as("raw"))
    // singleton totals broadcast onto the bucket model (bounded rows)
    val totals = global.agg(sum(col("tgt")).as("t_tot"),
      sum(col("raw")).as("r_tot"))
    val qln = (c: Column) => log(c.cast("double"))
      .cast(DecimalType(14, 12))
    val model = global.crossJoin(broadcast(totals))
      .select(col("f"),
        (qln(col("tgt") + 1) - qln(col("t_tot") + buckets) -
          qln(col("raw") + 1) + qln(col("r_tot") + buckets))
          .cast(DecimalType(20, 12)).as("lr"))
    perDoc.join(broadcast(model), "f")
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_features"),
        sum((col("lr") * col("n").cast(DecimalType(8, 0)))
          .cast(DecimalType(30, 12))).cast("double").as("dsir_logweight"))
  }

  /** CCNet-style quality bucketing (Wenzek et al. 2020, public): within
    * each language, documents split into head / middle / tail by LM
    * familiarity score terciles — head = most in-distribution. CCNet
    * computes the cutoffs as perplexity percentiles over the language's
    * corpus and then buckets by VALUE comparison; this does the same
    * with [[lmFamiliarity]]'s familiarity as the (inverted) score.
    *
    * Scale: the cutoff relation is one exact-percentile aggregate per
    * language — tiny output, broadcast back. Exact `percentile` keeps
    * oracle parity (quantile_cont); a 100 TB deployment swaps in
    * percentile_approx or computes cutoffs on a sample, exactly as
    * CCNet does, without touching the bucketing join. */
  def ccnetBuckets(documents: DataFrame): DataFrame = {
    // Generate barrier (the pipe_prepare_corpus pattern): the join on
    // the COMPUTED lang column would otherwise push `isnotnull(lang)`
    // below the project and re-inline the tokenizer 8× into a Filter
    // (PlanAuditSpec global invariant); explode(array(...)) is a
    // Generate node predicates cannot cross
    val lid = documents
      .withColumn("toks", explode(array(tokens(col("text")))))
      .select(col("doc_id"), langIdFromTokens(col("toks")).as("lang"))
    val fam = lmFamiliarity(documents).join(lid, "doc_id")
    val cuts = fam.groupBy(col("lang"))
      .agg(percentile(col("familiarity"), lit(1.0 / 3)).as("c_tail"),
        percentile(col("familiarity"), lit(2.0 / 3)).as("c_head"))
    fam.join(broadcast(cuts), "lang")
      .select(col("doc_id"), col("lang"), col("familiarity"),
        when(col("familiarity") > col("c_head"), "head")
          .when(col("familiarity") > col("c_tail"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Grouped-count twin of [[elementEntropy]] over a LONG-FORM
    * (id, elem) relation: entropy per id from a (id, elem) count
    * aggregation instead of a per-row sorted-run HOF.
    *
    * Same bits: run counts are identical either way, each ln(run)
    * quantizes to DECIMAL(14,12), and the Σ c·ln(c) is an exact
    * decimal sum — order-free, so the grouped aggregation equals the
    * HOF's chained accumulation digit-for-digit.
    *
    * When to prefer which: the HOF streams shuffle-free at scan speed
    * (the 100 TB default); this shape pays one (id, elem)-key shuffle
    * whose map-side combine reduces to ~|alphabet| rows per id, but
    * every operator stays inside whole-stage codegen — measured ~3×
    * faster single-node on sf0.1 documents than the interpreted
    * struct-accumulator HOF (bench r8: text_entropy 3.4 s → see
    * BASELINE.md). Output: (id, entropy, n). */
  def entropyByKey(rel: DataFrame, idCol: String,
      elemCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val runs = rel.groupBy(col(idCol), col(elemCol))
      .agg(count(lit(1)).as("run"))
    runs.groupBy(col(idCol))
      .agg(sum((log(col("run").cast("double")).cast(DecimalType(14, 12)) *
          col("run").cast(DecimalType(8, 0))).cast(DecimalType(23, 12)))
          .as("s"),
        sum(col("run")).as("n"))
      .select(col(idCol),
        (log(col("n").cast("double")).cast(DecimalType(14, 12))
            .cast("double") -
          col("s").cast("double") / col("n").cast("double"))
          .as("entropy"),
        col("n"))
  }

  /** Character-level entropy of raw text (split("") = one element per
    * UTF-16 unit; exact for the BMP). */
  def charEntropy(text: Column): Column =
    elementEntropy(split(text, ""))

  /** Token-level entropy; `toks` should be a materialized token-array
    * column (see [[tokens]]). */
  def tokenEntropyFromTokens(toks: Column): Column = elementEntropy(toks)

  /** Corpus bigram language model + per-document perplexity-style
    * scoring — the KenLM-shaped quality signal (CCNet filters on LM
    * perplexity; this is the n=2 core of it trained on the corpus
    * itself). Model: P(w₂|w₁) = (c(w₁w₂) + k) / (c(w₁·) + k·V) with
    * add-k smoothing over the bigram-start counts and vocabulary V =
    * distinct tokens. Score: per-document mean negative log-likelihood
    * of its bigrams — low = in-distribution text, high = anomalous.
    * Output: (doc_id, n_bigrams, sum_nll, avg_nll); docs with < 2
    * tokens drop.
    *
    * Determinism: each bigram's −ln P lands on a 10⁻¹² fixed-point
    * grid (⌊ln·10¹²⌋ as BIGINT) and the per-doc sum accumulates those
    * integers — order-independent and engine-exact, the kaplanMeier
    * log-grid pattern. ln() itself is bit-identical across engines on
    * these operands (pinned by the pipe_weighted_sample precedent).
    *
    * Scale: the model relations are VOCABULARY-bounded (unigram +
    * bigram counts), not corpus-bounded — two hash aggs, then two
    * word-keyed shuffle joins of the corpus bigram stream against
    * them, a 1-row V broadcast, one per-doc agg. Nothing is collected;
    * a 10⁸-type web vocabulary shuffles fine because model rows carry
    * counts, not repetition. */
  def bigramLmScores(documents: DataFrame, addK: Double = 0.5)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = documents
      .select(col("doc_id"),
        posexplode(tokens(col("text"))).as(Seq("pos", "w")))
      .where(length(col("w")) >= 1)
    val perDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bi = toks
      .withColumn("w2", lead(col("w"), 1).over(perDoc))
      .where(col("w2").isNotNull)
      .select(col("doc_id"), col("w"), col("w2"))
    val biCounts = bi.groupBy(col("w"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val uniCounts = bi.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val vocab = toks.agg(countDistinct(col("w")).as("v"))
    val p = (col("c12").cast("double") + lit(addK)) /
      (col("c1").cast("double") + lit(addK) * col("v").cast("double"))
    bi.join(biCounts, Seq("w", "w2"))
      .join(uniCounts, Seq("w"))
      .crossJoin(broadcast(vocab))
      .withColumn("nllfp", -floor(log(p) * lit(1e12)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nllfp")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        (col("s").cast("double") / lit(1e12)).as("sum_nll"),
        (col("s").cast("double") / lit(1e12) /
          col("n_bigrams").cast("double")).as("avg_nll"))
  }

  /** RAKE keyword extraction (Rose et al. 2010, public): candidate
    * phrases are maximal runs of non-stopword tokens; each word scores
    * deg(w)/freq(w) (degree = Σ length of phrases it appears in — a
    * co-occurrence proxy favoring words that live in long phrases),
    * and a phrase scores the sum of its word scores. Top-k phrases per
    * document are the keywords.
    *
    * Word scores are quantized to 1e-9 fixed point BEFORE the
    * per-phrase sum (the [[AnalyticsOps.cramersV]] determinism trick)
    * so the cross-engine reduction order cannot drift a double.
    * Phrase text is rebuilt by sorting collected (pos, word) structs —
    * collect order is never trusted. Scale: per-doc windows partition
    * by doc_id; word stats aggregate to vocabulary size; the phrase
    * relation is corpus-sized but narrow (doc, grp, text, len). */
  def rakeKeywords(documents: DataFrame, stopwords: Seq[String],
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = documents.select(col("doc_id"),
      posexplode(tokens(col("text"))).as(Seq("pos", "w")))
    val flagged = tok.withColumn("is_stop",
      col("w").isInCollection(stopwords) || length(col("w")) === 0)
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val words = flagged
      .withColumn("grp", sum(col("is_stop").cast("int")).over(wDoc))
      .where(!col("is_stop"))
      .select(col("doc_id"), col("grp"), col("pos"), col("w"))
    val phrases = words.groupBy(col("doc_id"), col("grp"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("w")))),
          s => s.getField("w")), " ").as("phrase"),
        count(lit(1)).as("n_words"))
    val wstats = words.join(phrases, Seq("doc_id", "grp"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("n_words")).as("deg"))
      .withColumn("fp", floor(col("deg").cast("double") /
        col("freq").cast("double") * lit(1e9)).cast("long"))
    val scored = words.join(wstats.select("w", "fp"), "w")
      .groupBy(col("doc_id"), col("grp"))
      .agg(sum(col("fp")).as("score_fp"))
      .join(phrases, Seq("doc_id", "grp"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score_fp").desc, col("phrase").asc)))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("phrase"), col("n_words"),
        (col("score_fp").cast("double") / lit(1e9)).as("score"))
  }

  /** Multinomial naive-Bayes token training (one-vs-rest): for each
    * class (language), the top-k tokens by Laplace-smoothed likelihood
    * ratio p(w|class)/p(w|¬class) — the per-class weight table an NB
    * classifier ships, and the standard "which tokens define this
    * slice" report. The ratio is kept as a RATIO (two IEEE divisions
    * and one quotient over exact integer counts) instead of a log-odds
    * sum: libm log differs in the last ulp across engines, a pure
    * rational of exact integers does not — same ranking, hash-stable.
    *
    * Scale: one map-side-combined (class, token) count, token-keyed
    * join against vocabulary totals, class totals broadcast (|classes|
    * rows), grand totals broadcast (1 row); the top-k window partitions
    * BY CLASS over the vocabulary-sized relation — never corpus rows. */
  def naiveBayesTokens(documents: DataFrame, classCol: String,
      k: Int, minCount: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = documents
      .select(col(classCol).as("cls"), explode(tokens(col("text"))).as("w"))
    val lt = tok.groupBy(col("cls"), col("w"))
      .agg(count(lit(1)).as("c_lt"))
    val perCls = lt.groupBy(col("cls")).agg(sum(col("c_lt")).as("t_l"))
    val perTok = lt.groupBy(col("w")).agg(sum(col("c_lt")).as("c_t"))
    val tot = lt.agg(countDistinct(col("w")).as("v"),
      sum(col("c_lt")).as("t_all"))
    val num = (col("c_lt") + lit(1)).cast("double") /
      (col("t_l") + col("v")).cast("double")
    val den = (col("c_t") - col("c_lt") + lit(1)).cast("double") /
      (col("t_all") - col("t_l") + col("v")).cast("double")
    val ranked = lt.join(perTok, "w")
      .join(broadcast(perCls), "cls")
      .crossJoin(broadcast(tot))
      .where(col("c_lt") >= minCount)
      .withColumn("ratio", num / den)
      .withColumn("rank", row_number().over(Window.partitionBy(col("cls"))
        .orderBy(col("ratio").desc, col("w").asc)))
    ranked.where(col("rank") <= k)
      .select(col("cls"), col("rank"), col("w").as("token"),
        col("c_lt"), col("ratio"))
  }

  /** Robust winnowing fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm): positional word k-grams are
    * hashed (md5, compared lexicographically — a total order shared
    * with the oracle), and each window of `w` consecutive gram hashes
    * contributes its minimum; the distinct selected hashes are the
    * document's fingerprint set. Guarantees: any shared run of
    * ≥ w+k−1 words between two documents shares ≥ 1 fingerprint, while
    * storing only ~2/(w+1) of all gram hashes — the density/recall
    * trade the plagiarism/contamination literature standardized on.
    *
    * Per-row HOF pipeline (split → gram → hash → window-min → distinct)
    * with NO shuffle before the final per-doc reduction — at 100 TB the
    * fingerprint stats stream at parquet-scan speed, and the selected
    * set is the (small) thing you'd ship to a contamination index.
    * Documents shorter than k words degrade to one whole-text gram. */
  def winnowingFingerprints(documents: DataFrame, k: Int, w: Int)
      : DataFrame = {
    val grams =
      s"""CASE WHEN size(__toks) < $k THEN
         |  array(array_join(__toks, ' '))
         |ELSE transform(sequence(1, size(__toks) - ${k - 1}),
         |  i -> array_join(slice(__toks, i, $k), ' ')) END""".stripMargin
    documents
      .withColumn("__toks", tokens(col("text")))
      .withColumn("__hashes",
        expr(s"transform($grams, g -> md5(cast(g as binary)))"))
      .withColumn("__fps", expr(
        s"""array_distinct(transform(
           |  sequence(1, greatest(1, size(__hashes) - ${w - 1})),
           |  j -> array_min(slice(__hashes, j, $w))))""".stripMargin))
      .select(col("doc_id"),
        size(col("__hashes")).as("n_grams"),
        greatest(lit(1), size(col("__hashes")) - lit(w - 1))
          .as("n_windows"),
        size(col("__fps")).as("n_fp"),
        array_min(col("__fps")).as("fp_min"),
        array_max(col("__fps")).as("fp_max"))
  }

  /** Vocabulary-richness diagnostics over the whole corpus: Chao1
    * (Chao 1984 — public; the species-richness lower bound ecology
    * uses, applied to types-vs-tokens) and the Good–Turing unseen
    * mass (Good 1953 — public). Both read off the frequency-of-
    * frequencies: with V observed types, f₁ singletons, f₂ doubletons
    * and M total tokens,
    *   chao1 = V + f₁·(f₁−1) / (2·(f₂+1))   (bias-corrected form —
    *           defined even when no doubletons exist)
    *   unseen_mass = f₁ / M                 (the Good–Turing estimate
    *           of how much probability the corpus has NOT seen yet)
    * The pair answers the two questions a data curator asks before
    * scaling a source: how big is this vocabulary really, and how
    * fast is it still growing. All counts exact; the only IEEE steps
    * are the two final divisions.
    *
    * Scale: tokens collapse to per-type counts in one map-side-
    * combined aggregation, the type relation collapses to ONE row in
    * a second — the corpus never shuffles, only (type, count). */
  def vocabRichness(documents: DataFrame): DataFrame = {
    val tf = documents
      .select(explode(tokens(col("text"))).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
    tf.agg(count(lit(1)).as("vocab"),
        sum(col("tf")).as("tokens"),
        sum(when(col("tf") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("tf") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("vocab"), col("tokens"), col("f1"), col("f2"),
        // f1 squares in DECIMAL(38,0) — a web-scale singleton count
        // would overflow the long product
        (col("vocab").cast("double") +
          (col("f1").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
            (col("f1").cast(org.apache.spark.sql.types.DecimalType(38, 0)) -
              lit(1L))).cast("double") /
            (lit(2L) * (col("f2") + lit(1L))).cast("double"))
          .as("chao1"),
        (col("f1").cast("double") / col("tokens").cast("double"))
          .as("unseen_mass"))
  }
}
