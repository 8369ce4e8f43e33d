package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics operators a large-scale training-data pipeline needs
  * beyond the reference's surface: sessionization, vocabulary/term
  * statistics, deterministic sampling, bucketed histograms.
  *
  * Scale notes: sessionization is ONE shuffle (partition by user) and a
  * linear per-partition pass (lag + running sum — Spark executes window
  * frames without re-sorting when the partition ordering is shared);
  * vocabulary is explode + one hash agg; samplers are hash-predicates
  * that push into the scan and need no shuffle at all.
  */
object PipelineOps {

  /** Attrition funnel over an ordered chain of filter stages — the
    * audit every corpus-prep run ships with: how many documents
    * survive stage 1, stages 1∧2, 1∧2∧3, … Each input row carries one
    * boolean column per stage (computed upstream, joins included);
    * this operator is the ONE conditional aggregation that folds them
    * into `len(stages)+1` rows: (stage_idx, stage, n,
    * share_of_input), stage 0 = "all" = the unfiltered count, and
    * `n` at stage i counts rows passing ALL stages ≤ i — cumulative
    * by construction, so the funnel can only narrow.
    *
    * Scale: a single full-scan aggregate with map-side partial
    * combine, independent of stage count; the explode at the end acts
    * on one already-aggregated row. Null stage flags count as false
    * (an unjoined doc did not pass). Share = one double division. */
  def filterFunnel(df: DataFrame, stageCols: Seq[String]): DataFrame = {
    require(stageCols.nonEmpty, "at least one stage required")
    val conj = stageCols.scanLeft(lit(true))(
      (acc, c) => acc && coalesce(col(c), lit(false))).drop(1)
    val aggs = count(lit(1)).as("n_0") +: conj.zipWithIndex.map {
      case (p, i) => count(when(p, lit(1))).as(s"n_${i + 1}") }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val names = "all" +: stageCols
    row.select(col("n_0").as("n0"),
        explode(array(names.zipWithIndex.map { case (nm, i) =>
          struct(lit(i.toLong).as("stage_idx"), lit(nm).as("stage"),
            col(s"n_$i").as("n")) }: _*)).as("e"))
      .select(col("e.stage_idx").as("stage_idx"), col("e.stage").as("stage"),
        col("e.n").as("n"),
        (col("e.n").cast("double") / col("n0").cast("double"))
          .as("share_of_input"))
  }

  /** Gap-based sessionization of an event stream: a new session starts
    * when the user's inter-event gap exceeds `gapMinutes`. Returns one
    * row per session with bounds and counts. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val marked = events
      .withColumn("__prev", lag(unix_micros(col(tsCol)), 1).over(order))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col(tsCol)) - col("__prev") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new"))
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    marked.groupBy(col(userCol), col("session_idx"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Per-session navigation paths and their frequencies — the path-
    * mining primitive behind funnel discovery and UX analysis: every
    * session (same gap rule as [[sessionize]]) reduces to the ordered
    * `>`-joined sequence of its event types, and identical paths
    * aggregate corpus-wide.
    *
    * The path builds WITHOUT an extra window pass: `collect_list` of
    * (ts, id, type) structs per session, sorted in-row (struct
    * lexicographic order ≡ the session's event order because ids are
    * unique) — deterministic under any partitioning, one shuffle to
    * the session key beyond the tagging window's user shuffle, and the
    * per-path count is a tiny aggregation over distinct paths. Output:
    * (path, n) — callers top-k it. */
  def sessionPaths(events: DataFrame, gapMinutes: Int = 30,
      userCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    val tagged = events
      .withColumn("__prev", lag(unix_micros(col(tsCol)), 1).over(order))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_micros(col(tsCol)) - col("__prev") > gapUs, 1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new"))
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    tagged.groupBy(col(userCol), col("__sid"))
      .agg(concat_ws(">", transform(
        sort_array(collect_list(struct(col(tsCol).as("t"),
          col(idCol).as("i"), col(typeCol).as("e")))),
        x => x.getField("e"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
  }

  /** Vocabulary statistics over a document corpus: term frequency and
    * document frequency per token, top-N by TF (token tie-break). */
  def vocabulary(documents: DataFrame, topN: Int = 100): DataFrame = {
    val toks = documents.select(col("doc_id"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
    toks.groupBy(col("token"))
      .agg(count(lit(1)).as("tf"),
        countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(topN)
  }

  /** Deterministic hash sample: keep rows whose md5(key) starts below the
    * given 2-hex-digit threshold — reproducible in any engine, no RNG,
    * pushes down as a plain predicate. `threshold` "14" ≈ 7.8%. */
  def hashSample(df: DataFrame, keyCol: String,
      thresholdHex: String = "14"): DataFrame =
    df.where(substring(md5(col(keyCol).cast("string")), 1, 2) <
      lit(thresholdHex))

  /** Deterministic stratified sample: at most `perStratum` rows per
    * stratum, chosen by hash order (reproducible shuffle-free ranking
    * within each stratum partition). */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
      perStratum: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= perStratum).drop("__rn")
  }

  /** Temperature-weighted source mixing — the multi-corpus composition
    * step of an LLM data pipeline (sample sources ∝ nᵅ, α < 1, the
    * standard low-resource-upweighting trick from multilingual
    * training): allocate `totalN` slots across the values of
    * `groupCol` proportional to `sqrt(n_group)` (α = ½ — the one
    * exponent whose power function, IEEE `sqrt`, is CORRECTLY ROUNDED
    * everywhere, so the shares reproduce bit-for-bit in any engine),
    * then fill each group's slots in deterministic md5 order.
    *
    * Seat allocation is largest-remainder (Hamilton): `⌊totalN·sᵍ/S⌋`
    * seats up front, leftovers to the largest fractional remainders
    * (ties by group value). The share denominator `S = Σ sqrt(n)` is a
    * float sum, so it is computed as an EXPLICIT LEFT FOLD over the
    * group-sorted share array (`aggregate` over `sort_array(collect_
    * list(...))`) — never a parallel aggregation whose addition order
    * could vary run-to-run or engine-to-engine.
    *
    * A group's allocation caps at its size (no redistribution — the
    * shortfall is visible to the caller by row count). Group
    * cardinality is assumed driver-small (languages, corpora), but the
    * SELECTION never leaves the cluster: targets broadcast back and
    * each group fills by one rank window. Output: one row per selected
    * doc (`groupCol`, target, keyCol). */
  def sourceMix(df: DataFrame, groupCol: String, keyCol: String,
      totalN: Int): DataFrame = {
    val weighted = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .select(col(groupCol), col("n"),
        sqrt(col("n").cast("double")).as("s"))
    selectByTargets(df,
      largestRemainderTargets(weighted, groupCol, totalN),
      groupCol, keyCol)
  }

  /** Largest-remainder seat apportionment over per-group weights:
    * `weighted` = (groupCol, n, s) with s ≥ 0 the group's weight.
    * Quotas are totalN·s/Σs with Σs an EXPLICIT LEFT FOLD over the
    * group-sorted weight array (never a parallel float sum whose
    * addition order could vary run-to-run or engine-to-engine); floors
    * allocate first, remainders rank for the leftovers, and a group's
    * target caps at its size. The seat-rank window's input is one row
    * per GROUP — bounded by group cardinality, never the corpus. */
  private[graft] def largestRemainderTargets(weighted: DataFrame,
      groupCol: String, totalN: Int): DataFrame = {
    val folded = weighted
      .agg(sort_array(collect_list(struct(col(groupCol).as("g"),
        col("s"), col("n")))).as("gs"))
      .select(col("gs"),
        aggregate(transform(col("gs"), x => x.getField("s")),
          lit(0.0), (acc, x) => acc + x).as("ssum"))
    val shares = folded
      .select(explode(col("gs")).as("e"), col("ssum"))
      .select(col("e.g").as(groupCol), col("e.n").as("n"),
        (lit(totalN.toDouble) * col("e.s") / col("ssum")).as("quota"))
    val based = shares
      .withColumn("base", floor(col("quota")))
      .withColumn("rem", col("quota") - col("base").cast("double"))
    val leftover = based.agg((lit(totalN.toLong) - sum(col("base")))
      .as("leftover"))
    based.crossJoin(broadcast(leftover))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col(groupCol).asc)))
      .select(col(groupCol),
        least(col("base") + when(col("rk") <= col("leftover"), 1L)
          .otherwise(0L), col("n")).as("target"))
  }

  /** Deterministic per-group fill against broadcast targets: each
    * group takes its first `target` keys in md5-hash order. */
  private def selectByTargets(df: DataFrame, targets: DataFrame,
      groupCol: String, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.select(col(groupCol), col(keyCol))
      .join(broadcast(targets), Seq(groupCol))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= col("target"))
      .select(col(groupCol), col("target"), col(keyCol))
  }

  /** Neyman-allocation stratified sampling (Neyman 1934 — public):
    * stratum h gets seats ∝ N_h·σ_h, the allocation minimizing the
    * estimator variance for a fixed budget — the principled upgrade
    * over proportional or √n splits when strata differ in spread.
    * `valueCol` must be INTEGRAL: N·σ = √(n·Σx² − (Σx)²) is computed
    * from exact DECIMAL(38,0) power sums — the same stance as
    * autocorrelation / ts_ar2, and the one that stays exact where
    * plain Long sums would silently wrap (1e9 rows of 1e4-scale
    * values puts n·Σx² near 1e26) while the oracle's HUGEINT
    * diverges — so both the weight and the quota are bit-reproducible
    * cross-engine (the cleared variance term is cast to double ONCE,
    * for the final sqrt). Selection within a stratum is the
    * deterministic md5-order fill. */
  def neymanSample(df: DataFrame, groupCol: String, keyCol: String,
      valueCol: String, totalN: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val vd = col(valueCol).cast(DecimalType(18, 0))
    val weighted = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(vd).cast(dec).as("sx"),
        sum((vd * vd).cast(dec)).as("sxx"))
      .select(col(groupCol), col("n"),
        sqrt((col("n").cast(dec) * col("sxx") - col("sx") * col("sx"))
          .cast("double")).as("s"))
    selectByTargets(df,
      largestRemainderTargets(weighted, groupCol, totalN),
      groupCol, keyCol)
  }

  /** Fixed-width bucket histogram of a numeric column. */
  def histogram(df: DataFrame, valueCol: String,
      bucketWidth: Double): DataFrame =
    df.groupBy(floor(col(valueCol) / lit(bucketWidth)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_low", col("bucket") * lit(bucketWidth))

  /** Greedy-contiguous sequence packing for training-batch assembly:
    * documents, in deterministic order WITHIN a shard, land in fixed
    * token-budget bins by running token count — a doc whose cumulative
    * window starts at offset o goes to bin floor(o / budget). This is
    * the distributed form of "pack docs into ≤B-token sequences": one
    * window pass per shard, no sequential loop. A doc may straddle a
    * bin boundary (its bin is decided by its starting offset) — the
    * standard approximation that keeps packing embarrassingly parallel.
    *
    * Scale: the window partitions by `shardCol`, so 100 TB packs as
    * thousands of independent shards; an unsharded global pack would
    * funnel the corpus through one task — deliberately not offered. */
  def packSequences(documents: DataFrame, tokenBudget: Long,
      shardCol: String, orderCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    documents
      .select(col(shardCol), col(orderCol),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("seq_id",
        floor((col("cum_tokens") - col("n_tokens")).cast("double") /
          lit(tokenBudget.toDouble)).cast("long"))
      .withColumn("seq_offset",
        col("cum_tokens") - col("n_tokens") - col("seq_id") * tokenBudget)
  }

  /** Quality-ranked token-budget selection: rank documents by quality
    * (desc, doc_id tie-break) and keep the prefix whose cumulative token
    * count fits the budget — "give me the best B tokens of this corpus".
    * The ranking shuffle carries only (quality, id, n_tokens) triples,
    * never text — and neither the rank nor the running sum ever funnels
    * through one task: the rank is [[globalRankByValue]]'s bucket
    * decomposition (quality ∈ [0, 1] by construction of the score) and
    * the cumulative token count is
    * [[RelationalOps.distributedPrefixSum]] over that rank — the
    * two-phase parallel scan, exact and identical to the global window
    * because rank order refines bucket order. */
  def tokenBudgetSelect(documents: DataFrame, tokenBudget: Long): DataFrame = {
    val scored = documents
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(col("doc_id"),
        TextOps.qualityScoreFromTokens(col("text"), col("toks"))
          .as("quality"),
        size(col("toks")).cast("long").as("n_tokens"))
    val ranked = globalRankByValue(scored, "quality", "doc_id")
    RelationalOps.distributedPrefixSum(ranked, "rank", "n_tokens")
      .withColumnRenamed("cum", "cum_tokens")
      .where(col("cum_tokens") <= tokenBudget)
      .select(col("doc_id"), col("quality"), col("n_tokens"),
        col("cum_tokens"))
  }

  /** Deterministic mixture interleave: merge per-source document
    * streams at relative weights WITHOUT RNG — the corpus-mixing step
    * of a training pipeline, reproducible run-to-run. Doc number i of
    * source s (1-based rank in deterministic order) gets mix position
    * i / weight_s; consuming the output ordered by (position, source,
    * doc) yields each source at its weight's rate. One window per
    * source partition; no global shuffle is imposed on the caller —
    * the position column IS the interleave order. */
  def interleaveByWeight(documents: DataFrame, sourceCol: String,
      weightFor: Column, orderCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(orderCol))
    documents
      .select(col(sourceCol), col(orderCol))
      .withColumn("src_rank", row_number().over(w).cast("long"))
      .withColumn("mix_pos", col("src_rank").cast("double") / weightFor)
  }

  /** Benchmark-contamination check: count the w-gram shingles each
    * corpus document shares with a benchmark set, flagging docs at or
    * above `minOverlap` — the standard "is my training data leaking the
    * eval set" sweep. The benchmark's distinct shingle digests are
    * small by construction (eval sets are), so they broadcast; the
    * corpus side streams through the scan, and only (doc_id, digest)
    * pairs that actually hit reach the counting agg. */
  /** Sliding-window document chunking: split each text into
    * `chunkChars`-character windows advancing by `strideChars`
    * (overlap = chunk − stride), the context-window preparation step
    * between raw documents and sequence packing. Character-based on
    * purpose — tokenizer-free, so the chunk boundaries are engine-
    * independent; run token counting on the chunks afterwards.
    *
    * A doc shorter than one chunk yields exactly one (possibly short)
    * chunk; otherwise enough windows that the last one reaches the
    * end (final window may be short). Chunk counts use integral
    * ceil-division — no IEEE math near boundary lengths. Projection-
    * only (scan → explode → substr): no shuffle at any width. */
  def chunkDocuments(documents: DataFrame, chunkChars: Int,
      strideChars: Int): DataFrame = {
    require(strideChars > 0 && chunkChars >= strideChars,
      "windows must advance and overlap non-negatively")
    documents
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          when(length(col("text")) <= chunkChars, lit(0))
            .otherwise(expr(s"(length(text) - $chunkChars " +
              s"+ $strideChars - 1) div $strideChars")))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        expr(s"substr(text, chunk_idx * $strideChars + 1, $chunkChars)")
          .as("chunk"))
      .withColumn("n_chars", length(col("chunk")))
  }

  def contaminationCheck(corpus: DataFrame, benchmark: DataFrame,
      w: Int = 3, minOverlap: Long = 1L): DataFrame = {
    // raw-shingle equality — no md5 pass over either side
    val benchSh = Dedup.docShinglesRaw(benchmark, w)
      .select(col("shingle")).distinct()
    Dedup.docShinglesRaw(corpus, w)
      .join(broadcast(benchSh), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .where(col("n_overlap") >= minOverlap)
  }

  /** Exact global rank WITHOUT a single-partition window, by bucket
    * decomposition (the ranking twin of
    * [[RelationalOps.distributedPrefixSum]]): rows bucket by a range
    * split of `valueCol`, each bucket ranks locally in parallel, and
    * the cross-bucket offset is a running count over the per-bucket
    * totals — a bounded relation that broadcasts. Rank order is
    * (`valueCol` DESC, `idCol` ASC); output adds `rank` (1-based).
    * `valueCol` must lie in [0, 1] (quality scores; rescale upstream
    * otherwise). */
  def globalRankByValue(df: DataFrame, valueCol: String, idCol: String,
      nBuckets: Int = 20): DataFrame = {
    val b = least(floor(col(valueCol) * nBuckets), lit(nBuckets - 1))
    val bucketed = df.withColumn("_b", b)
    // offsets: how many rows sit in STRICTLY higher buckets
    val offsets = bucketed.groupBy(col("_b"))
      .agg(count(lit(1)).as("_bn"))
      .withColumn("_off", coalesce(
        sum(col("_bn")).over(Window.orderBy(col("_b").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_b"), col("_off"))
    val local = Window.partitionBy(col("_b"))
      .orderBy(col(valueCol).desc, col(idCol).asc)
    bucketed.join(broadcast(offsets), Seq("_b"))
      .withColumn("rank", col("_off") + row_number().over(local))
      .drop("_b", "_off")
  }

  /** Curriculum sharding: quality-ranked round-robin assignment of
    * documents to `nShards` shards — every shard receives the same
    * difficulty distribution (rank i goes to shard i mod n at position
    * i div n), which is what curriculum or difficulty-stratified
    * training loaders consume. Deterministic and scale-safe: the
    * global rank comes from [[globalRankByValue]]'s bucket
    * decomposition, never a single-partition sort. */
  def curriculumShards(scored: DataFrame, qualityCol: String,
      idCol: String, nShards: Int): DataFrame =
    globalRankByValue(scored, qualityCol, idCol)
      .withColumn("shard", ((col("rank") - 1) % nShards).cast("int"))
      .withColumn("pos_in_shard",
        expr(s"CAST((rank - 1) div $nShards AS INT)"))

  /** Systematic probability-proportional-to-size sampling: `k` evenly
    * spaced slots sweep the cumulative weight axis, and a row is drawn
    * once per slot boundary it spans — the classic PPS design (weight-
    * proportional inclusion, zero variance in sample size, at most one
    * draw per row when every weight ≤ total/k). Deterministic: no RNG,
    * the draw set is a pure function of (`idCol` order, weights, k).
    *
    * A row with prefix range `(cum − w, cum]` is drawn iff
    * `⌊cum·k/W⌋ > ⌊(cum − w)·k/W⌋` — all BIGINT arithmetic, so the
    * selection reproduces bit-for-bit in any engine (`W·k` must stay
    * under 2^63; widen to decimal beyond that). The cumulative weights
    * come from [[RelationalOps.distributedPrefixSum]] — the two-phase
    * parallel scan — so nothing funnels through one task at corpus
    * scale. Output: drawn rows with `cum` and the slot index. */
  def ppsSystematicSample(df: DataFrame, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    val withCum = RelationalOps.distributedPrefixSum(df, idCol, weightCol)
    val tot = withCum.agg(max(col("cum")).as("_w_total"))
    withCum.crossJoin(broadcast(tot))
      .withColumn("_hi_slot",
        expr(s"(cum * ${k.toLong}) div _w_total"))
      .withColumn("_lo_slot",
        expr(s"((cum - $weightCol) * ${k.toLong}) div _w_total"))
      .where(col("_hi_slot") > col("_lo_slot"))
      .withColumn("slot", col("_lo_slot"))
      .drop("_w_total", "_hi_slot", "_lo_slot")
  }

  /** BPE merge TRAINING (Sennrich et al. 2016, public) — `rounds` full
    * merge iterations, not just the seed pair count (pipe_bpe_pairs):
    * the corpus collapses to its word-frequency vocabulary, every word
    * starts as its character sequence, and each round (1) counts every
    * adjacent symbol pair weighted by word frequency, (2) picks the
    * most frequent pair — ties to the lexicographically smallest
    * (a, b), no randomness — and (3) merges it GREEDILY LEFT-TO-RIGHT,
    * non-overlapping, in every word. Returns the learned merge table
    * (round, sym_a, sym_b, pair_count) — the artifact a tokenizer
    * trainer actually ships.
    *
    * Scale: the working set after the first aggregation is the
    * VOCABULARY (words × counts), orders of magnitude smaller than the
    * corpus and localCheckpoint'ed once per round; per round one pair
    * aggregation over Σ|word| rows and ONE driver row (the argmax —
    * TakeOrderedAndProject, the codebook-collect pattern). The merge
    * itself is a per-row codegen'd fold — no shuffle. */
  def bpeMerges(documents: DataFrame, rounds: Int): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    bpeTrain(documents, rounds)._1
      .toDF("round", "sym_a", "sym_b", "pair_count")
  }

  /** BPE training core shared by [[bpeMerges]] (ships the merge table)
    * and [[bpeEncode]] (ships the tokenized corpus): returns the merge
    * list AND the final vocabulary state (word, merged symbol array,
    * frequency) — i.e. each distinct word's trained segmentation.
    *
    * Corpus assumption (documented for oracle parity): symbols are
    * compared per UTF-16 unit on the engine side and per codepoint by
    * the DuckDB oracle, and the oracle's replace-encoding uses the
    * 0x1E/0x1F control chars as sentinels — the documents corpus is
    * ASCII/BMP text free of those control chars, which makes the two
    * tokenizations identical. Non-BMP or control-char corpora would
    * need a pre-strip on both sides. */
  private[graft] def bpeTrain(documents: DataFrame, rounds: Int)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    val spark = documents.sparkSession
    import spark.implicits._
    var words = documents
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .where(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(col("w"), split(col("w"), "").as("syms"), col("n"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val top = words
        .where(size(col("syms")) >= 2)
        .select(explode(transform(
          sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("p"), col("n"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("a").asc, col("b").asc)
        .limit(1).as[(String, String, Long)].collect()
      if (top.nonEmpty) {
        val (a, b, c) = top.head
        merges += ((r, a, b, c))
        // greedy left-to-right non-overlapping merge, one per-row fold
        val folded = aggregate(
          sequence(lit(1), size(col("syms"))),
          struct(typedLit(Seq.empty[String]).as("out"),
            lit(false).as("skip")),
          (acc, i) => {
            val cur = element_at(col("syms"), i)
            val nxt = element_at(col("syms"), i + 1)
            when(acc.getField("skip"),
              struct(acc.getField("out").as("out"), lit(false).as("skip")))
              .when(i < size(col("syms")) && cur === lit(a) &&
                  nxt === lit(b),
                struct(concat(acc.getField("out"),
                  array(lit(a + b))).as("out"), lit(true).as("skip")))
              .otherwise(struct(concat(acc.getField("out"),
                array(cur)).as("out"), lit(false).as("skip")))
          },
          acc => acc.getField("out"))
        words = words.withColumn("syms", folded).localCheckpoint(true)
      }
    }
    (merges.toSeq, words)
  }

  /** BPE ENCODE — the consuming half of the tokenizer loop: train the
    * merge table ([[bpeTrain]]), then tokenize the corpus with it and
    * report per-document token statistics (doc_id, n_words, n_tokens).
    * n_tokens is the post-merge symbol count — the number a data
    * pipeline budgets against (token quotas, packing, pricing).
    *
    * Scale: the trained segmentation lives on the VOCABULARY relation
    * (distinct word → |merged symbols|) — corpus-independent size — so
    * encoding is a word-keyed map join plus one per-doc aggregation.
    * The vocabulary broadcasts here (far below threshold); at 100 TB a
    * heavy-tailed web vocabulary can reach 10⁸ entries, where the swap
    * is the plain shuffle hash join on `w` (both sides word-keyed, no
    * skew — frequencies live in counts, not row multiplicity of the
    * vocab side). No driver state beyond the merge table itself. */
  def bpeEncode(documents: DataFrame, rounds: Int): DataFrame = {
    val (_, vocab) = bpeTrain(documents, rounds)
    val wordTokens = vocab
      .select(col("w"), size(col("syms")).cast("long").as("wtoks"))
    documents
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
      .where(length(col("w")) >= 1)
      .join(broadcast(wordTokens), "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("wtoks")).as("n_tokens"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * every row draws a deterministic uniform u ∈ (0,1) from md5 of its
    * id and scores `es_key = ln(u) / w` — the k LARGEST keys are
    * distributed exactly like a sequential weighted draw-without-
    * replacement (the u^(1/w) order statistic, in log space so large
    * weights don't underflow). Deterministic: u is a pure function of
    * the id (first 8 md5 hex digits → uint32, midpoint-offset to dodge
    * 0), so the sample is reproducible across runs and engines.
    *
    * Scale: one narrow projection computes the key per row; the only
    * global step is the top-k itself, which Catalyst plans as
    * TakeOrderedAndProject (per-partition heaps, k rows to the driver
    * stage — no global sort, no shuffle of the corpus). This is the
    * sampler to use when inclusion probability must follow a size
    * measure (importance-weighted corpus subsetting) but the PPS
    * systematic design ([[ppsSystematicSample]])'s fixed skip pattern
    * is unwanted. */
  def weightedReservoirSample(df: DataFrame, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    val v = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long")
    val u = (v.cast("double") + lit(0.5)) / lit(4294967296.0)
    df.where(col(weightCol) > 0)
      .select(col(idCol), col(weightCol),
        (log(u) / col(weightCol).cast("double")).as("es_key"))
      .orderBy(desc("es_key"), col(idCol))
      .limit(k)
  }

  /** T5-style span-corruption PLAN: decide per-token mask flags from a
    * deterministic hash of (doc_id, position) at `rate` (percent), and
    * report the denoising-objective accounting per document — token
    * count, masked-token count, number of contiguous masked SPANS
    * (each span becomes one sentinel in the corrupted input), and the
    * resulting input/target lengths (input = kept tokens + one
    * sentinel per span; target = masked tokens + one sentinel per
    * span). The mask itself is a pure function of content position, so
    * the plan is reproducible and the oracle can replay it.
    *
    * Scale: tokenize → posexplode → one per-token hash + lag — all
    * embarrassingly parallel; the span count is a boundary count
    * (mask ∧ ¬prev_mask) under a per-document window (partition key =
    * doc_id, never global), then one aggregation per document. No
    * joins, no driver state. */
  def spanCorruptionPlan(documents: DataFrame, rate: Int): DataFrame = {
    val toks = documents
      .select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
      .where(length(col("tok")) >= 1)
    val h = conv(substring(
      md5(concat(col("doc_id").cast("string"), lit(":"),
        col("pos").cast("string"))), 1, 8), 16, 10).cast("long")
    val perDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    toks
      .withColumn("m", (h % 100 < rate).cast("long"))
      .withColumn("start",
        (col("m") === 1 &&
          coalesce(lag(col("m"), 1).over(perDoc), lit(0L)) === 0L)
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("m")).as("n_masked"),
        sum(col("start")).as("n_spans"))
      .select(col("doc_id"), col("n_tokens"), col("n_masked"),
        col("n_spans"),
        (col("n_tokens") - col("n_masked") + col("n_spans"))
          .as("input_len"),
        (col("n_masked") + col("n_spans")).as("target_len"))
  }

  /** Leakage-free train/val/test split: assignment is a deterministic
    * hash of the document's NEAR-DUP CLUSTER representative, not of
    * the document itself — so two near-duplicate documents can never
    * land in different splits (the eval-set contamination every
    * held-out benchmark audit hunts for; splitting by doc hash alone
    * leaks ~every duplicated document across the boundary).
    *
    * `clusterReps` is (doc_id, cluster_rep) from
    * [[Dedup.connectedComponents]] over whatever near-dup pair
    * generator the pipeline trusts; unpaired documents are their own
    * singleton cluster (coalesce). The split coin is the first two
    * md5 hex chars of the rep — 8 bits, matched against 204/230
    * (≈ 80/10/10) — the same engine-agnostic integer-threshold
    * construction as the bootstrap/DP coins. Per-row after the
    * cluster join; the join broadcasts when the pair graph is small
    * (its usual state — it is bounded by the duplicate count). */
  def leakageSplit(documents: DataFrame, clusterReps: DataFrame)
      : DataFrame = {
    val hv: Column => Column =
      c => ascii(c) - when(ascii(c) >= 97, 87).otherwise(48)
    val joined = documents.select(col("doc_id"))
      .join(clusterReps.select(col("doc_id"), col("cluster_rep")),
        Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("cluster_rep"), col("doc_id")))
    val h = md5(concat(lit("split:"), col("rep").cast("string")))
    val u = hv(substring(h, 1, 1)) * 16 + hv(substring(h, 2, 1))
    joined.select(col("doc_id"), col("rep"),
      when(u < 204, "train").when(u < 230, "val").otherwise("test")
        .as("split"))
  }

  /** Epoch-repetition accounting for data-constrained training (the
    * regime of Muennighoff et al. 2023, "Scaling Data-Constrained
    * Language Models" — public): each source gets an EQUAL share of
    * the character budget; a source smaller than its share must repeat
    * (epochs capped at `maxEpochs` — repeated data decays in value),
    * and the EFFECTIVE yield discounts epoch k by δᵏ with δ = ½ — a
    * rational stand-in for the paper's fitted exponential decay, so
    * the discount arithmetic is exact powers of two both engines
    * reproduce bit-for-bit (full epochs: U·(2 − 2/2ᵉ); the partial
    * epoch adds frac/2ᵉ — no libm exp/pow anywhere).
    *
    * Per-source columns: unique chars U, target share, epochs needed
    * (⌈target/U⌉ capped), served chars min(target, U·epochs), full
    * epochs e = served div U, and effective chars. One count + one
    * group-aggregation; everything after is per-GROUP arithmetic. */
  def repeatBudget(documents: DataFrame, sourceCol: String,
      budgetChars: Long, maxEpochs: Int = 4): DataFrame = {
    require(maxEpochs >= 1 && maxEpochs <= 62, s"bad cap $maxEpochs")
    val perSource = documents
      .groupBy(col(sourceCol))
      .agg(sum(length(col("text")).cast("long")).as("u"))
    val k = perSource.agg(count(lit(1)).as("k"))
    perSource.crossJoin(broadcast(k))
      // `div` is the INTEGER division — Spark's `/` on longs is true
      // division and would smuggle a double into the accounting
      .withColumn("target", expr(s"${budgetChars}L div k"))
      .withColumn("epochs",
        least(expr("(target + u - 1) div u"), lit(maxEpochs.toLong)))
      .withColumn("served",
        least(col("target"), col("u") * col("epochs")))
      .withColumn("e", expr("served div u"))
      .withColumn("frac", col("served") % col("u"))
      .withColumn("p", expr("cast(shiftleft(1L, cast(e as int)) as double)"))
      .select(col(sourceCol), col("u"), col("target"), col("epochs"),
        col("served"),
        (col("u").cast("double") * (lit(2.0) - lit(2.0) / col("p")) +
          col("frac").cast("double") / col("p")).as("effective_chars"))
  }
}
