package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnalyticsOps, Dedup, GraphOps, PipelineOps, RelationalOps, Similarity, TextOps}

/** Scale-stress harness: measures the heavy operator families on
  * synthetic corpora at 1×/10×/100× the sf0.1 size, reporting wall
  * time and — for the banded/bucketed candidate generators — the
  * candidate-pair occupancy. The point is the claim plan audits at
  * sf0.1 cannot prove: that wall time grows near-LINEARLY and
  * candidate pairs stay sub-quadratic as the corpus grows, because
  * candidate generation is banded/bucketed/prefix-filtered rather
  * than all-pairs.
  *
  * Generator density model (documented in SCALE.md): corpora grow the
  * way real ones do — new documents bring new n-grams and new
  * clusters, so per-bucket occupancy stays bounded while bucket count
  * scales. Near-duplicate structure is explicit: documents come in
  * families of ~8 sharing a mutated base word sequence; embeddings in
  * clusters of 16 around shared centers. All content derives from
  * xxhash64 of (tag, ids) — deterministic, seedless, reproducible.
  *
  * Usage: `runMain graft.ScaleStress [scales]` with `scales` a comma
  * list of multipliers (default `1,10`); each line of output is one
  * JSON record `{"family":…,"scale":…,"rows":…,"sec":…,
  * "candidates":…}`.
  */
object ScaleStress {

  private def h(tag: String, cols: Column*): Column =
    xxhash64((lit(tag) +: cols): _*)

  private def hmod(tag: String, m: Long, cols: Column*): Column =
    pmod(h(tag, cols: _*), lit(m))

  /** Synthetic documents with family near-dup structure. Vocabulary
    * size scales with the corpus (`max(4096, n/2)`) so shingle
    * document frequency stays bounded as n grows — the regime real
    * corpora live in, and the one the df-cap / prefix-filter
    * constants are tuned for. ~12% of words mutate per doc, so
    * same-family pairs sit around Jaccard 0.6–0.9 and cross-family
    * pairs near 0. */
  def synthDocuments(spark: SparkSession, n: Long,
      familySize: Int = 8, maxLen: Int = 60,
      vocabOverride: Long = 0L): DataFrame = {
    val vocab =
      if (vocabOverride > 0) vocabOverride else math.max(4096L, n / 2)
    val words = (0 until maxLen).map { p =>
      val base = concat(lit("w"),
        hmod("w", vocab, col("family"), lit(p)))
      val mut = concat(lit("m"),
        hmod("r", vocab, col("id"), lit(p)))
      when(hmod("m", 8, col("id"), lit(p)) === 0, mut).otherwise(base)
    }
    spark.range(n)
      .withColumn("family", expr(s"id div $familySize"))
      .withColumn("len", (lit(30) + hmod("len", 30, col("family")))
        .cast("int"))
      .select(col("id").as("doc_id"),
        concat_ws(" ", slice(array(words: _*), lit(1), col("len")))
          .as("text"))
  }

  /** Synthetic embeddings in clusters of `clusterSize` around shared
    * centers; cluster count scales with n. Values in [-1, 1] with
    * ±0.1 per-dimension noise, so within-cluster cosine is high and
    * cross-cluster cosine concentrates near 0. */
  def synthEmbeddings(spark: SparkSession, n: Long, dims: Int = 64,
      clusterSize: Int = 16): DataFrame = {
    val dimCols = (0 until dims).map { d =>
      ((hmod("c", 2001, col("cluster"), lit(d)).cast("double") / 1000.0
          - 1.0) +
        (hmod("n", 201, col("id"), lit(d)).cast("double") / 1000.0 - 0.1))
        .cast("float")
    }
    spark.range(n)
      .withColumn("cluster", expr(s"id div $clusterSize"))
      .select(col("id").as("vec_id"), array(dimCols: _*).as("embedding"))
  }

  /** Continuous doubles (distinct ≈ rowcount) — the equi-depth
    * histogram's hardest case. */
  def synthValues(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id"),
      (hmod("v", 1000000000L, col("id")).cast("double") / 1000.0)
        .as("value"))

  /** Uniform random digraph with mean out-degree `degree`. */
  def synthEdges(spark: SparkSession, nodes: Long,
      degree: Int = 8): DataFrame =
    spark.range(nodes * degree).select(
      hmod("s", nodes, col("id")).as("src"),
      hmod("d", nodes, col("id")).as("dst"))

  /** Synthetic event log shaped like the sf events table: user count
    * scales with n (per-user event density stays bounded — the regime
    * real logs live in), 60 days of timestamps, view/click/purchase at
    * 70/20/10, continuous values. */
  def synthEvents(spark: SparkSession, n: Long): DataFrame = {
    val nUsers = math.max(100L, n / 50)
    spark.range(n).select(
      col("id").as("event_id"),
      hmod("u", nUsers, col("id")).as("user_id"),
      hmod("day", 60, col("id")).as("_day"),
      hmod("sec", 86400, col("id")).as("_sec"),
      (hmod("v", 100000, col("id")).cast("double") / 100.0).as("value"),
      when(hmod("t", 10, col("id")) < 7, lit("view"))
        .when(hmod("t", 10, col("id")) < 9, lit("click"))
        .otherwise(lit("purchase")).as("event_type"))
      .withColumn("ts", expr( // 1704067200 = 2024-01-01 UTC
        "timestamp_seconds(1704067200 + _day * 86400 + _sec)"))
      .drop("_day", "_sec")
  }

  /** Σ c·(c−1)/2 over the given bucket keys — the self-join's
    * pre-filter candidate count (one shared definition, in Dedup). */
  def bucketPairCount(df: DataFrame, keys: Seq[String]): Long =
    Dedup.bucketPairCount(df, keys)

  /** MinHash-LSH band-bucket candidate pairs on the production
    * banding (k=8, 4 bands). */
  def minhashCandidateCount(docs: DataFrame): Long =
    bucketPairCount(
      Dedup.lshBuckets(Dedup.withMinhashes(Dedup.docShingles(docs), 8),
        bands = 4, rowsPerBand = 2),
      Seq("band", "band_hash"))

  /** Sign-LSH band-bucket candidate pairs on the production embedding
    * banding — counted on [[Similarity.signBandRelation]], the EXACT
    * relation lshNearDupPairs self-joins, so this number cannot drift
    * from the production code path. */
  def embLshCandidateCount(emb: DataFrame, bands: Int = 8,
      rowsPerBand: Int = 6, dims: Int = 64): Long =
    bucketPairCount(
      Similarity.signBandRelation(emb, bands, rowsPerBand, dims),
      Seq("band", "band_sig"))

  /** SimHash 4-band band-bucket candidate pairs, counted on the exact
    * relation simhashPairs self-joins; `bits` is the signature width
    * (the scale knob — see simhashPairs' scaladoc). */
  def simhashCandidateCount(docs: DataFrame, bits: Int = 32): Long =
    bucketPairCount(
      Dedup.simhashBandRelation(
        Dedup.simhashSignatures(docs, bits = bits), bits),
      Seq("band", "bval"))

  /** The simhash width recipe at corpus multiple `scale`: 32-bit at
    * 1×, +16 bits per decade, capped at the 64-bit long. */
  def simhashBitsFor(scale: Int): Int =
    math.min(64, 32 + 16 * (math.log(scale.toDouble) / math.log(10.0))
      .ceil.toInt)

  private def time[A](body: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val a = body
    ((System.nanoTime() - t0) / 1e9, a)
  }

  private def exhaust(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  final case class Measurement(family: String, scale: Int, rows: Long,
      sec: Double, candidates: Long = -1L) {
    def json: String = {
      // Locale pinned: a comma-decimal default locale would render
      // invalid JSON (same rule as SlackBlocks' money formatting)
      val s2 = String.format(java.util.Locale.ROOT, "%.2f",
        Double.box(sec))
      s"""{"family":"$family","scale":$scale,"rows":$rows,""" +
        s""""sec":$s2,"candidates":$candidates}"""
    }
  }

  /** One full measurement pass at `scale` × the sf0.1 base sizes.
    * `only` filters families (empty = all) so long scales can run in
    * wall-clock-bounded chunks. */
  def measureScale(spark: SparkSession, scale: Int,
      only: Set[String] = Set.empty): Seq[Measurement] = {
    val nDocs = 5000L * scale
    val nEmb = 2000L * scale
    val nVals = 600000L * scale
    val nNodes = 2000L * scale
    // materialize inputs once so operator timings exclude generation
    val docs = synthDocuments(spark, nDocs).localCheckpoint(true)
    val emb = synthEmbeddings(spark, nEmb).localCheckpoint(true)
    val vals = synthValues(spark, nVals).localCheckpoint(true)
    val edges = synthEdges(spark, nNodes).localCheckpoint(true)
    val queries = emb.where(col("vec_id") < 8)

    val out = scala.collection.mutable.ArrayBuffer.empty[Measurement]
    def run(family: String, rows: Long, candidates: => Long = -1L)(
        body: => DataFrame): Unit =
      if (only.isEmpty || only.contains(family)) {
        val c = candidates
        val (sec, _) = time(exhaust(body))
        out += Measurement(family, scale, rows, sec, c)
        System.err.println(s"[scale] ${out.last.json}")
      }

    // Heaps fit: two bucketed prefix scans over the DOC relation —
    // wall must track docs linearly; candidates = the doc checkpoints
    run("text_heaps_law", nDocs, nDocs) {
      AnalyticsOps.heapsLaw(docs)
    }
    run("dedup_prefix_jaccard", nDocs,
        Dedup.prefixCandidateCount(docs, 3, 0.5)) {
      Dedup.prefixJaccardPairs(docs, 3, 0.5)
    }
    run("dedup_minhash_lsh", nDocs, minhashCandidateCount(docs)) {
      Dedup.minhashLshPairs(docs, 8, 4, 3, 0.5)
    }
    run("dedup_ensemble", nDocs, embLshCandidateCount(emb)) {
      Dedup.ensembleNearDup(docs, emb)
    }
    // fixed 32-bit width: the oracle-checked config — its 256
    // buckets/band are a documented scale CEILING (the control row,
    // same role as the fixed-rowsPerBand sign-LSH arm)
    run("dedup_simhash_fixed32", nDocs, simhashCandidateCount(docs)) {
      Dedup.simhashPairs(docs)
    }
    // width recipe: +16 signature bits per decade — the config a
    // growing corpus actually runs
    val shBits = simhashBitsFor(scale)
    run("dedup_simhash_scaled", nDocs,
        simhashCandidateCount(docs, shBits)) {
      Dedup.simhashPairs(docs, bits = shBits)
    }
    run("er_sorted_neighborhood", nDocs,
        RelationalOps.sortedNeighborhoodCandidates(
          docs.withColumn("nm", substring(col("text"), 1, 24)),
          "doc_id", "nm", window = 4).count()) {
      RelationalOps.sortedNeighborhoodMatches(
        docs.withColumn("nm", substring(col("text"), 1, 24)),
        "doc_id", "nm", window = 4, maxDist = 6)
    }
    // the sign-LSH scaling recipe from lshNearDupPairs' scaladoc made
    // measurable: rowsPerBand grows with log2(corpus) so bucket count
    // tracks corpus size and per-bucket occupancy stays bounded —
    // THIS is the configuration a 100 TB deployment runs, and its
    // candidate growth (vs the fixed-config ensemble above) is the
    // evidence the constants are a knob, not a scale ceiling
    val scaledRows = 6 + (math.log(scale.toDouble) / math.log(2.0))
      .ceil.toInt
    run("emb_lsh_scaled", nEmb,
        embLshCandidateCount(emb, bands = 8, rowsPerBand = scaledRows)) {
      Similarity.lshNearDupPairs(emb, threshold = 0.42, bands = 8,
        rowsPerBand = scaledRows, dims = 64)
    }
    run("equidepth_hist", nVals) {
      AnalyticsOps.equiDepthHistogram(vals, "value", 16)
    }
    run("token_budget", nDocs) {
      PipelineOps.tokenBudgetSelect(docs, tokenBudget = nDocs * 10)
    }
    run("ann_lsh_topk", nEmb) {
      Similarity.lshTopK(emb, queries, k = 5, planes = 6, dims = 64,
        tables = 4)
    }
    run("ann_pq_rerank", nEmb) {
      Similarity.pqTopKReranked(emb, queries, k = 5, m = 8, dims = 64,
        ksub = 32, shortlist = 50)
    }
    run("ann_ivfpq_topk", nEmb) {
      Similarity.ivfPqTopK(emb, queries, k = 5, nCells = 16, nProbe = 4,
        m = 8, dims = 64, ksub = 32, shortlist = 50)
    }
    run("graph_pagerank", nNodes) {
      GraphOps.pageRank(edges, iters = 10)
    }
    run("graph_label_propagation", nNodes) {
      GraphOps.labelPropagation(edges, iters = 4)
    }
    // wedge volume Σ_apex c·(c−1)/2 is the audited quantity (the
    // pre-aggregation join cardinality), counted on the production
    // wedge-apex relation with the data-derived degree cap
    if (only.isEmpty || only.contains("graph_common_neighbors")) {
      val cap = GraphOps.suggestedDegreeCap(edges)
      run("graph_common_neighbors", nNodes,
          bucketPairCount(
            GraphOps.commonNeighborWedgeRelation(edges, cap),
            Seq("node"))) {
        GraphOps.commonNeighborJaccard(edges, cap)
      }
    }
    run("graph_kcore", nNodes) {
      GraphOps.kCore(edges, k = 12, iters = 8)
    }
    run("graph_ppr", nNodes) {
      GraphOps.personalizedPageRank(edges,
        edges.select(col("src").as("node")).where(col("node") < 8)
          .distinct(), iters = 10)
    }
    run("graph_katz", nNodes) {
      GraphOps.katzCentrality(edges, iters = 4)
    }
    // BPE merge training on a FIXED 4096-stem vocabulary while the
    // corpus grows 100× — the claim under test is that the per-round
    // working set is the VOCABULARY, not the corpus: candidates =
    // |distinct words| (the relation every merge round folds over),
    // which must stay ~flat per decade while only the one up-front
    // corpus aggregation scales with n
    if (only.isEmpty || only.contains("pipe_bpe_merges")) {
      val bpeDocs = synthDocuments(spark, nDocs, vocabOverride = 4096L)
        .localCheckpoint(true)
      val vocabRows = bpeDocs
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) >= 1).select(col("w")).distinct().count()
      run("pipe_bpe_merges", nDocs, vocabRows) {
        PipelineOps.bpeMerges(bpeDocs, rounds = 6)
      }
      bpeDocs.unpersist()
    }
    // full ER finish: sorted-neighborhood matches → connected
    // components → canonical survivor per cluster; candidates = the
    // match-pair count (the CC edge relation's size — what the
    // propagation loop actually shuffles)
    if (only.isEmpty || only.contains("er_cluster_canonical")) {
      val named = docs.withColumn("nm", substring(col("text"), 1, 24))
      val matches = RelationalOps.sortedNeighborhoodMatches(
        named, "doc_id", "nm", window = 4, maxDist = 6)
        .localCheckpoint(true)
      run("er_cluster_canonical", nDocs, matches.count()) {
        val comp = Dedup.connectedComponents(
          matches.select(col("id_a"), col("id_b")))
        comp.join(named, comp("doc_id") === named("doc_id"))
          .groupBy(col("cluster_rep").as("cluster_id"))
          .agg(count(lit(1)).as("size"), min(col("nm")).as("canonical"))
      }
      matches.unpersist()
    }
    // brand-style blocked JW matching: fixed-size blocks (32) keep the
    // candidate square LINEAR in n — candidates = Σ_b c·(c−1)/2, the
    // exact pre-verify join cardinality
    if (only.isEmpty || only.contains("er_jw_blocked")) {
      val blocked = docs.select(col("doc_id"),
          expr("doc_id div 32").as("blk"),
          substring(col("text"), 1, 24).as("nm"))
        .localCheckpoint(true)
      run("er_jw_blocked", nDocs, bucketPairCount(blocked, Seq("blk"))) {
        RelationalOps.jaroBlockedMatches(blocked, "doc_id", "nm",
          "blk", threshold = 0.8)
      }
      blocked.unpersist()
    }
    // winnowing is strictly per-row (split→gram→hash→window-min):
    // wall time must track n with no cross-row term
    run("text_winnowing", nDocs) {
      TextOps.winnowingFingerprints(docs, k = 4, w = 4)
    }
    // landmark harmonic closeness: k = 8 fixed landmarks — per-round
    // cost ∝ k·E, so growth must track the edge count, not n·E
    run("graph_harmonic_closeness", nNodes) {
      GraphOps.harmonicCloseness(edges,
        edges.select(col("src").as("node")).where(col("node") < 8)
          .distinct(), iters = 5)
    }
    // replicate-into-covered-days sliding reach (the dau_mau /
    // sketch_hll_sliding shape): candidates = the replicated relation
    // (exactly 30×|distinct (day,user)|) — expansion is a CONSTANT of
    // the window, so wall time must track n
    if (only.isEmpty || only.contains("sliding_reach_30d")) {
      val du = spark.range(nVals / 10).select(
          hmod("day", 60, col("id")).cast("int").as("dd"),
          hmod("usr", nVals / 40, col("id")).as("user_id"))
        .distinct()
        .select(expr("date_add(date '2024-01-01', dd)").as("d"),
          col("user_id"))
        .localCheckpoint(true)
      val days = du.select(col("d").as("day")).distinct()
      run("sliding_reach_30d", nVals / 10, du.count() * 30) {
        du.withColumn("k", explode(sequence(lit(0), lit(29))))
          .select(expr("date_add(d, cast(k as int))").as("day"),
            col("d"), col("user_id"))
          .join(broadcast(days), "day")
          .groupBy(col("day"))
          .agg(countDistinct(when(col("d") === col("day"),
            col("user_id"))).as("dau"),
            countDistinct(col("user_id")).as("mau"))
      }
      du.unpersist()
    }
    // maximal-span substring dedup: candidates = Σ_gram c·(c−1)/2 over
    // the stride-1 40-gram relation (the self-join's pre-filter
    // volume); vocabulary scaling keeps gram df bounded, so candidate
    // growth must stay ~linear in n — never the all-pairs square
    if (only.isEmpty || only.contains("dedup_substring_maximal")) {
      val gramRel = docs.where(length(col("text")) >= 40)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, length(text) - 40),
            |  i -> xxhash64(substring(text, i + 1, 40)))"""
            .stripMargin)).as("gk"))
      run("dedup_substring_maximal", nDocs,
          bucketPairCount(gramRel, Seq("gk"))) {
        Dedup.maximalSubstringSpans(docs, minLen = 40)
      }
    }
    // trained-quantizer IVF: Lloyd supersteps (iters=2) dominate;
    // candidates carries the RECALL AUDIT — brute-force top-5 hits
    // over the 8 probe queries (max 40), which must hold its floor as
    // the corpus grows, not just the wall-time curve
    if (only.isEmpty || only.contains("ann_ivf_trained")) {
      val brute = Similarity.bruteForceTopK(emb, queries, k = 5)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(true)
      run("ann_ivf_trained", nEmb, {
          Similarity.ivfTopKTrained(emb, queries, k = 5, nCells = 16,
              nProbe = 4, iters = 2)
            .select(col("query_id"), col("neighbor_id"))
            .join(brute, Seq("query_id", "neighbor_id"), "left_semi")
            .count()
        }) {
        Similarity.ivfTopKTrained(emb, queries, k = 5, nCells = 16,
          nProbe = 4, iters = 2)
      }
      brute.unpersist()
    }
    // event-log analytics: attribution's replicate-into-covered-days
    // (candidates = touches × (windowDays+1) — a constant multiplier),
    // CUPED's single sufficient-statistics agg, Mann–Whitney's
    // prefix-sum rank decomposition — all must track n linearly
    val evFams = Set("analytics_attribution", "analytics_cuped",
      "analytics_mann_whitney", "analytics_bootstrap_ci",
      "ts_holt_winters", "ts_theil_sen", "ts_kalman_level",
      "ts_mann_kendall", "analytics_rand_fdr", "analytics_msprt",
      "analytics_psi", "analytics_kruskal_wallis",
      "analytics_trend_test", "ts_page_hinkley", "ts_weekly_spectrum",
      "analytics_mutual_info", "ts_kendall_tau", "analytics_qte")
    if (only.isEmpty || only.exists(evFams.contains)) {
      val nEvents = 100000L * scale
      val ev = synthEvents(spark, nEvents).localCheckpoint(true)
      run("analytics_attribution", nEvents,
          ev.where(col("event_type").isin("view", "click")).count() * 4) {
        AnalyticsOps.linearAttribution(ev, conversionType = "purchase",
          touchTypes = Seq("view", "click"), windowDays = 3)
      }
      run("analytics_cuped", nEvents) {
        AnalyticsOps.cupedEffect(ev, tsCol = "ts", valueCol = "value",
          cutover = "2024-02-01 00:00:00")
      }
      run("analytics_mann_whitney", nEvents) {
        AnalyticsOps.mannWhitneyU(ev, "event_type", "view", "click",
          "value")
      }
      // Poisson bootstrap: candidates = n·B exploded rows, but the
      // shuffle after the map-side combine is (types × B) partial
      // sums whatever the corpus — wall must track n linearly with a
      // ×B constant, never shuffle-bound
      run("analytics_bootstrap_ci", nEvents, nEvents * 100) {
        AnalyticsOps.bootstrapMeanCi(ev)
      }
      // the calendar-bounded claim of the fold/pair families: after
      // the daily pre-aggregation (60 days × 3 types here whatever n),
      // the HW fold is O(days) per key and the Theil–Sen pair join is
      // O(days²/2) per key — wall must go FLAT once the daily
      // aggregation stops dominating, not track n
      run("ts_holt_winters", nEvents, 60L * 3) {
        AnalyticsOps.holtWinters(ev, "event_type", "ts", "value")
      }
      run("ts_theil_sen", nEvents, 3L * 60 * 59 / 2) {
        AnalyticsOps.theilSen(ev)
      }
      run("ts_kalman_level", nEvents, 60L * 3) {
        AnalyticsOps.kalmanLevel(ev, "event_type", "ts", "value")
      }
      run("ts_mann_kendall", nEvents, 3L * 60 * 59 / 2) {
        AnalyticsOps.mannKendall(ev)
      }
      // randomization FDR: candidates = n·B logical reassignment
      // draws, but B rides as a column multiplier inside ONE map-side
      // aggregation (the bootstrap law) — only m rows of 2B+4 longs
      // shuffle; wall must track n linearly with a ×B scan constant
      run("analytics_rand_fdr", nEvents, nEvents * 64) {
        AnalyticsOps.randomizationFdr(
          ev.withColumn("arm", pmod(col("user_id"), lit(2)).cast("int"))
            .withColumn("succ", (col("value") > lit(500.0)).cast("int")),
          "event_type", "user_id", "arm", "succ")
      }
      // mSPRT: the calendar-collapse law again — ONE aggregation to
      // the types × days daily relation, then two windows bounded by
      // the calendar; candidates = the daily relation, INVARIANT in n
      run("analytics_msprt", nEvents, 60L * 3) {
        AnalyticsOps.msprtSequential(
          ev.withColumn("arm", pmod(col("user_id"), lit(2)).cast("int"))
            .withColumn("succ", (col("value") > lit(500.0)).cast("int")),
          "event_type", "ts", "arm", "succ")
      }
      // PSI: one conditional aggregation to |bins| rows + singleton
      // broadcasts; candidates = the bin relation, INVARIANT in n
      run("analytics_psi", nEvents, 3L) {
        AnalyticsOps.psiDrift(
          ev.withColumn("is_ref", dayofweek(col("ts")).between(2, 6)),
          "event_type", "is_ref")
      }
      // Kruskal-Wallis: the corpus collapses to (grp, distinct cents)
      // cells; candidates = the tie-group relation, which SATURATES
      // as n grows past the value domain (the MW collapse law) —
      // everything after the prefix scan runs on k rows
      run("analytics_kruskal_wallis", nEvents,
          ev.select((col("value").cast(
            org.apache.spark.sql.types.DecimalType(18, 2)) * lit(100))
            .cast("long").as("cv")).distinct().count()) {
        AnalyticsOps.kruskalWallis(ev, "event_type", "value")
      }
      // Cochran-Armitage: two aggregations, corpus -> (grp, score)
      // cells -> k rows; candidates = the cell relation (types x 7
      // dow scores), INVARIANT in n
      run("analytics_trend_test", nEvents, 3L * 7) {
        AnalyticsOps.cochranArmitage(
          ev.withColumn("dow",
            pmod(unix_date(to_date(col("ts"))), lit(7)).cast("long"))
            .withColumn("succ", (col("value") > lit(500.0)).cast("int")),
          "event_type", "dow", "succ")
      }
      // Page-Hinkley + weekly spectrum: the calendar-collapse law —
      // candidates = the daily relation, INVARIANT in n
      run("ts_page_hinkley", nEvents, 60L * 3) {
        AnalyticsOps.pageHinkley(ev, "event_type", "ts", "value")
      }
      run("ts_weekly_spectrum", nEvents, 60L * 3) {
        AnalyticsOps.weeklySpectrum(ev, "event_type", "ts", "value")
      }
      // QTE: the exact per-(grp, arm) percentile aggregation — the
      // one new family whose state grows with DISTINCT VALUES per
      // group (the documented KLL-swap threshold); candidates = the
      // value multiset the ObjectHashAggregate holds
      run("analytics_qte", nEvents,
          ev.select(col("event_type"), col("value")).distinct().count()) {
        AnalyticsOps.quantileTreatmentEffect(
          ev.withColumn("arm", pmod(col("user_id"), lit(2)).cast("int")),
          "event_type", "arm", "value")
      }
      // Kendall tau-b: the pair join is DAYS-bounded (the Theil-Sen
      // economics) — candidates = day pairs, INVARIANT in n
      run("ts_kendall_tau", nEvents, 180L * 179 / 2) {
        AnalyticsOps.kendallTau(ev, "event_type", "ts", "view",
          "click")
      }
      // mutual information: the contingency shape — candidates = the
      // (types x 7 dow) cell relation, INVARIANT in n
      run("analytics_mutual_info", nEvents, 3L * 7) {
        AnalyticsOps.mutualInformation(
          ev.withColumn("dow",
            pmod(unix_date(to_date(col("ts"))), lit(7)).cast("long")),
          "event_type", "dow")
      }
      ev.unpersist()
    }
    // LogStore commit cost vs table age — the O(1)-commit claim: an
    // append writes one new segment + one version file whatever the
    // table holds; the log REPLAY that finds the next version is
    // O(#actions), but actions are a few bytes each. Segments grow
    // 10× per decade; the timed commit must stay ~flat.
    if (only.isEmpty || only.contains("src_log_commit")) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-log").toString + "/tbl"
      val store = new graft.catalog.LogStore(spark, root)
      val seed = spark.range(1000).toDF("id").localCheckpoint(true)
      (0 until 10 * scale).foreach(_ => store.append(seed))
      val (sec, _) = time { store.append(seed) }
      out += Measurement("src_log_commit", scale, 10L * scale, sec,
        store.latestVersion())
      System.err.println(s"[scale] ${out.last.json}")
    }
    // Bloom point-lookup cost vs table size — the O(1)-open claim:
    // the table grows 10 -> 100 -> 1000 live segments of DISJOINT
    // string keys, and a lookup must keep opening ~1 parquet segment
    // (candidates = segments actually opened). One real segment
    // carries the probed key; the other N-1 are committed with
    // harness-built Bloom hexes (same bit recipe as buildBloom) —
    // pointLookup prunes them WITHOUT any parquet existing to open,
    // which is exactly the claim under test.
    if (only.isEmpty || only.contains("src_bloom_lookup")) {
      val nSegs = 10 * scale
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-bloom").toString + "/tbl"
      val store = new graft.catalog.LogStore(spark, root,
        bloomCol = Some("k"), checkpointInterval = 1000000)
      import spark.implicits._
      store.append(Seq(("probe-key.example", 1L)).toDF("k", "v"))
      val bits = 4096
      def hexFor(keys: Seq[String]): String = {
        val arr = new Array[Boolean](bits)
        keys.foreach(k => store.bloomPositions(k).foreach(arr(_) = true))
        arr.grouped(4).map { nib =>
          Integer.toHexString((if (nib(0)) 1 else 0) |
            (if (nib(1)) 2 else 0) | (if (nib(2)) 4 else 0) |
            (if (nib(3)) 8 else 0))
        }.mkString
      }
      (1 until nSegs).foreach { s =>
        val hex = hexFor((0 until 64).map(i => s"other-$s-$i.example"))
        store.commit(store.latestVersion() + 1,
          Seq(store.Segment(s"seg-fake-$s", None, None, num = false,
            Some(hex))), Nil)
      }
      val (sec, (_, opened, live)) =
        time { store.pointLookup("probe-key.example") }
      out += Measurement("src_bloom_lookup", scale, nSegs.toLong, sec,
        opened.toLong)
      System.err.println(s"[scale] ${out.last.json} (live=$live)")
    }
    // LogStore MERGE cost vs table size — the copy-on-write pruning
    // claim: a 10-row upsert whose key range hits ONE segment's stats
    // range rewrites that segment alone, so merge cost must stay ~flat
    // as the table grows 10× per decade (the candidates column records
    // segments actually rewritten — pinned at 1 whatever the size).
    if (only.isEmpty || only.contains("src_log_merge")) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-mrg").toString + "/tbl"
      val store = new graft.catalog.LogStore(spark, root,
        statsCol = Some("id"))
      val nSegs = 10 * scale
      (0 until nSegs).foreach { i =>
        store.append(spark.range(i * 1000L, i * 1000L + 1000L)
          .toDF("id").withColumn("v", lit("a")))
      }
      val upd = spark.range(5000L, 5010L).toDF("id")
        .withColumn("v", lit("B"))
      val (sec, r) = time { store.merge(upd, "id") }
      require(r.rewritten == 1, s"pruning must hit one segment: $r")
      out += Measurement("src_log_merge", scale, nSegs.toLong, sec,
        r.rewritten.toLong)
      System.err.println(s"[scale] ${out.last.json}")
    }
    // LogStore stats-pruned DELETE cost vs table size — the same
    // pruning claim as merge, on the delete path: a 100-row range
    // purge whose bounds hit ONE segment's stats range rewrites that
    // segment alone, so delete cost must stay ~flat as the table
    // grows 10× per decade (candidates = segments rewritten, pinned
    // at 1 whatever the size — the full-table counterfactual of
    // deleteWhere is nSegs× the rewrite volume).
    if (only.isEmpty || only.contains("src_log_delete")) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-del").toString + "/tbl"
      val store = new graft.catalog.LogStore(spark, root,
        statsCol = Some("id"))
      val nSegs = 10 * scale
      (0 until nSegs).foreach { i =>
        store.append(spark.range(i * 1000L, i * 1000L + 1000L)
          .toDF("id").withColumn("v", lit("a")))
      }
      val (sec, r) = time { store.deleteRange("id", "5100", "5200") }
      require(r.rewritten == 1, s"pruning must hit one segment: $r")
      out += Measurement("src_log_delete", scale, nSegs.toLong, sec,
        r.rewritten.toLong)
      System.err.println(s"[scale] ${out.last.json}")
    }
    // Deletion-vector point delete vs SEGMENT BYTES — the
    // merge-on-read claim stated honestly: a 100-row point delete
    // must WRITE ∝ DELETED ROWS, not ∝ the bytes of the segment that
    // happens to hold them. Both paths prune to the ONE candidate
    // segment by stats; the copy-on-write twin (`_cow`, deleteRange
    // on an identical table) then REWRITES that segment — its write
    // volume grows 10× per decade as rows grow inside the fixed
    // 10-segment layout — while the DV path writes a 100-position
    // sidecar whose size is INVARIANT. The candidates column records
    // exactly that: NEW BYTES WRITTEN by the delete (dv dir vs
    // rewritten segment + both paths' cdc). Wall time at MB-scale
    // segments is fixed-job-overhead noise; the bytes accounting is
    // the deterministic form of the claim that survives to 1 GB
    // segments, where the cow rewrite is the outage.
    if (only.isEmpty || only.contains("src_dv_delete")) {
      val rowsPerSeg = 10000L * scale
      def seed(): graft.catalog.LogStore = {
        val root = java.nio.file.Files
          .createTempDirectory("graft-scale-dv").toString + "/tbl"
        val store = new graft.catalog.LogStore(spark, root,
          statsCol = Some("id"))
        (0 until 10).foreach { i =>
          store.append(spark.range(i * rowsPerSeg,
            (i + 1) * rowsPerSeg).toDF("id")
            .withColumn("v", lit("a")))
        }
        store
      }
      def dirBytes(root: String, prefixes: Set[String],
          exclude: Set[String]): Long = {
        val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        fs.listStatus(new org.apache.hadoop.fs.Path(root))
          .filter(st => st.isDirectory &&
            prefixes.exists(st.getPath.getName.startsWith) &&
            !exclude.contains(st.getPath.getName))
          .map(st => fs.getContentSummary(st.getPath).getLength).sum
      }
      val dvStore = seed()
      val preDv = dvStore.liveSegments().toSet
      val lo = 5 * rowsPerSeg + 100
      val (sec, r) = time {
        dvStore.deleteRangeDV("id", lo.toString, (lo + 99).toString)
      }
      require(r.touched == 1 && r.deletedRows == 100L,
        s"pruning must vector one segment: $r")
      val dvBytes = dirBytes(dvStore.root, Set("dv-", "seg-", "cdc-"),
        exclude = preDv)
      out += Measurement("src_dv_delete", scale, rowsPerSeg, sec,
        dvBytes)
      System.err.println(s"[scale] ${out.last.json}")
      val cowStore = seed()
      val preCow = cowStore.liveSegments().toSet
      val (secC, rc) = time {
        cowStore.deleteRange("id", lo.toString, (lo + 99).toString)
      }
      require(rc.rewritten == 1, s"same one-segment prune: $rc")
      val cowBytes = dirBytes(cowStore.root, Set("dv-", "seg-", "cdc-"),
        exclude = preCow)
      out += Measurement("src_dv_delete_cow", scale, rowsPerSeg, secC,
        cowBytes)
      System.err.println(s"[scale] ${out.last.json}")
    }
    // DV LIFECYCLE POLICY — merge-on-read must stay hands-off: as
    // UN-COMPACTED vector rows grow 10× per decade inside a FIXED
    // 10×100k-row layout (0.5% → 5% → 50% per-segment pressure), the
    // reconciling snapshot read's cost must stay ~flat (the anti-join
    // is dominated by the data scan; the dv side stays a bounded
    // broadcast), and once a segment crosses the maintain policy's
    // pressure fraction (0.3 here → trips only at the 100× step) the
    // debt is folded back into clean segments — remaining dv rows
    // (the candidates column of the `_after` row) drop to ZERO while
    // the lighter scales keep theirs untouched (no premature
    // rewrites). Read timings before vs after bracket the claim.
    if (only.isEmpty || only.contains("src_dv_policy")) {
      val rowsPerSeg = 100000L
      val dvPerSeg = 500L * scale
      val stride = rowsPerSeg / dvPerSeg // 200 / 20 / 2 — exact
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-dvp").toString + "/tbl"
      val store = new graft.catalog.LogStore(spark, root,
        statsCol = Some("id"))
      (0 until 10).foreach { i =>
        store.append(spark.range(i * rowsPerSeg,
          (i + 1) * rowsPerSeg).toDF("id")
          .withColumn("v", lit("a")))
      }
      val r = store.deleteWhereDV(s"id % $stride = 0")
      require(r.touched == 10 && r.deletedRows == dvPerSeg * 10,
        s"even scatter across all segments expected: $r")
      val (secRead, _) = time(exhaust(store.read()))
      out += Measurement("src_dv_policy", scale, rowsPerSeg * 10,
        secRead, r.deletedRows)
      System.err.println(s"[scale] ${out.last.json}")
      val m = store.maintainLayout(1L, dvFraction = 0.3)
      val expectTrip = dvPerSeg.toDouble / rowsPerSeg >= 0.3
      require(m.triggered == expectTrip,
        s"pressure rule fired wrong at scale $scale: $m")
      val (secAfter, _) = time(exhaust(store.read()))
      val remaining = store.liveSegmentInfos()
        .flatMap(_.dv.map(_._2)).sum
      out += Measurement("src_dv_policy_after", scale,
        rowsPerSeg * 10, secAfter, remaining)
      System.err.println(s"[scale] ${out.last.json}")
    }
    // LogStore OPTIMIZE cost vs table size — the cost ∝ rewritten-
    // bytes claim: the recluster moves every live row exactly once
    // through ONE range shuffle + one partitioned write (never one
    // filtered scan per output segment), so wall time must grow
    // ~linearly as the table grows 10× per decade (candidates = rows
    // rewritten), with the skip payoff pinned by requiring the
    // clustered stats to prune a 5% range read to ≤2 of 8 segments.
    if (only.isEmpty || only.contains("src_log_optimize")) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-opt").toString + "/tbl"
      val store = new graft.catalog.LogStore(spark, root,
        statsCol = Some("id"))
      val nSegs = 10 * scale
      val rowsPerSeg = 10000L
      (0 until nSegs).foreach { i =>
        // curve-OBLIVIOUS ingest: every segment spans the whole domain
        store.append(spark.range(rowsPerSeg).toDF("n")
          .select((col("n") * nSegs + i).as("id")))
      }
      val (sec, r) = time { store.optimize(8, col("id")) }
      require(r.rewritten == nSegs && r.produced == 8,
        s"optimize must recluster all $nSegs segments into 8: $r")
      val domain = nSegs * rowsPerSeg
      val (_, scanned, live) = store.readRange(
        (domain / 2).toString, (domain / 2 + domain / 20).toString)
      require(live == 8 && scanned <= 2,
        s"clustered stats must prune the 5% range: $scanned of $live")
      out += Measurement("src_log_optimize", scale, domain, sec,
        domain)
      System.err.println(s"[scale] ${out.last.json}")
    }
    // LogStore SUBSET OPTIMIZE cost vs table size — the cost ∝
    // SELECTED bytes claim that makes weekly maintenance viable at
    // 100 TB: a predicate-selected recluster of a FIXED 2-segment key
    // range must stay ~flat as the table grows 10× per decade, with
    // every other segment carried over untouched in the same commit
    // (candidates = segments rewritten, pinned at 2; the full
    // optimize counterfactual is the src_log_optimize row, linear in
    // TABLE bytes).
    if (only.isEmpty || only.contains("src_log_optimize_where")) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-optw").toString + "/tbl"
      val store = new graft.catalog.LogStore(spark, root,
        statsCol = Some("id"))
      val nSegs = 10 * scale
      val rowsPerSeg = 10000L
      (0 until nSegs).foreach { i =>
        store.append(spark.range(i * rowsPerSeg, (i + 1) * rowsPerSeg)
          .toDF("id"))
      }
      val (sec, r) = time {
        store.optimizeWhere(4,
          Seq(("id", (3 * rowsPerSeg).toString,
            (5 * rowsPerSeg - 1).toString)),
          clusterBy = Seq(col("id")))
      }
      require(r.rewritten == 2 && r.produced == 4 &&
        r.carried == nSegs - 2,
        s"subset optimize must touch exactly the 2 selected segments: $r")
      out += Measurement("src_log_optimize_where", scale, nSegs.toLong,
        sec, r.rewritten.toLong)
      System.err.println(s"[scale] ${out.last.json}")
    }
    // Log-answered AGGREGATE cost vs table size — the zero-scan
    // claim: COUNT(*)/MIN/MAX over a snapshot are answered from the
    // per-segment row counts and bounds recorded in the log, so the
    // aggregate must stay ~flat as the table grows 10 -> 100 -> 1000
    // live segments AND must never open a data file. One real segment
    // plus N-1 metadata-only fakes (rows + bounds committed, no
    // parquet on disk): a correct answer is PROOF no scan happened —
    // any fallback would die on the missing files. The scan
    // counterfactual opens all N segments.
    if (only.isEmpty || only.contains("src_log_agg")) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-agg").toString + "/tbl"
      val store = new graft.catalog.LogStore(spark, root,
        statsCol = Some("id"), checkpointInterval = 1000000)
      val nSegs = 10 * scale
      store.append(spark.range(0L, 1000L).toDF("id"))
      (1 until nSegs).foreach { s =>
        store.commit(store.latestVersion() + 1,
          Seq(store.Segment(s"seg-fake-$s", Some((s * 1000L).toString),
            Some((s * 1000L + 999L).toString), num = true, None,
            Map.empty, rows = Some(1000L))), Nil)
      }
      import org.apache.spark.sql.functions.{count => fcount,
        lit => flit, max => fmax, min => fmin}
      val (sec, row) = time {
        spark.read.format("graft-log").option("path", root)
          .option("mode", "snapshot").load()
          .agg(fcount(flit(1)), fmin(col("id")), fmax(col("id")))
          .head()
      }
      require(row.getLong(0) == 1000L * nSegs && row.getLong(1) == 0L &&
        row.getLong(2) == nSegs * 1000L - 1,
        s"log-answered aggregate must be exact: $row")
      out += Measurement("src_log_agg", scale, nSegs.toLong, sec, 0L)
      System.err.println(s"[scale] ${out.last.json}")
    }
    // LogStore snapshot RESOLUTION cost vs log length — the claim the
    // checkpoint layer exists for: liveSegmentInfos + lastTxn seed
    // from the newest `.checkpoint` and replay only the suffix, so
    // resolving a snapshot must stay O(interval) — FLAT as the log
    // grows 1 000 → 10 000 commits — where a full replay would grow
    // linearly (and a streaming writer quadratically over its life).
    // Commits here are raw metadata-only actions (the private commit
    // hook) so the measurement isolates log mechanics from parquet I/O.
    if (only.isEmpty || only.contains("src_log_snapshot")) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-snap").toString + "/tbl"
      val store = new graft.catalog.LogStore(spark, root)
      val nCommits = 1000 * scale
      (0 until nCommits).foreach { i =>
        store.commit(i.toLong,
          Seq(store.Segment(s"seg-$i", Some(i.toString),
            Some((i + 10).toString), num = true)),
          if (i >= 8) Seq(s"seg-${i - 8}") else Nil,
          txn = Some(i.toLong))
      }
      val (sec, resolved) = time {
        (store.liveSegmentInfos().size, store.lastTxn())
      }
      require(resolved._2 == nCommits - 1L, "txn fence must resolve")
      out += Measurement("src_log_snapshot", scale, nCommits.toLong,
        sec, resolved._1.toLong)
      System.err.println(s"[scale] ${out.last.json}")
    }
    // Checkpoint-served pruning vs table AGE — the 10⁶-segment claim:
    // skipping decisions must be answerable from the `_last_checkpoint`
    // snapshot (which carries every live segment's stats + Bloom + row
    // counts + dv state) WITHOUT replaying the action log. The table
    // ages 10× per decade in COMMITS (fake stats-bearing segments, no
    // parquet); the measured work is a full resolution + stats prune
    // (liveSegmentInfos + mayOverlap). The `_replay` twin is the
    // counterfactual: an identical table that never checkpointed, where
    // the same question must re-read EVERY version file — linear in
    // table age, the cost the checkpoint exists to delete.
    if (only.isEmpty || only.contains("src_ckpt_prune")) {
      def age(root: String, nCommits: Int, interval: Int)
          : graft.catalog.LogStore = {
        val store = new graft.catalog.LogStore(spark, root,
          statsCol = Some("id"), checkpointInterval = interval)
        (0 until nCommits).foreach { i =>
          store.commit(i.toLong,
            Seq(store.Segment(s"seg-$i", Some((i * 10).toString),
              Some((i * 10 + 9).toString), num = true,
              bloom = Some("f" * 1024), rows = Some(100L))), Nil)
        }
        store
      }
      val nCommits = 1000 * scale
      val withCk = age(java.nio.file.Files
        .createTempDirectory("graft-scale-ck").toString + "/t",
        nCommits, interval = 100)
      val (sec, hit) = time {
        withCk.liveSegmentInfos()
          .count(_.mayOverlap("5000", "5090"))
      }
      out += Measurement("src_ckpt_prune", scale, nCommits.toLong,
        sec, hit.toLong)
      System.err.println(s"[scale] ${out.last.json}")
      val noCk = age(java.nio.file.Files
        .createTempDirectory("graft-scale-nock").toString + "/t",
        nCommits, interval = Int.MaxValue)
      val (secR, hitR) = time {
        noCk.liveSegmentInfos()
          .count(_.mayOverlap("5000", "5090"))
      }
      require(hit == hitR, "both paths must prune identically")
      out += Measurement("src_ckpt_prune_replay", scale,
        nCommits.toLong, secR, hitR.toLong)
      System.err.println(s"[scale] ${out.last.json}")
    }
    // Checkpoint WIDTH — the one-big-JSON-file question: the
    // `_last_checkpoint` snapshot carries a line per LIVE segment
    // (stats + a 1 KB Bloom here — the realistic heavy shape), so a
    // WIDE table (10⁴ → 10⁵ → 10⁶ live segments per decade, all
    // live, fake metadata-only commits) pays O(live) to write it and
    // O(live) to seed resolution from it. `src_ckpt_wide` measures
    // the SHARDED format (multi-part + Bloom sidecars past
    // checkpointShardRows): sec = a full STATS-ONLY resolution +
    // prune (the sidecars are never read — the Bloom hex is ~90% of
    // a line's weight), candidates = the bytes that resolution
    // actually read (manifest + part files). The `_mono` twin forces
    // the historical single-file format on identical content — its
    // resolution re-reads every hex byte; the gap is what the shard
    // split buys. Both prune identically (required).
    if (only.isEmpty || only.contains("src_ckpt_wide")) {
      val nSegs = 10000 * scale
      val perCommit = 1000
      def build(shardRows: Int): graft.catalog.LogStore = {
        val root = java.nio.file.Files
          .createTempDirectory("graft-scale-ckw").toString + "/t"
        val store = new graft.catalog.LogStore(spark, root,
          statsCol = Some("id"), checkpointInterval = Int.MaxValue,
          checkpointShardRows = shardRows)
        (0 until nSegs / perCommit).foreach { c =>
          store.commit(c.toLong,
            (0 until perCommit).map { j =>
              val i = c * perCommit + j
              store.Segment(s"seg-$i", Some((i * 10).toString),
                Some((i * 10 + 9).toString), num = true,
                bloom = Some("f" * 1024), rows = Some(100L))
            }, Nil)
        }
        store
      }
      def ckBytes(store: graft.catalog.LogStore,
          statsOnly: Boolean): Long = {
        val fs = new org.apache.hadoop.fs.Path(store.root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.listStatus(new org.apache.hadoop.fs.Path(
            s"${store.root}/_log"))
          .filter { st =>
            val n = st.getPath.getName
            n.contains(".checkpoint") &&
              (!statsOnly || !n.contains(".bloom-"))
          }.map(_.getLen).sum
      }
      val sharded = build(32768)
      val (secWS, _) = time(sharded.checkpoint())
      System.err.println(s"[scale] ckpt_wide sharded write: $secWS s, " +
        s"${ckBytes(sharded, statsOnly = false)} bytes total")
      val (sec, hit) = time {
        sharded.liveSegmentInfos().count(_.mayOverlap("50000", "50990"))
      }
      require(hit >= 90 && hit <= 110, s"prune sanity: $hit")
      out += Measurement("src_ckpt_wide", scale, nSegs.toLong, sec,
        ckBytes(sharded, statsOnly = true))
      System.err.println(s"[scale] ${out.last.json}")
      // the mono counterfactual runs to 10⁵ — at 10⁶ the single-file
      // form is not merely slow, its ~1.1 GB body overflows a single
      // in-memory string on the READ side (the regex parse needs the
      // whole body), so the 10⁶ mono point is the measured 10⁴→10⁵
      // linearity extended one decade: ~23 s / ~1.1 GB per fresh
      // resolution, vs the sharded form's measured sub-second
      if (scale <= 10) {
        val mono = build(Int.MaxValue)
        val (secWM, _) = time(mono.checkpoint())
        System.err.println(s"[scale] ckpt_wide mono write: $secWM s")
        val (secM, hitM) = time {
          mono.liveSegmentInfos().count(_.mayOverlap("50000", "50990"))
        }
        require(hit == hitM, "both formats must prune identically")
        out += Measurement("src_ckpt_wide_mono", scale, nSegs.toLong,
          secM, ckBytes(mono, statsOnly = false))
        System.err.println(s"[scale] ${out.last.json}")
      }
    }
    // INCREMENTAL checkpoint write — bytes-written ∝ CHANGED segments,
    // not live segments: a wide table (10⁴ → 10⁵ → 10⁶ live, 1 KB
    // Bloom per segment) takes a full sharded checkpoint (the
    // `_full` twin — this is also the cost every r17 checkpoint paid
    // regardless of delta), then 10 one-segment commits land and the
    // next checkpoint carries every clean bucket BY NAME, rewriting
    // only the ≤10 dirty buckets + manifest. sec = the incremental
    // checkpoint wall; candidates = the bytes FRESHLY written under
    // the new checkpoint's version prefix. Correctness is pinned by a
    // full resolution equality against the live count.
    if (only.isEmpty || only.contains("src_ckpt_incr")) {
      val nSegs = 10000 * scale
      val perCommit = 1000
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-cki").toString + "/t"
      val store = new graft.catalog.LogStore(spark, root,
        statsCol = Some("id"), checkpointInterval = Int.MaxValue,
        checkpointShardRows = 32768)
      (0 until nSegs / perCommit).foreach { c =>
        store.commit(c.toLong,
          (0 until perCommit).map { j =>
            val i = c * perCommit + j
            store.Segment(s"seg-$i", Some((i * 10).toString),
              Some((i * 10 + 9).toString), num = true,
              bloom = Some("f" * 1024), rows = Some(100L))
          }, Nil)
      }
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def bytesAt(v: Long): Long = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$root/_log"))
        .filter(_.getPath.getName.startsWith(f"$v%08d.checkpoint"))
        .map(_.getLen).sum
      val (secFull, _) = time(store.checkpoint())
      val base = store.latestVersion()
      out += Measurement("src_ckpt_incr_full", scale, nSegs.toLong,
        secFull, bytesAt(base))
      System.err.println(s"[scale] ${out.last.json}")
      (0 until 10).foreach { j =>
        store.commit(base + 1 + j,
          Seq(store.Segment(s"seg-incr-$j",
            Some(((nSegs + j) * 10).toString),
            Some(((nSegs + j) * 10 + 9).toString), num = true,
            bloom = Some("f" * 1024), rows = Some(100L))), Nil)
      }
      val at = store.latestVersion()
      val (secIncr, _) = time(store.checkpoint())
      val live = store.liveSegmentInfos().size
      require(live == nSegs + 10,
        s"incremental checkpoint must replay whole: $live")
      out += Measurement("src_ckpt_incr", scale, nSegs.toLong,
        secIncr, bytesAt(at))
      System.err.println(s"[scale] ${out.last.json}")
    }
    // DISTRIBUTED t$segments — the per-file ops view past the driver
    // threshold: a wide table (10⁴ → 10⁵ → 10⁶ live segments, stats +
    // 1 KB Bloom each, sharded checkpoint) serves describeSegments as
    // a distributed scan of the checkpoint part files (executors
    // parse + measure; the driver replays only the suffix). sec = the
    // full view materialized (count); the `_driver` twin forces the
    // O(live) single-threaded driver walk on identical content —
    // measured to 10⁵ (at 10⁶ it is minutes of driver time, the cost
    // the distributed path exists to delete). Both must agree on the
    // row count (required).
    if (only.isEmpty || only.contains("src_segments")) {
      val nSegs = 10000 * scale
      val perCommit = 1000
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-seg").toString + "/t"
      val store = new graft.catalog.LogStore(spark, root,
        statsCol = Some("id"), checkpointInterval = Int.MaxValue,
        checkpointShardRows = 4096)
      (0 until nSegs / perCommit).foreach { c =>
        store.commit(c.toLong,
          (0 until perCommit).map { j =>
            val i = c * perCommit + j
            store.Segment(s"seg-$i", Some((i * 10).toString),
              Some((i * 10 + 9).toString), num = true,
              bloom = Some("f" * 1024), rows = Some(100L))
          }, Nil)
      }
      store.checkpoint()
      // a small suffix after the checkpoint — the merge path is part
      // of what is measured
      store.commit(store.latestVersion() + 1,
        Seq(store.Segment("seg-suffix", Some("0"), Some("9"),
          num = true, rows = Some(10L))), Seq("seg-7"))
      val (sec, nDist) = time {
        store.describeSegments(distributedOver = 1L).count()
      }
      require(nDist == nSegs.toLong,
        s"distributed ops view row count: $nDist vs $nSegs")
      out += Measurement("src_segments", scale, nSegs.toLong, sec,
        nDist)
      System.err.println(s"[scale] ${out.last.json}")
      if (scale <= 10) {
        val (secD, nDrv) = time {
          store.describeSegments(distributedOver = Long.MaxValue)
            .count()
        }
        require(nDrv == nDist, "both paths must agree")
        out += Measurement("src_segments_driver", scale, nSegs.toLong,
          secD, nDrv)
        System.err.println(s"[scale] ${out.last.json}")
      }
    }
    // pruned MaxSim with the cell-count recipe (nCells ∝ corpus, the
    // config a growing deployment runs): per-cell token occupancy
    // stays bounded, so candidate pairs track probed-cell
    // co-occurrence — near-flat per query — instead of |Q|×|D|
    if (only.isEmpty || only.contains("ann_maxsim_pruned")) {
      val toks = array((0 until 4).map(j =>
        slice(col("embedding"), j * 16 + 1, 16)): _*)
      val mvDocs = emb.select(col("vec_id"), toks.as("tokens"))
      val mvQ = mvDocs.where(col("vec_id") < 8)
      val (sec, cand) = time {
        val (res, c, _) = Similarity.maxSimTopKPruned(mvDocs, mvQ,
          k = 5, qTokens = 4, nCells = 16 * scale, nProbe = 2)
        exhaust(res); c
      }
      out += Measurement("ann_maxsim_pruned", scale, nEmb, sec, cand)
      System.err.println(s"[scale] ${out.last.json}")
    }
    // CHECK-constraint gate overhead: the same append with and
    // without a recorded constraint — the throwing filter rides the
    // write's own pass (codegen'd), so the gated wall must track the
    // plain wall, not add a second scan of the batch
    if (only.isEmpty || only.contains("src_check_gate")) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-scale-ck").toString
      val plain = new graft.catalog.LogStore(spark, s"$dir/plain")
      val (secOff, _) = time { plain.append(vals) }
      out += Measurement("src_check_gate_off", scale, nVals, secOff)
      System.err.println(s"[scale] ${out.last.json}")
      val gated = new graft.catalog.LogStore(spark, s"$dir/gated")
      gated.create(vals.schema)
      gated.addCheckConstraint("v_ok",
        "value >= 0 AND value < 1000000 AND id IS NOT NULL")
      val (secOn, _) = time { gated.append(vals) }
      out += Measurement("src_check_gate_on", scale, nVals, secOn)
      System.err.println(s"[scale] ${out.last.json}")
    }
    docs.unpersist(); emb.unpersist(); vals.unpersist(); edges.unpersist()
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val scales = args.headOption.getOrElse("1,10")
      .split(',').map(_.trim.toInt).toSeq
    val only = args.drop(1).headOption
      .map(_.split(',').map(_.trim).toSet).getOrElse(Set.empty[String])
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = scales.flatMap(s => measureScale(spark, s, only))
    println(all.map(_.json).mkString("[", ",\n", "]"))
    spark.stop()
  }
}
