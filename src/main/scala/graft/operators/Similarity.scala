package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{vec_dot, vec_norm}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: brute-force top-k is the correctness baseline — a
  * broadcast of the (small) query set against a full scan of the corpus,
  * embarrassingly parallel, no shuffle until the final per-query top-k
  * (`Window` + rank, executed as partial top-k per partition). Norms are
  * precomputed ONCE per vector (not per pair), and the pairwise dot
  * product is the native codegen'd [[graft.functions.VecDot]] — the
  * n×m hot loop does exactly one fused multiply-add pass per pair.
  * The LSH variant (deterministic random-hyperplane signs) buckets the
  * corpus so each query only scans its bucket — the 100 TB path. Its
  * hyperplane sign matrix is data-independent, so it is computed ONCE on
  * the driver and shipped as literal arrays: each signature bit is one
  * codegen'd VecDot against a constant row, never a per-row hash.
  *
  * Determinism: floats widen to double before multiply, dot accumulates
  * sequentially in index order, `sqrt` is IEEE-correctly-rounded —
  * identical bits in any engine that does the same.
  */
object Similarity {

  /** Sequential-fold dot product in double (native codegen). */
  def dot(a: Column, b: Column): Column = vec_dot(a, b)

  def norm(a: Column): Column = vec_norm(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"),
      vec_norm(col("embedding")).as("nrm"))

  private def pairCos: Column =
    vec_dot(col("q.embedding"), col("c.embedding")) /
      (col("q.nrm") * col("c.nrm"))

  /** Hard-negative mining for contrastive training (the in-batch /
    * corpus-level negatives of DPR, Karpukhin et al. 2020 — public):
    * for each query vector, the k most-similar corpus vectors whose
    * `label` DIFFERS from the query's — the near-miss examples a
    * contrastive loss learns the most from, as opposed to random
    * negatives it already separates.
    *
    * Same execution shape as [[bruteForceTopK]]: broadcast the (small)
    * query set, one codegen'd VecDot pass per (corpus row, query), then
    * a per-query partial top-k — the label inequality just rides the
    * join condition, so mismatched-label pairs are dropped before the
    * rank shuffle. Output: (query_id, query_label, rank, neighbor_id,
    * neighbor_label, cos). */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
      k: Int = 3): DataFrame = {
    def prep(df: DataFrame): DataFrame =
      df.select(col("vec_id"), col("label"), col("embedding"),
        vec_norm(col("embedding")).as("nrm"))
    val joined = prep(corpus).as("c")
      .join(broadcast(prep(queries).as("q")),
        col("q.vec_id") =!= col("c.vec_id") &&
          col("q.label") =!= col("c.label"))
      .select(col("q.vec_id").as("query_id"),
        col("q.label").as("query_label"),
        col("c.vec_id").as("neighbor_id"),
        col("c.label").as("neighbor_label"), pairCos.as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("query_label"), col("rank"),
        col("neighbor_id"), col("neighbor_label"), col("cos"))
  }

  /** Triplet mining for metric learning (Schroff et al. 2015, FaceNet
    * — public): for each anchor query, its single best positive
    * (most-similar SAME-label vector) and single hardest negative
    * (most-similar different-label vector), plus the margin
    * `pos_cos − neg_cos` the triplet loss would push on. A negative
    * margin flags the anchors currently misordered in embedding space
    * — the curriculum signal for hard-example training.
    *
    * One broadcast pass computes every (corpus, query) cosine tagged
    * with a same-label flag; a window ranked within (query, flag)
    * keeps the two winners; a conditional aggregation folds them into
    * one row per anchor. Anchors missing either side (no same-label or
    * no different-label candidate) are dropped — a triplet needs both.
    * Output: (query_id, query_label, pos_id, pos_cos, neg_id, neg_cos,
    * margin). */
  def tripletMining(corpus: DataFrame, queries: DataFrame): DataFrame = {
    def prep(df: DataFrame): DataFrame =
      df.select(col("vec_id"), col("label"), col("embedding"),
        vec_norm(col("embedding")).as("nrm"))
    val pairs = prep(corpus).as("c")
      .join(broadcast(prep(queries).as("q")),
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"),
        col("q.label").as("query_label"),
        col("c.vec_id").as("neighbor_id"),
        (col("c.label") === col("q.label")).as("is_pos"),
        pairCos.as("cos"))
    val w = Window.partitionBy(col("query_id"), col("is_pos"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs.withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .groupBy(col("query_id"), col("query_label"))
      .agg(
        max(when(col("is_pos"), col("neighbor_id"))).as("pos_id"),
        max(when(col("is_pos"), col("cos"))).as("pos_cos"),
        max(when(!col("is_pos"), col("neighbor_id"))).as("neg_id"),
        max(when(!col("is_pos"), col("cos"))).as("neg_cos"))
      .where(col("pos_id").isNotNull && col("neg_id").isNotNull)
      .withColumn("margin", col("pos_cos") - col("neg_cos"))
  }

  /** Brute-force cosine top-k: every query row (broadcast) against the
    * whole corpus; per-query rank with deterministic tie-break on
    * neighbor id. Output: (query_id, rank, neighbor_id, cos). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      k: Int = 5): DataFrame = {
    val joined = withNorm(corpus).as("c")
      .join(broadcast(withNorm(queries).as("q")),
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"), pairCos.as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  // ---------------------------------------------------------------
  // Late interaction (multi-vector / MaxSim) retrieval
  // ---------------------------------------------------------------

  /** One row per token of a multi-vector relation (vec_id,
    * tokens ARRAY<ARRAY<FLOAT>>): (id, pos, tok, nrm). The shared
    * front half of the MaxSim operators. */
  private def tokenRows(df: DataFrame, idOut: String, posOut: String,
      tokOut: String, nrmOut: String): DataFrame =
    df.select(col("vec_id").as(idOut),
        posexplode(col("tokens")).as(Seq(posOut, tokOut)))
      .withColumn(nrmOut, vec_norm(col(tokOut)))

  /** The shared back half: per-(query, doc) MaxSim over a token-pair
    * relation (query_id, doc_id, q_pos, cos) — per-query-token maxima
    * pivoted into `qTokens` columns and summed in FIXED order, so the
    * double-sum is bit-reproducible under any partitioning (a
    * groupBy-sum of doubles would re-associate); doc token counts may
    * vary freely (max is order-insensitive). */
  /** The fixed query-token budget is load-bearing: a query with MORE
    * tokens would silently drop the excess from the pivot sum, one
    * with FEWER would null its whole score — both are silent garbage,
    * so the budget is checked loudly (one tiny job on the
    * already-small query side). */
  private def requireQueryBudget(queries: DataFrame,
      qTokens: Int): Unit = {
    val off = queries
      .where(size(col("tokens")) =!= qTokens)
      .select(col("vec_id")).limit(1).collect()
    require(off.isEmpty,
      s"query ${off.mkString} does not carry exactly qTokens = " +
        s"$qTokens token vectors — MaxSim's fixed-order sum needs " +
        "the declared budget")
  }

  private def maxSimRank(pairTok: DataFrame, k: Int,
      qTokens: Int): DataFrame = {
    val perPair = pairTok
      .groupBy(col("query_id"), col("doc_id"))
      .agg(max(when(col("q_pos") === 0, col("cos"))).as("m_0"),
        (1 until qTokens).map(j =>
          max(when(col("q_pos") === j, col("cos"))).as(s"m_$j")): _*)
    val score = (0 until qTokens).map(j => col(s"m_$j"))
      .reduceLeft(_ + _)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("maxsim").desc, col("neighbor_id").asc)
    perPair.withColumn("maxsim", score)
      .withColumnRenamed("doc_id", "neighbor_id")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("maxsim"))
  }

  /** Late-interaction (multi-vector) retrieval — MaxSim (Khattab &
    * Zaharia's ColBERT, SIGIR'20 §3.1, public): score(q, d) =
    * Σ_{t ∈ q.tokens} max_{u ∈ d.tokens} cos(t, u). Both relations
    * are (vec_id, tokens ARRAY<ARRAY<FLOAT>>); `qTokens` is the FIXED
    * query token budget (ColBERT fixes the query length by design —
    * it is also what makes the score a fixed-order sum, hence
    * bit-reproducible). This is the brute-force arm: every query
    * token against every doc token, queries broadcast — the oracle
    * baseline [[maxSimTopKPruned]] is measured against. Output:
    * (query_id, rank, neighbor_id, maxsim). */
  def maxSimTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      qTokens: Int = 4): DataFrame = {
    requireQueryBudget(queries, qTokens)
    val d = tokenRows(corpus, "doc_id", "d_pos", "d_tok", "d_nrm")
    val q = tokenRows(queries, "query_id", "q_pos", "q_tok", "q_nrm")
    val cosE = vec_dot(col("q_tok"), col("d_tok")) /
      (col("q_nrm") * col("d_nrm"))
    maxSimRank(d
      .join(broadcast(q), col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"), col("q_pos"),
        cosE.as("cos")), k, qTokens)
  }

  /** Pruned MaxSim — the two-stage shape production late-interaction
    * systems converge on (per-token candidate generation over a
    * centroid codebook, then exact MaxSim on the candidate set only —
    * the design PLAID/ColBERTv2 describe publicly, re-derived on this
    * codebase's deterministic-codebook policy): doc tokens are
    * assigned to their argmax-cosine cell of the first-`nCells`
    * token-space codebook (tokens in (vec_id, position) order); each
    * query token probes its `nProbe` nearest cells; a doc is a
    * CANDIDATE iff any of its tokens sits in any probed cell. Exact
    * MaxSim then scores candidates only, so the scored-pair count
    * tracks probed-cell co-occurrence, not |Q|×|D| — at 100 TB the
    * candidate join is a shuffle on cell id over m-token rows, never
    * an all-pairs product. Returns (results, candidatePairs,
    * fullPairs) — the sub-quadratic evidence. */
  def maxSimTopKPruned(corpus: DataFrame, queries: DataFrame,
      k: Int = 5, qTokens: Int = 4, nCells: Int = 16, nProbe: Int = 2)
      : (DataFrame, Long, Long) = {
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    requireQueryBudget(queries, qTokens)
    val d = tokenRows(corpus, "doc_id", "d_pos", "d_tok", "d_nrm")
    val q = tokenRows(queries, "query_id", "q_pos", "q_tok", "q_nrm")
    val cents = d.orderBy(col("doc_id"), col("d_pos")).limit(nCells)
      .select(col("d_tok"), col("d_nrm")).collect()
      .map(r => (r.getSeq[Float](0), r.getDouble(1)))
    require(cents.length == nCells,
      s"corpus has only ${cents.length} tokens; the deterministic " +
        s"first-$nCells token codebook needs at least $nCells")
    def cellCos(tok: Column, nrm: Column, ce: Seq[Float], cn: Double) =
      vec_dot(tok, typedLit(ce)) / (nrm * lit(cn))
    // argmax assignment, ties to the lower cell (the IVF discipline)
    def assignCol(tok: Column, nrm: Column): Column =
      (-greatest(cents.zipWithIndex.map { case ((ce, cn), pos) =>
        struct(cellCos(tok, nrm, ce, cn).as("c"),
          lit(-pos).as("negpos"))
      }: _*).getField("negpos")).cast("long")
    def probeCol(tok: Column, nrm: Column): Column =
      slice(array_sort(array(cents.zipWithIndex.map {
        case ((ce, cn), pos) =>
          struct((-cellCos(tok, nrm, ce, cn)).as("negc"),
            lit(pos.toLong).as("cell"))
      }: _*)), 1, nProbe)
    val dCells = d.select(col("doc_id"),
      assignCol(col("d_tok"), col("d_nrm")).as("cell")).distinct()
    val qCells = q.select(col("query_id"),
        explode(probeCol(col("q_tok"), col("q_nrm"))).as("probe"))
      .select(col("query_id"), col("probe.cell").as("cell"))
      .distinct()
    val candidates = dCells
      .join(broadcast(qCells), Seq("cell"))
      .where(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id")).distinct()
      .localCheckpoint(true) // counted AND joined below
    val cosE = vec_dot(col("q_tok"), col("d_tok")) /
      (col("q_nrm") * col("d_nrm"))
    val pairTok = candidates
      .join(d, Seq("doc_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("doc_id"), col("q_pos"),
        cosE.as("cos"))
    val full = corpus.count() * queries.count()
    (maxSimRank(pairTok, k, qTokens), candidates.count(), full)
  }

  /** Deterministic pseudo-random hyperplane sign for (plane p, dim d):
    * ±1 from the parity of the first hex digit of md5("p|d"). Data-
    * independent, hence driver-side; the same definition is replicable
    * in any engine with md5, which is what the DuckDB oracle does. */
  def planeSign(p: Int, d: Int): Double = {
    val digest = MessageDigest.getInstance("MD5")
      .digest(s"$p|$d".getBytes(StandardCharsets.UTF_8))
    val firstHex = (digest(0) >> 4) & 0xf
    ((firstHex % 2) * 2 - 1).toDouble
  }

  /** The (planes × dims) hyperplane sign matrix, computed once. */
  def signMatrix(planes: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(planes, dims)((p, d) => planeSign(p, d))

  /** Random-hyperplane (sign-)LSH signature with `planes` bits: bit p =
    * [Σ_d sign(p,d) · v_d > 0]. Each bit is a codegen'd dot product
    * against a constant sign row — no per-row hashing, no lambda
    * interpretation on the 100 TB path. */
  def lshSignature(embedding: Column, planes: Int, dims: Int): Column = {
    val m = signMatrix(planes, dims)
    (0 until planes).map { p =>
      when(vec_dot(embedding, typedLit(m(p).toSeq)) > 0, lit(1 << p))
        .otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Multi-table, multi-probe LSH approximate top-k: `tables`
    * independent sign-LSH hash tables (table t uses its own `planes`
    * rows of the shared hyperplane matrix), each corpus vector bucketed
    * once per table, each query probing its own bucket plus every
    * bucket at Hamming distance 1 (flip one plane) in EVERY table —
    * the classic L-tables × multi-probe recall lever: a true neighbor
    * is missed only if it disagrees with the query in every probed
    * bucket of every table, so recall ≈ 1−(1−p)^L while cost stays
    * L·(planes+1)/2^planes of the corpus.
    *
    * Scale shape: the candidate join moves ONLY (vec_id, table, sig)
    * triples — never embeddings; candidate pairs are distinct'd before
    * the exact-cosine verify joins the vectors back (the same
    * id-only-banding discipline as [[lshNearDupPairs]]). Every reported
    * score is exact. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      planes: Int = 8, dims: Int = 64, tables: Int = 1): DataFrame = {
    val m = signMatrix(tables * planes, dims)
    def sigFor(t: Int): Column = (0 until planes).map { p =>
      when(vec_dot(col("embedding"), typedLit(m(t * planes + p).toSeq)) > 0,
        lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
    // id-only banded corpus relation: (vec_id, t, sig)
    val sigCorpus = corpus.select(col("vec_id"),
        explode(array((0 until tables).map(t =>
          struct(lit(t).as("t"), sigFor(t).as("sig"))): _*)).as("ts"))
      .select(col("vec_id"), col("ts.t").as("t"), col("ts.sig").as("sig"))
    // query probes: each table's signature computed once, then fanned
    // into the identity bucket + its `planes` Hamming-1 flips
    val withSigs = queries.select(col("vec_id") +:
      (0 until tables).map(t => sigFor(t).as(s"_sig_$t")): _*)
    val probes = withSigs.select(col("vec_id").as("q_id"),
        explode(array((0 until tables).flatMap { t =>
          struct(lit(t).as("t"), col(s"_sig_$t").as("sig")) +:
            (0 until planes).map(p => struct(lit(t).as("t"),
              col(s"_sig_$t").bitwiseXOR(lit(1 << p)).as("sig")))
        }: _*)).as("ts"))
      .select(col("q_id"), col("ts.t").as("t"), col("ts.sig").as("sig"))
    val candidates = sigCorpus.as("c")
      .join(broadcast(probes).as("q"),
        col("q.t") === col("c.t") && col("q.sig") === col("c.sig") &&
        col("q.q_id") =!= col("c.vec_id"))
      .select(col("q.q_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"))
      .distinct()
    val scored = candidates
      .join(withNorm(corpus).as("c"),
        col("neighbor_id") === col("c.vec_id"))
      .join(broadcast(withNorm(queries).as("q")),
        col("query_id") === col("q.vec_id"))
      .select(col("query_id"), col("neighbor_id"), pairCos.as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** IVF-style approximate top-k: a deterministic coarse quantizer (the
    * first `nCells` corpus vectors act as centroids), every vector
    * assigned to its nearest centroid, and each query probing only its
    * `nProbe` closest cells. The inverted-file structure is the classic
    * billion-scale ANN layout: the corpus partitions by cell, a query
    * touches nProbe/nCells of the data.
    *
    * The codebook is tiny (nCells vectors), so it is collected ONCE on
    * the driver — the Spark analogue of shipping a trained quantizer
    * with the job — and inlined as literal arrays. Cell assignment is
    * then a per-row argmax over constants (`array_max` over
    * struct(cos, -cell_id), replicating the cos DESC / cell_id ASC
    * tie-break): zero joins, zero row expansion, zero shuffle between
    * the corpus scan and the bucketed candidate join. Deterministic by
    * construction (no trained k-means), so results are reproducible
    * run-to-run. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    // greatest()/array_sort over the centroid structs need >= 2 cells;
    // one cell is also no inverted file at all
    require(nCells >= 2, s"nCells must be >= 2, got $nCells")
    val cents: Array[(Long, Seq[Float], Double)] =
      withNorm(corpus).orderBy(col("vec_id")).limit(nCells)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))

    def cellCos(cEmb: Seq[Float], cNrm: Double): Column =
      vec_dot(col("embedding"), typedLit(cEmb)) / (col("nrm") * lit(cNrm))

    // corpus side: argmax cell per vector, no expansion and no shuffle;
    // greatest() over the struct literals (not array_max over a built
    // array) keeps the comparison chain inside whole-stage codegen
    val bestStruct = greatest(cents.map { case (cid, ce, cn) =>
      struct(cellCos(ce, cn).as("c"), lit(-cid).as("negid"))
    }: _*)
    val assigned = withNorm(corpus)
      .withColumn("cell_id", -bestStruct.getField("negid"))

    // query side: nProbe closest cells — sort the per-row struct array
    // ascending by (-cos, cell_id) and slice the head
    val probeStructs = array_sort(array(cents.map { case (cid, ce, cn) =>
      struct((-cellCos(ce, cn)).as("negc"), lit(cid).as("cell_id"))
    }: _*))
    val probes = withNorm(queries)
      .withColumn("probe", explode(slice(probeStructs, 1, nProbe)))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("probe.cell_id").as("cell_id"))

    val joined = assigned.as("c")
      .join(broadcast(probes).as("q"),
        col("q.cell_id") === col("c.cell_id") &&
        col("q.q_id") =!= col("c.vec_id"))
      .select(col("q.q_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        (vec_dot(col("q.q_emb"), col("c.embedding")) /
          (col("q.q_nrm") * col("c.nrm"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Product-quantization ANN (Jégou, Douze & Schmid, TPAMI'11 —
    * public): embeddings compress to `m` sub-codebook codes (one byte
    * each at ksub ≤ 256), and query-to-vector distance is approximated
    * by ADC — asymmetric distance computation: the query stays exact,
    * each corpus vector contributes only its codes, and the distance is
    * the sum of per-subspace distances from the query subvector to the
    * assigned codeword. The memory shape that makes billion-scale ANN
    * fit: 100 TB of float vectors become m bytes/vector plus a constant
    * codebook.
    *
    * Deterministic variant (no trained k-means, same policy as
    * [[ivfTopK]]): the codebook is the first `ksub` corpus vectors' su-
    * bvectors, collected once driver-side and inlined as literals.
    * Encoding is a per-row argmin over constant structs — zero joins,
    * zero expansion, zero shuffle on the corpus scan; every subspace
    * distance is `|v|² − 2·v·c + |c|²` with the dot through the native
    * codegen'd VecDot. ADC then joins broadcast queries (each carrying
    * its m×ksub lookup table as literal-built arrays) against the
    * (vec_id, code_0..m) relation — the only per-pair work is m
    * `element_at` picks and a fixed-order m-term sum, bit-reproducible
    * in any engine that mirrors the expression. Output: (query_id,
    * rank, neighbor_id, approx_dist). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      m: Int = 4, dims: Int = 64, ksub: Int = 16): DataFrame = {
    require(dims % m == 0, "dims must split evenly into m subspaces")
    val sub = dims / m
    // codebook: ksub × m subvectors with their precomputed |c|², in
    // double exactly as the per-row expressions widen floats
    val cents: Array[Seq[Float]] =
      corpus.orderBy(col("vec_id")).limit(ksub)
        .select(col("embedding")).collect().map(_.getSeq[Float](0))
    require(cents.length == ksub,
      s"corpus has only ${cents.length} vectors; the deterministic " +
        s"first-$ksub codebook needs at least ksub = $ksub")
    def cw(j: Int, i: Int): Seq[Double] =
      cents(i).slice(j * sub, (j + 1) * sub).map(_.toDouble)
    def cc(j: Int, i: Int): Double =
      cw(j, i).foldLeft(0.0)((acc, x) => acc + x * x)

    // flat codebook for the native codec: cwFlat[((j·ksub)+i)·sub + d],
    // ccFlat[(j·ksub)+i] — the per-(j,i) encode/table loops then run at
    // RUNTIME inside graft.functions.PqCodec instead of as m·ksub
    // unrolled expression terms, which at m=8/ksub=32 grew the
    // generated Java past Janino's 64 KB method limit (failed compile
    // per execution + interpreted fallback). Identical IEEE ops in
    // identical order (see PqCodec's parity contract).
    val cwFlat: Seq[Double] = for {
      j <- 0 until m; i <- 0 until ksub; x <- cw(j, i)
    } yield x
    val ccFlat: Seq[Double] = for {
      j <- 0 until m; i <- 0 until ksub
    } yield cc(j, i)
    pqAdc(corpus, queries, k, m, sub, ksub, cwFlat, ccFlat)
  }

  /** PQ with TRAINED per-subspace codebooks: each of the m subspaces
    * runs its own [[kMeansCentroids]] over the corpus' sliced
    * subvectors (init = the same first-ksub-by-id policy the literal
    * codebook uses, then `iters` Lloyd rounds), and the trained means
    * are inlined through the identical zero-shuffle encode/ADC path as
    * [[pqTopK]] — Jégou et al.'s actual training procedure (TPAMI'11
    * §II: independent k-means per sub-quantizer), kept deterministic
    * by the seedless init so the unrolled-CTE oracle replays the full
    * trajectory bit-for-bit.
    *
    * Scale: training is m independent bounded-iteration k-means runs
    * (m·iters corpus scans, each zero-shuffle assignment + map-side
    * collapsed mean recompute — see [[kMeansCentroids]]); the search
    * path is byte-codes + broadcast tables, unchanged. */
  def pqTopKTrained(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      m: Int = 4, dims: Int = 64, ksub: Int = 16,
      iters: Int = 2): DataFrame = {
    require(dims % m == 0, "dims must split evenly into m subspaces")
    val sub = dims / m
    val books: IndexedSeq[Array[Seq[Double]]] = (0 until m).map { j =>
      kMeansCentroids(
        corpus.select(col("vec_id"),
          slice(col("embedding"), j * sub + 1, sub).as("embedding")),
        ksub, iters)
    }
    val cwFlat: Seq[Double] = for {
      j <- 0 until m; i <- 0 until ksub; x <- books(j)(i)
    } yield x
    val ccFlat: Seq[Double] = for {
      j <- 0 until m; i <- 0 until ksub
    } yield books(j)(i).foldLeft(0.0)((a, x) => a + x * x)
    pqAdc(corpus, queries, k, m, sub, ksub, cwFlat, ccFlat)
  }

  /** The shared PQ encode + ADC search under a flat codebook — the
    * tail of [[pqTopK]]/[[pqTopKTrained]]; see pqTopK for the memory
    * shape and parity contract. */
  private def pqAdc(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int, sub: Int, ksub: Int, cwFlat: Seq[Double],
      ccFlat: Seq[Double]): DataFrame = {
    import graft.functions.PqFunctions.{pq_adc_tables, pq_encode}
    val encoded = corpus
      .select(col("vec_id"),
        pq_encode(col("embedding"), m, sub, ksub, cwFlat, ccFlat)
          .as("_codes"))
      .select(col("vec_id") +:
        (0 until m).map(j =>
          element_at(col("_codes"), j + 1).as(s"code_$j")): _*)
    // per-query ADC lookup tables: qd_j[i] = dist²(q_sub_j, c_{j,i})
    val tabled = queries
      .select(col("vec_id").as("query_id"),
        pq_adc_tables(col("embedding"), m, sub, ksub, cwFlat, ccFlat)
          .as("_qds"))
      .select(col("query_id") +:
        (0 until m).map(j =>
          element_at(col("_qds"), j + 1).as(s"qd_$j")): _*)
    val adc = (0 until m).map(j =>
      element_at(col(s"qd_$j"), col(s"code_$j") + 1)).reduceLeft(_ + _)
    val joined = encoded.as("c")
      .join(broadcast(tabled).as("q"),
        col("q.query_id") =!= col("c.vec_id"))
      .select(col("q.query_id"), col("c.vec_id").as("neighbor_id"),
        adc.as("approx_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dist").asc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("approx_dist"))
  }

  /** PQ-ADC shortlist + EXACT cosine re-rank — the "+R" refinement of
    * Jégou et al.'s IVFADC (TPAMI'11 §V, public): the quantized ADC
    * distance only has to be good enough to put true neighbors inside
    * a `shortlist`-sized candidate set; the final ranking re-scores
    * those few candidates against the full-precision vectors. Recall
    * then degrades with P[true neighbor outside top-`shortlist` by
    * ADC] instead of P[ADC misorders the top-k] — the standard way a
    * byte-compressed index reaches high recall without abandoning the
    * m-bytes-per-vector memory shape.
    *
    * Scale: the corpus-wide scan still reads only codes (m bytes per
    * vector); exactly `shortlist` full vectors per query are fetched
    * for the re-rank join — at 100 TB that is the difference between
    * re-reading the corpus and re-reading kilobytes. Every reported
    * score is exact cosine. */
  def pqTopKReranked(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      m: Int = 8, dims: Int = 64, ksub: Int = 32,
      shortlist: Int = 50): DataFrame = {
    val candidates = pqTopK(corpus, queries, k = shortlist,
        m = m, dims = dims, ksub = ksub)
      .select(col("query_id"), col("neighbor_id"))
    val scored = candidates
      .join(withNorm(corpus).as("c"),
        col("neighbor_id") === col("c.vec_id"))
      .join(broadcast(withNorm(queries).as("q")),
        col("query_id") === col("q.vec_id"))
      .select(col("query_id"), col("neighbor_id"), pairCos.as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** IVFADC(+R): the composed coarse-quantizer + residual product
    * quantizer of Jégou, Douze & Schmid (TPAMI'11 §V, public) — the
    * published billion-scale ANN layout. [[ivfTopK]]'s inverted file
    * bounds WHERE a query looks (nProbe of nCells cells); PQ encodes
    * the RESIDUAL r = v − centroid(cell) of each vector, which is far
    * better conditioned than the raw vector (residual energy ≪ vector
    * energy), so the same m bytes/vector buy materially higher recall
    * than raw-vector PQ; the exact cosine re-rank of the ADC shortlist
    * then lifts recall@k to P[true neighbor inside the shortlist].
    *
    * Deterministic variant, consistent with this file's no-trained-
    * k-means policy: coarse centroids are the first `nCells` corpus
    * vectors; the residual codebook is the residuals of the first
    * `ksub` corpus vectors w.r.t. their OWN assigned cells — both
    * bounded driver-side collects, inlined as literals.
    *
    * Scale shape: cell assignment and residual encoding are per-row
    * native codegen'd expressions (zero joins, zero expansion, zero
    * shuffle on the corpus scan — [[graft.functions.PqCodec]] residual
    * twins); the candidate join moves only (vec_id, cell, m codes);
    * queries broadcast with nProbe per-cell ADC tables; exactly
    * `shortlist` full vectors per query are re-read for the re-rank.
    * Output: (query_id, rank, neighbor_id) — ids only, float-free. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 4, m: Int = 8, dims: Int = 64,
      ksub: Int = 32, shortlist: Int = 50): DataFrame = {
    require(dims % m == 0, "dims must split evenly into m subspaces")
    require(nCells >= 2, s"nCells must be >= 2, got $nCells")
    val sub = dims / m
    val cents: Array[(Long, Seq[Float], Double)] =
      withNorm(corpus).orderBy(col("vec_id")).limit(nCells)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
    def cellCos(cEmb: Seq[Float], cNrm: Double): Column =
      vec_dot(col("embedding"), typedLit(cEmb)) / (col("nrm") * lit(cNrm))

    // per-row argmax cell, carried as the dense centroid POSITION
    // (pos 0.. in vec_id order) — ties break to the lowest position,
    // i.e. the lowest centroid vec_id, same as ivfTopK
    val bestStruct = greatest(cents.zipWithIndex.map {
      case ((_, ce, cn), pos) =>
        struct(cellCos(ce, cn).as("c"), lit(-pos).as("negpos"))
    }: _*)
    val assigned = withNorm(corpus)
      .withColumn("cell_pos", (-bestStruct.getField("negpos")).cast("int"))

    // flat centroid table for the residual codec: cent[pos·dims + d]
    val centFlat: Seq[Double] =
      cents.toSeq.flatMap(_._2.map(_.toDouble))

    // residual codebook: the first ksub vectors' residuals w.r.t.
    // their own cells — assignment read back from the SAME expression
    // arithmetic the corpus uses, so the oracle replicates it exactly
    val cbRows: Array[(Seq[Float], Int)] = assigned
      .orderBy(col("vec_id")).limit(ksub)
      .select(col("embedding"), col("cell_pos"))
      .collect().map(r => (r.getSeq[Float](0), r.getInt(1)))
    require(cbRows.length == ksub,
      s"corpus has only ${cbRows.length} vectors; the deterministic " +
        s"first-$ksub residual codebook needs at least ksub = $ksub")
    def resOf(emb: Seq[Float], pos: Int): IndexedSeq[Double] =
      (0 until dims).map(d => emb(d).toDouble - centFlat(pos * dims + d))
    val cbRes: Array[IndexedSeq[Double]] =
      cbRows.map { case (emb, pos) => resOf(emb, pos) }
    def cw(j: Int, i: Int): Seq[Double] =
      cbRes(i).slice(j * sub, (j + 1) * sub)
    def cc(j: Int, i: Int): Double =
      cw(j, i).foldLeft(0.0)((acc, x) => acc + x * x)
    val cwFlat: Seq[Double] = for {
      j <- 0 until m; i <- 0 until ksub; x <- cw(j, i)
    } yield x
    val ccFlat: Seq[Double] = for {
      j <- 0 until m; i <- 0 until ksub
    } yield cc(j, i)

    import graft.functions.PqFunctions.{pq_adc_tables_res, pq_encode_res}
    val encoded = assigned
      .select(col("vec_id"), col("cell_pos"),
        pq_encode_res(col("embedding"), col("cell_pos"), m, sub, ksub,
          cwFlat, ccFlat, centFlat).as("_codes"))
      .select(col("vec_id") +: col("cell_pos") +:
        (0 until m).map(j =>
          element_at(col("_codes"), j + 1).as(s"code_$j")): _*)

    // query probes: nProbe closest cells (cos desc, pos asc), each
    // probe row carrying the residual ADC tables vs. THAT cell
    val probeStructs = array_sort(array(cents.zipWithIndex.map {
      case ((_, ce, cn), pos) =>
        struct((-cellCos(ce, cn)).as("negc"), lit(pos).as("cell_pos"))
    }: _*))
    val probes = withNorm(queries)
      .withColumn("probe", explode(slice(probeStructs, 1, nProbe)))
      .select(col("vec_id").as("query_id"),
        col("probe.cell_pos").cast("int").as("cell_pos"),
        pq_adc_tables_res(col("embedding"),
          col("probe.cell_pos").cast("int"), m, sub, ksub,
          cwFlat, ccFlat, centFlat).as("_qds"))
      .select(col("query_id") +: col("cell_pos") +:
        (0 until m).map(j =>
          element_at(col("_qds"), j + 1).as(s"qd_$j")): _*)

    val adc = (0 until m).map(j =>
      element_at(col(s"qd_$j"), col(s"code_$j") + 1)).reduceLeft(_ + _)
    val candidates = encoded.as("c")
      .join(broadcast(probes).as("q"),
        col("q.cell_pos") === col("c.cell_pos") &&
        col("q.query_id") =!= col("c.vec_id"))
      .select(col("q.query_id"), col("c.vec_id").as("neighbor_id"),
        adc.as("approx_dist"))
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dist").asc, col("neighbor_id").asc)
    val sl = candidates.withColumn("rn", row_number().over(ws))
      .where(col("rn") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))

    val scored = sl
      .join(withNorm(corpus).as("c"),
        col("neighbor_id") === col("c.vec_id"))
      .join(broadcast(withNorm(queries).as("q")),
        col("query_id") === col("q.vec_id"))
      .select(col("query_id"), col("neighbor_id"), pairCos.as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Per-group mean embeddings (centroids) — the building block behind
    * trained quantizers, per-source drift monitoring, and cluster
    * summaries. One posexplode + one (group, dim) aggregation; the
    * per-dimension sum — the only order-sensitive float step —
    * accumulates in DECIMAL(38,18) (the dsum pattern), so centroids
    * are bit-reproducible under any partitioning and in any engine
    * with the same decimal semantics. Output is the FLAT (group, pos,
    * mean, n) relation: dimension count is bounded, and flat rows
    * hash-compare exactly where array columns cannot. */
  def groupCentroids(df: DataFrame, groupCol: String,
      embCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    df.select(col(groupCol).as("g"),
        posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy(col("g"), col("pos"))
      // float → STRING → decimal: a float's shortest repr carries ≤9
      // significant digits, so the decimal parse is EXACT at scale 18
      // in every engine — whereas float/double → decimal directly
      // rounds Spark's shortest-repr but DuckDB's full binary
      // expansion, which disagree in the last decimal digit
      .agg(sum(col("v").cast("string").cast(DecimalType(38, 18)))
          .as("dsum"),
        count(lit(1)).as("n"))
      .select(col("g"), col("pos"),
        (col("dsum").cast("double") / col("n").cast("double")).as("mean"),
        col("n"))
  }

  /** Lloyd's k-means over the embedding column (Lloyd 1982, public) —
    * the TRAINED-quantizer complement to the deterministic first-k
    * codebooks used by [[ivfTopK]]/[[semanticDedup]]: same init (the
    * first `k` vectors by id — the house determinism rule, no random
    * seeding), then `iters` rounds of assign-to-nearest /
    * recompute-means.
    *
    * Scale shape per iteration: the ASSIGNMENT is zero-shuffle — k
    * squared-L2 distances per row, each a codegen'd VecDot against a
    * constant centroid literal (‖v−c‖² = v·v − 2·v·c + c·c with c·c
    * folded driver-side, v·v computed once per row); the UPDATE is
    * [[groupCentroids]]' (cell, dim) aggregation, whose map-side
    * partials collapse the shuffle to O(partitions · k · d) rows; and
    * the k·d means (bounded like the IVF codebook collects) return to
    * the driver to become the next round's literals. An emptied cell
    * keeps its previous centroid. k-means is inherently one corpus
    * pass per iteration — at 100 TB you bound `iters`, not the scan.
    *
    * Determinism: per-dimension sums accumulate in DECIMAL(38,18)
    * (groupCentroids), distances are IEEE sequential-fold dots, ties
    * break to the lower cell id — the whole trajectory reproduces
    * bit-for-bit in any engine with the same rules, which is what the
    * unrolled-CTE DuckDB oracle does.
    *
    * Output: (vec_id, cell, dist) — the final assignment and its
    * squared L2 distance under the final centroids. */
  def kMeans(embeddings: DataFrame, k: Int, iters: Int): DataFrame =
    kmAssign(embeddings, kMeansCentroids(embeddings, k, iters))
      .select(col("vec_id"), col("cell"), col("dist"))

  /** The squared-L2 argmin assignment under constant centroid
    * literals — zero-shuffle, whole-stage-codegen'd; the shared
    * building block of [[kMeans]] and [[ivfTopKTrained]]. Output:
    * (vec_id, embedding, dist, cell). */
  private def kmAssign(embeddings: DataFrame,
      cents: Array[Seq[Double]]): DataFrame = {
    val withVv = embeddings.withColumn("_vv",
      vec_dot(col("embedding"), col("embedding")))
    val best = least(cents.zipWithIndex.map { case (c, cid) =>
      val cc = c.foldLeft(0.0)((a, x) => a + x * x)
      struct((col("_vv") - lit(2.0) * vec_dot(col("embedding"),
        typedLit(c)) + lit(cc)).as("d"), lit(cid).as("cid"))
    }: _*)
    withVv.select(col("vec_id"), col("embedding"),
      best.getField("d").as("dist"), best.getField("cid").as("cell"))
  }

  /** The Lloyd iteration itself: first-`k`-by-id init, `iters` rounds
    * of assign / decimal-accumulated mean recompute. Returns the final
    * centroids (cell id = array index); see [[kMeans]] for the full
    * contract. */
  def kMeansCentroids(embeddings: DataFrame, k: Int,
      iters: Int): Array[Seq[Double]] = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    var cents: Array[Seq[Double]] = embeddings.orderBy(col("vec_id"))
      .limit(k).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
    for (_ <- 0 until iters) {
      val means = groupCentroids(
          kmAssign(embeddings, cents).select(col("cell"), col("embedding")),
          "cell")
        .select(col("g"), col("pos"), col("mean")).collect()
      val byCell = means.groupBy(_.getInt(0)).map { case (g, rows) =>
        g -> (rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq: Seq[Double])
      }
      cents = Array.tabulate(k)(cid => byCell.getOrElse(cid, cents(cid)))
    }
    cents
  }

  /** IVF with a TRAINED coarse quantizer: [[kMeansCentroids]] replaces
    * the deterministic first-`nCells` codebook of [[ivfTopK]] — the
    * production IVF design (Faiss trains its inverted lists exactly
    * this way), kept deterministic here by the seedless k-means init.
    * Corpus assignment and query probing both use the TRAINING metric
    * (squared L2, argmin, lower-cell tie) so the inverted lists are the
    * cells k-means actually shaped; the final scoring is exact cosine
    * like every other ANN arm. Same scale shape as ivfTopK: zero-
    * shuffle assignment against constant literals, broadcast probes,
    * one shuffle for the per-query top-k. */
  def ivfTopKTrained(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nCells: Int = 16, nProbe: Int = 4, iters: Int = 2): DataFrame = {
    val cents = kMeansCentroids(corpus, nCells, iters)
    val assigned = kmAssign(corpus, cents)
      .select(col("vec_id"), col("embedding"),
        vec_norm(col("embedding")).as("nrm"), col("cell"))

    // query side: nProbe nearest trained centroids by squared L2 —
    // sort the per-row (d, cell_id) struct array and slice the head
    val qVv = vec_dot(col("embedding"), col("embedding"))
    val probeStructs = array_sort(array(cents.zipWithIndex.map {
      case (c, cid) =>
        val cc = c.foldLeft(0.0)((a, x) => a + x * x)
        struct((qVv - lit(2.0) * vec_dot(col("embedding"), typedLit(c)) +
          lit(cc)).as("d"), lit(cid).as("cell_id"))
    }: _*))
    val probes = withNorm(queries)
      .withColumn("probe", explode(slice(probeStructs, 1, nProbe)))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("probe.cell_id").as("cell_id"))

    val joined = assigned.as("c")
      .join(broadcast(probes).as("q"),
        col("q.cell_id") === col("c.cell") &&
        col("q.q_id") =!= col("c.vec_id"))
      .select(col("q.q_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        (vec_dot(col("q.q_emb"), col("c.embedding")) /
          (col("q.q_nrm") * col("c.nrm"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023, public):
    * embeddings are blocked by a coarse quantizer and near-duplicate
    * pruning runs only WITHIN each cell — the insight that makes
    * semantic dedup tractable at corpus scale: pairwise cosine is
    * O(Σ m_cell²) instead of O(n²), and cell count grows with the
    * corpus so cells stay bounded.
    *
    * Deterministic variant: the same driver-side codebook as
    * [[ivfTopK]] (first `nCells` vectors by id — no trained k-means, so
    * results reproduce bit-for-bit and the oracle can replicate them),
    * per-row argmax assignment over constant centroid literals (zero
    * shuffle, zero expansion on the corpus scan), then one shuffle by
    * `cell_id` for the within-cell self-join. A vector is PRUNED when a
    * lower-id vector in its cell has cosine ≥ `threshold` — the
    * keep-first-representative rule, made total by the id order.
    *
    * Output: (vec_id, cell_id, pruned) for every input vector — the
    * keep-list is `pruned = false`, and emitting the full decision
    * column keeps the operator's row count stable for auditing. */
  def semanticDedup(embeddings: DataFrame, threshold: Double,
      nCells: Int = 16): DataFrame = {
    require(nCells >= 2, s"nCells must be >= 2, got $nCells")
    val cents: Array[(Long, Seq[Float], Double)] =
      withNorm(embeddings).orderBy(col("vec_id")).limit(nCells)
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))
    def cellCos(cEmb: Seq[Float], cNrm: Double): Column =
      vec_dot(col("embedding"), typedLit(cEmb)) / (col("nrm") * lit(cNrm))
    val bestStruct = greatest(cents.map { case (cid, ce, cn) =>
      struct(cellCos(ce, cn).as("c"), lit(-cid).as("negid"))
    }: _*)
    val assigned = withNorm(embeddings)
      .withColumn("cell_id", -bestStruct.getField("negid"))
    val prunedIds = assigned.as("q").join(assigned.as("c"),
        col("q.cell_id") === col("c.cell_id") &&
          col("c.vec_id") < col("q.vec_id"))
      .where(pairCos >= threshold)
      .select(col("q.vec_id").as("vec_id")).distinct()
    assigned.select(col("vec_id"), col("cell_id"))
      .join(prunedIds.withColumn("pruned", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell_id"),
        coalesce(col("pruned"), lit(false)).as("pruned"))
  }

  /** Banded sign-LSH near-duplicate pairs — the 100 TB scale path for
    * [[cosineNearDupPairs]]. The `bands × rowsPerBand` hyperplane bits
    * split into bands; two vectors become a CANDIDATE pair iff they
    * agree on every bit of at least one band (minhash banding applied
    * to sign-LSH), and only candidates pay the exact cosine verify —
    * every reported score is exact. Recall < 1 by construction: a pair
    * disagreeing somewhere in every band is missed; raise recall with
    * more bands, precision/cost with more rows per band (bucket count
    * per band is 2^rowsPerBand — grow rowsPerBand with the corpus so
    * buckets stay small).
    *
    * Scale: only (vec_id, band, band_sig) — ~16 bytes × bands per
    * vector, never the embeddings — reaches the candidate self-join's
    * shuffle, and candidate ids are distinct'd BEFORE the embeddings
    * join back for the verify, so each surviving pair moves exactly
    * two vectors. Compare the brute variant: 100 TB of embeddings
    * through an n² theta join vs. a few hundred GB of band keys.
    * Deterministic plane signs (md5-derived, data-independent,
    * driver-computed literals) make results reproducible and
    * replicable in the DuckDB oracle. */
  /** The id-only banded sign-LSH relation (vec_id, band, band_sig)
    * behind [[lshNearDupPairs]] — exposed so the scale harness counts
    * bucket occupancy on the EXACT production banding, not a
    * re-derivation that could drift. */
  private[graft] def signBandRelation(embeddings: DataFrame, bands: Int,
      rowsPerBand: Int, dims: Int): DataFrame = {
    val m = signMatrix(bands * rowsPerBand, dims)
    def bandSig(b: Int): Column =
      (0 until rowsPerBand).map { r =>
        when(vec_dot(col("embedding"),
            typedLit(m(b * rowsPerBand + r).toSeq)) > 0, lit(1 << r))
          .otherwise(lit(0))
      }.reduce(_ + _)
    embeddings
      .select(col("vec_id"), explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), bandSig(b).as("band_sig"))): _*)).as("bs"))
      .select(col("vec_id"), col("bs.band").as("band"),
        col("bs.band_sig").as("band_sig"))
  }

  def lshNearDupPairs(embeddings: DataFrame, threshold: Double,
      bands: Int = 8, rowsPerBand: Int = 6, dims: Int = 64): DataFrame = {
    // eager checkpoint of the id-only banded relation (3 ints × n·bands
    // — tiny): BOTH sides of the candidate self-join read it back, so
    // the bands×rowsPerBand dot products against inline literal planes
    // are evaluated — and their large codegen stage compiled — exactly
    // once instead of once per join side
    val banded = signBandRelation(embeddings, bands, rowsPerBand, dims)
      .localCheckpoint(true)
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_sig") === col("b.band_sig") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    val n = withNorm(embeddings)
    candidates
      .join(n.as("q"), col("id_a") === col("q.vec_id"))
      .join(n.as("c"), col("id_b") === col("c.vec_id"))
      .select(col("id_a"), col("id_b"), pairCos.as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs within a deterministic id
    * subset (`vec_id % idModulus == 0`), cosine ≥ threshold. Brute
    * pairwise on the subset — the LSH variant above is the scale path. */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double,
      idModulus: Int = 1): DataFrame = {
    val sub = withNorm(embeddings.where(col("vec_id") % idModulus === 0))
    sub.as("q").join(sub.as("c"), col("q.vec_id") < col("c.vec_id"))
      .select(col("q.vec_id").as("id_a"), col("c.vec_id").as("id_b"),
        pairCos.as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Scalar-quantization ANN (SQ8 — the uniform scalar quantizer of
    * Faiss's `ScalarQuantizer`, public design): each dimension maps
    * linearly onto an integer code in [0, levels−1] over the
    * corpus-wide [min_d, max_d] range, so a 64-d float vector becomes
    * 64 bytes — a 4× compression with far finer per-dimension
    * resolution than PQ at the same budget. Search is asymmetric: the
    * query stays exact, each corpus vector contributes only its codes,
    * and the estimated cosine is computed against the decoded
    * reconstruction `min_d + code·scale_d`.
    *
    * Scale shape: the per-dimension [min, max] stats are a d-row
    * partial-aggregated relation folded into ONE row of
    * position-ordered arrays — it stays a broadcast relation end to
    * end (never a driver collect), and the encode/decode pass is a
    * per-row `transform` over the corpus scan with zero expansion and
    * zero shuffle. The only shuffle is the final per-query top-k
    * (partial top-k per partition under the rank window).
    *
    * Determinism / oracle parity: stats are exact min/max of
    * float-widened doubles; the code is `round((x−min)/scale)` clamped
    * to [0, levels−1] (HALF_UP — equal to round-half-away-from-zero on
    * this non-negative domain); decode is `min + code·scale`; dot and
    * norm fold sequentially in index order. Every step replays
    * bit-for-bit in any engine with the same expression order.
    * Output: (query_id, rank, neighbor_id, cos). */
  def sqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      levels: Int = 256): DataFrame = {
    require(levels >= 2 && levels <= 256,
      s"levels must be in [2, 256] (one byte per dim), got $levels")
    val span = lit((levels - 1).toDouble)
    val lim = lit(levels - 1)
    val stats = corpus
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(
        min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mn"),
        col("mx")))).as("st"))
      .select(
        transform(col("st"), s => s.getField("mn")).as("mins"),
        transform(col("st"),
          s => (s.getField("mx") - s.getField("mn")) / span).as("scales"))
    // encode then decode FROM THE CODES (not from the raw floats): the
    // decoded column is exactly what a reader of the byte index would
    // reconstruct, so the cosine below measures true quantization error
    val enc = corpus.crossJoin(broadcast(stats))
      .withColumn("codes", transform(col("embedding"), (x, i) => {
        val mn = element_at(col("mins"), i + 1)
        val sc = element_at(col("scales"), i + 1)
        when(sc > lit(0.0),
          least(lim, greatest(lit(0),
            // round-half-up as floor(x + 0.5): one IEEE add + exact
            // floor — the engine's parity-safe rounding (house rule:
            // no ROUND, its decimal-repr path is engine-specific)
            floor((x.cast("double") - mn) / sc + lit(0.5)).cast("int"))))
          .otherwise(lit(0))
      }))
      .withColumn("dec", transform(col("codes"), (c, i) =>
        element_at(col("mins"), i + 1) +
          c.cast("double") * element_at(col("scales"), i + 1)))
      .select(col("vec_id"), col("dec"), vec_norm(col("dec")).as("nrm"))
    val joined = enc.as("c")
      .join(broadcast(withNorm(queries).as("q")),
        col("q.vec_id") =!= col("c.vec_id"))
      .select(col("q.vec_id").as("query_id"),
        col("c.vec_id").as("neighbor_id"),
        (vec_dot(col("c.dec"), col("q.embedding")) /
          (col("c.nrm") * col("q.nrm"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  // ---- PCA (power iteration) -------------------------------------------

  /** Map-side Gram accumulation: the buffer is the d(d+1)/2 exact
    * upper-triangle sums, so the ONLY shuffle of the pass moves one
    * partial buffer per map task — no per-row d² explode ever
    * materializes as rows (the sufficient-statistics shape
    * `olsNormalEquations` uses, and MLlib computeGramianMatrix's
    * treeAggregate, public).
    *
    * Determinism contract (identical to the previous relational form,
    * so Gram entries are bit-for-bit unchanged): inputs arrive already
    * quantized to DECIMAL(17,15) via shortest-string float parse;
    * each product is EXACT, re-quantized to scale 18 HALF_UP (the
    * (24,18) cast both engines round identically), and summed exactly
    * at scale 18. No IEEE accumulation, so results are independent of
    * partitioning and merge order. */
  private final class GramAggregator(dims: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        Seq[java.math.BigDecimal], Array[java.math.BigDecimal],
        Seq[java.math.BigDecimal]] {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    private val n = dims * (dims + 1) / 2
    def zero: Array[java.math.BigDecimal] =
      Array.fill(n)(java.math.BigDecimal.ZERO)
    def reduce(b: Array[java.math.BigDecimal],
        row: Seq[java.math.BigDecimal]): Array[java.math.BigDecimal] = {
      val v = row.toArray
      var k = 0; var i = 0
      while (i < dims) {
        val vi = v(i); var j = i
        while (j < dims) {
          b(k) = b(k).add(vi.multiply(v(j))
            .setScale(18, java.math.RoundingMode.HALF_UP))
          k += 1; j += 1
        }
        i += 1
      }
      b
    }
    def merge(a: Array[java.math.BigDecimal],
        b: Array[java.math.BigDecimal]): Array[java.math.BigDecimal] = {
      var k = 0
      while (k < n) { a(k) = a(k).add(b(k)); k += 1 }
      a
    }
    def finish(b: Array[java.math.BigDecimal])
        : Seq[java.math.BigDecimal] = b.toSeq
    def bufferEncoder: Encoder[Array[java.math.BigDecimal]] =
      ExpressionEncoder[Array[java.math.BigDecimal]]()
    def outputEncoder: Encoder[Seq[java.math.BigDecimal]] =
      ExpressionEncoder[Seq[java.math.BigDecimal]]()
  }

  /** The single-aggregation gram pass as a one-row Dataset — exposed so
    * plan audits can assert the pass carries NO Generate (no explode)
    * and at most the one final-merge shuffle. */
  def gramPass(embeddings: DataFrame, dims: Int)
      : Dataset[Seq[java.math.BigDecimal]] = {
    import org.apache.spark.sql.types.DecimalType
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val dv = transform(col("embedding"),
      x => x.cast("string").cast(DecimalType(17, 15)))
    implicit val enc: Encoder[Seq[java.math.BigDecimal]] =
      ExpressionEncoder[Seq[java.math.BigDecimal]]()
    embeddings.select(dv.as("dv")).as[Seq[java.math.BigDecimal]]
      .select(new GramAggregator(dims).toColumn)
  }

  /** Full dims×dims Gram matrix g(i)(j) = Σ_vectors vᵢ·vⱼ as DOUBLE,
    * from the map-side aggregated triangle (one buffer-sized row
    * collected — bounded by the DIMENSION, not the corpus). The final
    * decimal→double conversion is java BigDecimal.doubleValue, the
    * same conversion Spark's Decimal→Double cast performs, so entries
    * match the previous relational form exactly. */
  def gramMatrix(embeddings: DataFrame, dims: Int): Array[Array[Double]] = {
    val tri = gramPass(embeddings, dims).head()
    val g = Array.ofDim[Double](dims, dims)
    var k = 0; var i = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        val x = tri(k).doubleValue
        g(i)(j) = x; g(j)(i) = x
        k += 1; j += 1
      }
      i += 1
    }
    g
  }

  /** First principal direction of the (uncentered) Gram matrix by
    * `iters` rounds of power iteration (Mises–Pollaczek-Geiringer,
    * public), plus the max-abs eigenvalue estimate.
    *
    * The Gram collect is d² rows — bounded by the DIMENSION, not the
    * corpus (the codebook-collect pattern); the iteration itself is a
    * d×d driver loop. Determinism mirrors the engine-side decimal
    * contract so an oracle can replay it: every product G·v quantizes
    * via its shortest decimal string to scale 18 (HALF_UP) and sums
    * exactly; the normalization divides by the max-abs entry in IEEE
    * double (max is order-free, unlike a 2-norm's Σ). Deterministic
    * all-ones init — no seeding, same rule as k-means init. */
  def pcaPowerIteration(embeddings: DataFrame, dims: Int,
      iters: Int): (Array[Double], Double) = {
    val g = gramMatrix(embeddings, dims)
    var v = Array.fill(dims)(1.0)
    var lambda = 0.0
    for (_ <- 0 until iters) {
      val w = Array.tabulate(dims) { i =>
        var acc = java.math.BigDecimal.ZERO
        var j = 0
        while (j < dims) {
          acc = acc.add(java.math.BigDecimal.valueOf(g(i)(j) * v(j))
            .setScale(18, java.math.RoundingMode.HALF_UP))
          j += 1
        }
        acc.doubleValue
      }
      lambda = w.map(math.abs).max
      v = w.map(_ / lambda)
    }
    (v, lambda)
  }

  /** Per-vector projection onto the first principal direction:
    * (vec_id, pc1, lambda1). The direction ships as a constant literal
    * (zero-shuffle, codegen'd — the kmAssign pattern); the per-row dot
    * accumulates in decimal scale 18 so the oracle's order-free SUM
    * reproduces it bit-for-bit. */
  def pcaProjection(embeddings: DataFrame, dims: Int = 64,
      iters: Int = 12): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val (v, lambda) = pcaPowerIteration(embeddings, dims, iters)
    val vLit = typedLit(v.toSeq)
    // accumulator at (32,18): each add is (33,18) — EXACT, no Spark
    // precision-clamp — and the re-cast back to (32,18) never rounds
    // (|pc1| bounded far below 10^14), so the chained per-row adds
    // equal the oracle's order-free decimal SUM bit-for-bit
    val dS = DecimalType(32, 18)
    val proj = aggregate(sequence(lit(1), lit(dims)),
      lit(0).cast(dS),
      (acc, i) => (acc + (element_at(col("embedding"), i) *
          element_at(vLit, i)).cast("string").cast(dS)).cast(dS))
    embeddings.select(col("vec_id"), proj.cast("double").as("pc1"),
      lit(lambda).as("lambda1"))
  }

  /** The (planes × dims) JL sign matrix — the same deterministic md5
    * plane family as [[signMatrix]], offset by 1000 so the projection
    * directions are independent of the LSH hyperplanes. */
  def jlSignMatrix(planes: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(planes, dims)((p, d) => planeSign(1000 + p, d))

  /** Johnson–Lindenstrauss signed random projection to `outDims`
    * dimensions: pⱼ = (Σ_d sign(j,d)·v_d) / √outDims, signs ±1 from
    * [[jlSignMatrix]]. Pairwise distances are preserved to (1±ε) with
    * ε ≈ √(ln n / outDims) (Achlioptas 2003: ±1 entries suffice) — the
    * cheap front-end that lets every pairwise downstream (dedup, ANN
    * shortlists, clustering) run in `outDims` dims instead of `dims`.
    *
    * Scale: `outDims` codegen'd VecDot folds against constant literal
    * sign rows — zero shuffle, zero driver state, one narrow
    * projection over the corpus; the sequential per-row fold is
    * order-deterministic so the oracle replays it exactly. */
  def randomProjection(embeddings: DataFrame, outDims: Int = 16,
      dims: Int = 64): DataFrame = {
    val m = jlSignMatrix(outDims, dims)
    val s = lit(math.sqrt(outDims.toDouble))
    embeddings.select((col("vec_id") +: (0 until outDims).map(j =>
      (vec_dot(col("embedding"), typedLit(m(j).toSeq)) / s)
        .as(f"p$j%02d"))): _*)
  }

  /** Simplified (centroid-based) silhouette of the [[kMeans]]
    * clustering, on SQUARED L2 distances: per point, a = squared
    * distance to its own centroid, b = min squared distance to any
    * other centroid, s = (b−a)/max(a,b) (0 when both are 0 — the
    * point IS every nearest centroid). The per-cluster mean s is the
    * standard clustering-quality audit; the squared-distance variant
    * avoids sqrt of the tiny negatives IEEE cancellation can produce
    * in vv − 2v·c + cc, and is order-equivalent for the a<b test.
    *
    * Scale: centroids are the k×d bounded driver collect the whole
    * kMeans family shares; per-point distances to all k centroids are
    * literal-expression arithmetic — zero shuffle — and the one
    * aggregation is the per-cluster mean (decimal-accumulated at
    * scale 6 so the sum is order-independent). */
  def silhouetteScores(embeddings: DataFrame, k: Int,
      iters: Int): DataFrame = {
    val cents = kMeansCentroids(embeddings, k, iters)
    val withVv = embeddings.withColumn("_vv",
      vec_dot(col("embedding"), col("embedding")))
    val dists = cents.zipWithIndex.map { case (c, cid) =>
      val cc = c.foldLeft(0.0)((a, x) => a + x * x)
      struct((col("_vv") - lit(2.0) * vec_dot(col("embedding"),
        typedLit(c)) + lit(cc)).as("d"), lit(cid).as("cid"))
    }
    val best = least(dists: _*)
    val others = transform(
      filter(array(dists: _*), x => x.getField("cid") =!=
        best.getField("cid")),
      x => x.getField("d"))
    val scored = withVv.select(col("vec_id"),
      best.getField("cid").as("cell"),
      best.getField("d").as("a2"),
      array_min(others).as("b2"))
    val sil = when(greatest(col("a2"), col("b2")) > lit(0.0),
        (col("b2") - col("a2")) / greatest(col("a2"), col("b2")))
      .otherwise(lit(0.0))
    scored.select(col("cell"), sil.as("s"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_points"),
        (sum(col("s").cast(org.apache.spark.sql.types.DecimalType(22, 6)))
          .cast("double") / count(lit(1)).cast("double"))
          .as("mean_silhouette"))
  }
}
