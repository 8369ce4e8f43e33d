package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.LogStore
import graft.functions.VectorFunctions.{vec_dot, vec_norm}

/** A PERSISTED IVF index — "the index is a table": centroid
  * assignments stored as graft-log TRANSACTIONAL tables, so the
  * billion-vector index inherits everything the table layer already
  * guarantees (atomic commits, time travel, exactly-once incremental
  * maintenance, stats-skipped reads) instead of inventing an index
  * file format:
  *
  *  - `centroids` table: (cell_id, vec_id, nrm) — the deterministic
  *    codebook ([[Similarity.ivfTopK]]'s policy: the first nCells
  *    corpus vectors by vec_id), k rows, vector payloads stay IN the
  *    corpus (fetched by id at search time — the DiskANN-style
  *    external-storage shape; an index never duplicates 100 TB of
  *    floats).
  *  - `postings` table: (cell_id, vec_id, nrm), statsCol = cell_id,
  *    ingested CLUSTERED on cell_id through the DSv2 sink
  *    (`clusterBy` + one segment per range file) — per-segment
  *    cell_id bounds are tight disjoint ranges, so probing nProbe
  *    cells opens ≈ the segments covering those cells and SKIPS the
  *    rest by the logged stats ([[graft.catalog.LogStore.readRanges]]
  *    reports exactly how many opened — the files-opened pin).
  *  - **Search** (ANY process, no shared state — a restart is just
  *    `LogStore.configured(path)`): per-query nProbe cells from the
  *    k-row codebook (driver literals, same argmax expressions as the
  *    in-memory IVF), a multi-range pruned postings read, candidate
  *    ids joined back to the corpus for exact cosine, top-k window.
  *    Results are IDENTICAL to [[Similarity.ivfTopK]] — same
  *    assignment, same probes, same cosine expression.
  *  - **Incremental maintenance from the corpus change feed**:
  *    [[maintainIvf]] absorbs commits past the index's txn cursor
  *    (append-only corpora; the fence makes replays no-ops), assigns
  *    new vectors to their cells, and appends postings — O(new rows)
  *    per sync, never a rebuild. */
object AnnIndex {

  final case class IvfIndex(centroidsRoot: String, postingsRoot: String)

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"),
      vec_norm(col("embedding")).as("nrm"))

  /** The deterministic codebook rows (cell_id, embedding, nrm) — the
    * first nCells corpus vectors by vec_id, collected driver-side
    * (k rows, bounded by construction). */
  private def codebookOf(corpus: DataFrame,
      nCells: Int): Array[(Long, Seq[Float], Double)] =
    withNorm(corpus).orderBy(col("vec_id")).limit(nCells)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getDouble(2)))

  private def assignExpr(
      cents: Array[(Long, Seq[Float], Double)]): Column = {
    def cellCos(cEmb: Seq[Float], cNrm: Double): Column =
      vec_dot(col("embedding"), typedLit(cEmb)) / (col("nrm") * lit(cNrm))
    -greatest(cents.map { case (cid, ce, cn) =>
      struct(cellCos(ce, cn).as("c"), lit(-cid).as("negid"))
    }: _*).getField("negid")
  }

  /** Build the index tables under `dir` ("centroids" / "postings").
    * The postings ingest is range-clustered on cell_id with one
    * segment per task file, so skipping works from the FIRST write —
    * no post-hoc OPTIMIZE. The index cursor (txn fence) records the
    * corpus version it covers, making [[maintainIvf]] exactly-once. */
  def buildIvf(spark: SparkSession, corpus: DataFrame,
      corpusVersion: Long, dir: String, nCells: Int = 16,
      postingSegments: Int = 8): IvfIndex = {
    require(nCells >= 2, s"nCells must be >= 2, got $nCells")
    val idx = IvfIndex(s"$dir/centroids", s"$dir/postings")
    val cents = codebookOf(corpus, nCells)
    val centRows = cents.map { case (cid, _, nrm) => (cid, cid, nrm) }
      .toSeq
    import spark.implicits._
    new LogStore(spark, idx.centroidsRoot)
      .append(centRows.toDF("cell_id", "vec_id", "nrm"))
    val postings = withNorm(corpus)
      .withColumn("cell_id", assignExpr(cents))
      .select(col("cell_id"), col("vec_id"), col("nrm"))
    val store = new LogStore(spark, idx.postingsRoot,
      statsCol = Some("cell_id"))
    store.create(postings.schema)
    postings.write.format("graft-log").option("path", idx.postingsRoot)
      .option("clusterBy", "cell_id")
      .option("clusterPartitions", postingSegments.toString)
      .mode("append").save()
    // the cursor: which corpus version this index covers
    store.commitFence(corpusVersion)
    idx
  }

  /** Absorb corpus commits past the index cursor (append-only
    * corpora): new vectors assigned and appended as postings in ONE
    * fenced commit — a replay (or an already-current index) is a
    * no-op. Returns the corpus version now covered. */
  def maintainIvf(spark: SparkSession, corpusStore: LogStore,
      idx: IvfIndex, nCells: Int = 16): Long = {
    val postings = LogStore.configured(spark, idx.postingsRoot)
    val cursor = math.max(postings.lastTxn(), -1L)
    val latest = corpusStore.latestVersion()
    if (latest <= cursor) return cursor
    val changes = corpusStore.readChanges(cursor + 1, latest)
    val bad = changes.where(col("_change_type") =!= "insert").limit(1)
      .collect()
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "IVF maintenance mirrors an APPEND-ONLY corpus; a " +
          "delete/update in the feed needs a rebuild (or a keyed " +
          "mirror strategy)")
    val cents = loadCodebook(spark, idx, corpusStore.read())
    val fresh = withNorm(changes
      .drop("_change_type", "_commit_version"))
      .withColumn("cell_id", assignExpr(cents))
      .select(col("cell_id"), col("vec_id"), col("nrm"))
    val moved = postings.appendStream(fresh, batchId = latest)
    if (moved < 0)
      throw new IllegalStateException(
        s"index cursor moved concurrently past $latest — two " +
          "maintenance drivers on one index")
    latest
  }

  /** The persisted codebook re-hydrated: centroid ids from the
    * centroids table (k rows), their VECTORS fetched from the corpus
    * by id — the index never duplicates vector payloads. */
  private def loadCodebook(spark: SparkSession, idx: IvfIndex,
      corpus: DataFrame): Array[(Long, Seq[Float], Double)] = {
    val centStore = LogStore.configured(spark, idx.centroidsRoot)
    val centIds = centStore.read().select("cell_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val centVecs = withNorm(corpus)
      .where(col("vec_id").isin(centIds.values.toSeq: _*))
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[Float](1), r.getDouble(2)))
      .toMap
    centIds.toSeq.sortBy(_._1).map { case (cid, vid) =>
      val (emb, nrm) = centVecs(vid)
      (cid, emb, nrm)
    }.toArray
  }

  /** Search through the PERSISTED index — `(results, opened, live)`:
    * `opened` is the number of posting segments the multi-range
    * pruned read actually opened, `live` the total — the
    * files-opened evidence a 100 TB probe hinges on. Results match
    * [[Similarity.ivfTopK]] exactly. */
  def searchIvf(spark: SparkSession, idx: IvfIndex, corpus: DataFrame,
      queries: DataFrame, k: Int = 5, nProbe: Int = 4)
      : (DataFrame, Int, Int) = {
    val cents = loadCodebook(spark, idx, corpus)
    def cellCos(cEmb: Seq[Float], cNrm: Double): Column =
      vec_dot(col("embedding"), typedLit(cEmb)) / (col("nrm") * lit(cNrm))
    val probeStructs = array_sort(array(cents.map { case (cid, ce, cn) =>
      struct((-cellCos(ce, cn)).as("negc"), lit(cid).as("cell_id"))
    }: _*))
    val probes = withNorm(queries)
      .withColumn("probe", explode(slice(probeStructs, 1, nProbe)))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("probe.cell_id").as("cell_id"))
      .localCheckpoint(true) // probed twice: ranges + the join
    val probeCells = probes.select("cell_id").distinct()
      .collect().map(_.getLong(0)).sorted
    // the pruned read: one multi-range skipping scan of the postings
    val postStore = LogStore.configured(spark, idx.postingsRoot)
    val (posted, opened, live) = postStore.readRanges(
      probeCells.map(c => (c.toString, c.toString)).toSeq)
    val candidates = posted
      .join(broadcast(probes), Seq("cell_id"))
      .where(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("q_emb"), col("q_nrm"),
        col("vec_id").as("neighbor_id"), col("nrm").as("c_nrm"))
    // exact cosine: neighbor vectors fetched from the corpus by id
    val joined = candidates
      .join(corpus.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("c_emb")), Seq("neighbor_id"))
      .select(col("q_id").as("query_id"), col("neighbor_id"),
        (vec_dot(col("q_emb"), col("c_emb")) /
          (col("q_nrm") * col("c_nrm"))).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    (joined.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cos")),
      opened, live)
  }
}
