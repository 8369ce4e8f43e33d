package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.LogStore

/** The persisted IVF index: transactional index tables, restart
  * survival (a fresh process sees only disk state), files-opened
  * pruning through the clustered postings layout, result parity with
  * the in-memory IVF, and exactly-once incremental maintenance from
  * the corpus change feed. */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dims = 16

  /** Deterministic synthetic corpus: nCells well-separated clusters
    * (axis-aligned bumps) so assignments and probes are stable. */
  private def corpusDf(n: Int, seedOffset: Long = 0L) = {
    val rows = (0 until n).map { i =>
      val id = i.toLong + seedOffset
      val cluster = (id % 8).toInt
      val v = Array.tabulate(dims)(d =>
        (if (d == cluster * 2) 10f else 0f) +
          0.1f * (((id * 31 + d * 7) % 13).toFloat))
      (id, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("build → RESTART → search: results equal the in-memory IVF " +
      "exactly, and the probe opens a strict subset of the posting " +
      "segments (stats-pruned by the clustered layout)") {
    val dir = Files.createTempDirectory("graft-annidx").toString
    val corpusStore = new LogStore(spark, s"$dir/corpus")
    corpusStore.append(corpusDf(256))
    val corpus = corpusStore.read()
    val idx = AnnIndex.buildIvf(spark, corpus,
      corpusStore.latestVersion(), s"$dir/idx", nCells = 16,
      postingSegments = 8)
    // RESTART: searchIvf reconstructs everything from paths alone
    val queries = corpus.where(col("vec_id") < 4)
    val (res, opened, live) = AnnIndex.searchIvf(spark, idx, corpus,
      queries, k = 5, nProbe = 2)
    val got = res.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val want = Similarity.ivfTopK(corpus, queries, k = 5,
        nCells = 16, nProbe = 2)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(got == want,
      s"persisted search must equal the in-memory IVF (got ${got.size}" +
        s" vs ${want.size} rows)")
    assert(live == 8 && opened < live,
      s"the probe must SKIP posting segments by the clustered " +
        s"stats: opened $opened of $live")
  }

  test("incremental maintenance from the corpus feed: new vectors " +
      "searchable after ONE fenced sync; a replayed sync is a no-op") {
    val dir = Files.createTempDirectory("graft-annidx").toString
    val corpusStore = new LogStore(spark, s"$dir/corpus")
    corpusStore.append(corpusDf(128))
    val idx = AnnIndex.buildIvf(spark, corpusStore.read(),
      corpusStore.latestVersion(), s"$dir/idx", nCells = 16,
      postingSegments = 4)
    // the corpus grows: 32 fresh vectors land in a new commit
    corpusStore.append(corpusDf(32, seedOffset = 1000L))
    val covered = AnnIndex.maintainIvf(spark, corpusStore, idx,
      nCells = 16)
    assert(covered == corpusStore.latestVersion())
    // a replay changes nothing (the fence) — same cursor back
    assert(AnnIndex.maintainIvf(spark, corpusStore, idx,
      nCells = 16) == covered)
    val postings = LogStore.configured(spark, idx.postingsRoot)
    assert(postings.read().count() == 160L,
      "128 built + 32 maintained, exactly once")
    // a new vector is findable: query ITS OWN cluster
    val corpus = corpusStore.read()
    val queries = corpus.where(col("vec_id") === 1000L)
    val (res, _, _) = AnnIndex.searchIvf(spark, idx, corpus, queries,
      k = 5, nProbe = 4)
    val neighbors = res.select("neighbor_id").as[Long].collect().toSet
    assert(neighbors.exists(_ >= 1000L),
      s"maintained vectors must be searchable, got $neighbors")
    // parity with the in-memory IVF on the grown corpus
    val want = Similarity.ivfTopK(corpus, queries, k = 5, nCells = 16,
        nProbe = 4)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val got = res.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(got == want)
  }

  test("delete-aware maintenance: corpus deletes land as DV entries " +
      "on the postings (zero posting bytes rewritten), an updated " +
      "vector moves cells, and search equals an index REBUILT from " +
      "the post-change corpus") {
    val dir = Files.createTempDirectory("graft-annidx").toString
    val corpusStore = new LogStore(spark, s"$dir/corpus",
      statsCol = Some("vec_id"))
    corpusStore.append(corpusDf(128))
    val idx = AnnIndex.buildIvf(spark, corpusStore.read(),
      corpusStore.latestVersion(), s"$dir/idx", nCells = 16,
      postingSegments = 4)
    val postings = LogStore.configured(spark, idx.postingsRoot)
    val postSegsBefore = postings.liveSegmentInfos().map(_.name).toSet
    // non-centroid deletes (centroids anchor on ids 0-15) + an UPDATE
    // that moves vec 60 to cluster 5's bump (via the keyed merge, so
    // the feed carries pre/post images)
    corpusStore.deleteWhere("vec_id IN (100, 101, 55)")
    val moved = Array.tabulate(dims)(d =>
      (if (d == 10) 10f else 0f)).toSeq
    corpusStore.merge(Seq((60L, moved)).toDF("vec_id", "embedding"),
      "vec_id")
    val covered = AnnIndex.maintainIvf(spark, corpusStore, idx,
      nCells = 16)
    assert(covered == corpusStore.latestVersion())
    // replay: no-op
    assert(AnnIndex.maintainIvf(spark, corpusStore, idx,
      nCells = 16) == covered)
    // the deletes were merge-on-read: original posting segments are
    // all still live (vectors attached, nothing rewritten)
    assert(postSegsBefore.subsetOf(
      postings.liveSegmentInfos().map(_.name).toSet),
      "deletes must not rewrite posting segments")
    assert(postings.read().count() == 125L,
      "3 deleted postings gone; the moved vector re-posted once")
    // parity: the maintained index answers EXACTLY like one rebuilt
    // from the post-change corpus (same first-16 codebook policy)
    val corpus = corpusStore.read()
    val queries = corpus.where(col("vec_id").isin(1L, 60L, 120L))
    val (res, _, _) = AnnIndex.searchIvf(spark, idx, corpus, queries,
      k = 5, nProbe = 4)
    val want = Similarity.ivfTopK(corpus, queries, k = 5, nCells = 16,
        nProbe = 4)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val got = res.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(got == want)
    assert(!got.exists(r => Set(100L, 101L, 55L).contains(r._3)),
      "deleted vectors must never surface as neighbors")
  }

  test("a LAGGING cursor absorbing a multi-commit range reduces the " +
      "feed to the FINAL action per vec_id: insert-then-update lands " +
      "ONE posting (the final cell), insert-then-delete lands none, " +
      "a twice-updated vector is never ranked twice") {
    val dir = Files.createTempDirectory("graft-annidx").toString
    val corpusStore = new LogStore(spark, s"$dir/corpus",
      statsCol = Some("vec_id"))
    corpusStore.append(corpusDf(128))
    val idx = AnnIndex.buildIvf(spark, corpusStore.read(),
      corpusStore.latestVersion(), s"$dir/idx", nCells = 16,
      postingSegments = 4)
    def bump(c: Int) = Array.tabulate(dims)(d =>
      if (d == c * 2) 10f else 0f).toSeq
    // all of this lands while the index cursor LAGS — the range the
    // next sync absorbs holds several actions for the same keys
    corpusStore.append(
      Seq((2000L, bump(1))).toDF("vec_id", "embedding"))
    corpusStore.merge(
      Seq((2000L, bump(5))).toDF("vec_id", "embedding"), "vec_id")
    corpusStore.append(
      Seq((2001L, bump(2))).toDF("vec_id", "embedding"))
    corpusStore.deleteWhere("vec_id = 2001")
    corpusStore.merge(
      Seq((60L, bump(3))).toDF("vec_id", "embedding"), "vec_id")
    corpusStore.merge(
      Seq((60L, bump(7))).toDF("vec_id", "embedding"), "vec_id")
    val covered = AnnIndex.maintainIvf(spark, corpusStore, idx,
      nCells = 16)
    assert(covered == corpusStore.latestVersion())
    val postings = LogStore.configured(spark, idx.postingsRoot)
    val byKey = postings.read().groupBy("vec_id").count()
      .as[(Long, Long)].collect().toMap
    assert(byKey.getOrElse(2001L, 0L) == 0L,
      "insert-then-delete must leave NO orphan posting")
    assert(byKey.get(2000L).contains(1L),
      s"insert-then-update must land exactly ONE posting, " +
        s"got ${byKey.get(2000L)}")
    assert(byKey.get(60L).contains(1L),
      s"a twice-updated vector must hold exactly ONE posting, " +
        s"got ${byKey.get(60L)}")
    assert(byKey.values.forall(_ == 1L),
      "no vec_id may hold duplicate postings")
    // parity: search equals an index rebuilt from the final corpus,
    // and no neighbor is ranked twice off a stale (cell_id, nrm) row
    val corpus = corpusStore.read()
    val queries = corpus.where(col("vec_id").isin(2000L, 60L, 1L))
    val (res, _, _) = AnnIndex.searchIvf(spark, idx, corpus, queries,
      k = 5, nProbe = 4)
    val got = res.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect()
    val want = Similarity.ivfTopK(corpus, queries, k = 5, nCells = 16,
        nProbe = 4)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(got.toSet == want)
    assert(got.groupBy(r => (r._1, r._3)).forall(_._2.length == 1),
      "no neighbor may be ranked twice for one query")
  }

  test("a DELETED deterministic centroid refuses loudly (the " +
      "codebook anchors on corpus rows); the TRAINED codebook " +
      "survives the same delete — its centroids are index state") {
    val dir = Files.createTempDirectory("graft-annidx").toString
    val corpusStore = new LogStore(spark, s"$dir/corpus")
    corpusStore.append(corpusDf(64))
    val v = corpusStore.latestVersion()
    val idx = AnnIndex.buildIvf(spark, corpusStore.read(), v,
      s"$dir/idx", nCells = 8, postingSegments = 2)
    val trained = AnnIndex.buildIvfTrained(spark, corpusStore.read(),
      v, s"$dir/idxT", nCells = 8, iters = 1, postingSegments = 2)
    corpusStore.deleteWhere("vec_id = 3") // anchors centroid 3
    val e = intercept[IllegalStateException] {
      AnnIndex.maintainIvf(spark, corpusStore, idx, nCells = 8)
    }
    assert(e.getMessage.contains("centroid") &&
      e.getMessage.contains("rebuild"))
    // the trained twin absorbs it
    val covered = AnnIndex.maintainIvf(spark, corpusStore, trained,
      nCells = 8)
    assert(covered == corpusStore.latestVersion())
    val postings = LogStore.configured(spark, trained.postingsRoot)
    assert(postings.read().where(col("vec_id") === 3L).count() == 0L)
    val corpus = corpusStore.read()
    val (res, _, _) = AnnIndex.searchIvf(spark, trained, corpus,
      corpus.where(col("vec_id") === 11L), k = 5, nProbe = 8)
    assert(!res.select("neighbor_id").as[Long].collect().contains(3L))
  }

  test("heavy corpus deletes trip the postings table's DV-compaction " +
      "policy inside maintainIvf: vectors folded into clean " +
      "cell-clustered segments, search still exact") {
    val dir = Files.createTempDirectory("graft-annidx").toString
    val corpusStore = new LogStore(spark, s"$dir/corpus",
      statsCol = Some("vec_id"))
    corpusStore.append(corpusDf(128))
    val idx = AnnIndex.buildIvf(spark, corpusStore.read(),
      corpusStore.latestVersion(), s"$dir/idx", nCells = 16,
      postingSegments = 2)
    // delete ~60% of the corpus (every non-centroid id >= 16 with
    // id % 5 != 0) — far past the 0.5 pressure rule on the 2 posting
    // segments
    corpusStore.deleteWhere("vec_id >= 16 AND vec_id % 5 != 0")
    AnnIndex.maintainIvf(spark, corpusStore, idx, nCells = 16)
    val postings = LogStore.configured(spark, idx.postingsRoot)
    assert(postings.liveSegmentInfos().forall(_.dv.isEmpty),
      "the pressure rule must consume the vectors")
    val nLive = corpusStore.read().count()
    assert(postings.read().count() == nLive)
    // search parity with the in-memory IVF on the surviving corpus
    val corpus = corpusStore.read()
    val queries = corpus.where(col("vec_id") === 20L)
    val (res, opened, live) = AnnIndex.searchIvf(spark, idx, corpus,
      queries, k = 5, nProbe = 4)
    val want = Similarity.ivfTopK(corpus, queries, k = 5, nCells = 16,
        nProbe = 4)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(res.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet == want)
    // the compaction re-clustered on cell_id: skipping still works
    assert(opened <= live)
  }

  test("DRIFT-triggered retrain: a batch from a shifted distribution " +
      "degrades recall under the stale codebook; maintainIvf detects " +
      "the drift against the recorded training baseline, retrains as " +
      "generation-stamped fenced rebuilds, and recall recovers to " +
      "the fresh-build level EXACTLY") {
    val dir = Files.createTempDirectory("graft-anndrift").toString
    val corpusStore = new LogStore(spark, s"$dir/corpus",
      statsCol = Some("vec_id"))
    corpusStore.append(corpusDf(128)) // clusters on EVEN axes
    val v0 = corpusStore.latestVersion()
    // two identical indexes over the same corpus: one will absorb the
    // drifted batch incrementally (trigger disabled), one will retrain
    val idxInc = AnnIndex.buildIvfTrained(spark, corpusStore.read(),
      v0, s"$dir/inc", nCells = 8, iters = 2, postingSegments = 4)
    val idxRt = AnnIndex.buildIvfTrained(spark, corpusStore.read(),
      v0, s"$dir/rt", nCells = 8, iters = 2, postingSegments = 4)
    // the DRIFTED batch: bumps on ODD axes — far from every trained
    // centroid, and big enough to dominate future queries
    val drifted = (0 until 64).map { i =>
      val id = 5000L + i
      val cluster = (i % 8)
      val v = Array.tabulate(dims)(d =>
        (if (d == cluster * 2 + 1) 10f else 0f) +
          0.1f * (((id * 31 + d * 7) % 13).toFloat))
      (id, v.toSeq)
    }.toDF("vec_id", "embedding")
    corpusStore.append(drifted)
    val latest = corpusStore.latestVersion()
    assert(AnnIndex.maintainIvf(spark, corpusStore, idxInc,
      nCells = 8, retrainDriftRatio = 0) == latest)
    assert(AnnIndex.maintainIvf(spark, corpusStore, idxRt,
      nCells = 8) == latest)
    // the trigger fired: generation stamped on BOTH tables, baseline
    // re-recorded
    val centRt = LogStore.configured(spark, idxRt.centroidsRoot)
    val postRt = LogStore.configured(spark, idxRt.postingsRoot)
    assert(centRt.recordedProp("ivfGen").contains("1") &&
      postRt.recordedProp("ivfGen").contains("1"),
      "the retrain must stamp both tables' generations")
    assert(LogStore.configured(spark, idxInc.centroidsRoot)
      .recordedProp("ivfGen").isEmpty,
      "the disabled-trigger twin must not retrain")
    // recall vs brute on drifted queries: the retrained index must
    // strictly beat the stale-codebook twin...
    val corpus = corpusStore.read()
    val queries = corpus.where(col("vec_id") >= 5000L &&
      col("vec_id") < 5008L)
    def recallOf(idx: AnnIndex.IvfIndex): Double = {
      val got = AnnIndex.searchIvf(spark, idx, corpus, queries,
        k = 5, nProbe = 2)._1
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      val want = Similarity.bruteForceTopK(corpus, queries, k = 5)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      got.intersect(want).size.toDouble / want.size
    }
    val rInc = recallOf(idxInc)
    val rRt = recallOf(idxRt)
    assert(rRt > rInc,
      s"retrained recall ($rRt) must beat the stale codebook ($rInc)")
    // ...and EQUAL a fresh build over the same corpus (deterministic
    // k-means init → identical codebook → identical results)
    val idxFresh = AnnIndex.buildIvfTrained(spark, corpusStore.read(),
      latest, s"$dir/fresh", nCells = 8, iters = 2,
      postingSegments = 4)
    val gotRt = AnnIndex.searchIvf(spark, idxRt, corpus, queries,
      k = 5, nProbe = 2)._1
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val gotFresh = AnnIndex.searchIvf(spark, idxFresh, corpus, queries,
      k = 5, nProbe = 2)._1
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(gotRt == gotFresh,
      "the retrained index must answer exactly like a fresh build")
    // a replayed maintain is a no-op (the rebuild is fenced)
    assert(AnnIndex.maintainIvf(spark, corpusStore, idxRt,
      nCells = 8) == latest)
  }

  test("a retrain CRASHED between its two commits refuses loudly at " +
      "search (generation mismatch) and the next maintainIvf HEALS " +
      "by finishing the postings rebuild from the persisted codebook") {
    val dir = Files.createTempDirectory("graft-annheal").toString
    val corpusStore = new LogStore(spark, s"$dir/corpus",
      statsCol = Some("vec_id"))
    corpusStore.append(corpusDf(128))
    val v0 = corpusStore.latestVersion()
    // the crashed index and a twin that will absorb the same history
    // incrementally — the heal's expected answer
    val idx = AnnIndex.buildIvfTrained(spark, corpusStore.read(),
      v0, s"$dir/idx", nCells = 8, iters = 2, postingSegments = 4)
    val idxRef = AnnIndex.buildIvfTrained(spark, corpusStore.read(),
      v0, s"$dir/ref", nCells = 8, iters = 2, postingSegments = 4)
    // the corpus moves (the commits whose drift triggered the
    // retrain-in-progress) — a real crash window always has
    // latest > the postings cursor
    corpusStore.append(corpusDf(16, seedOffset = 2000L))
    val latest = corpusStore.latestVersion()
    // simulate the crash window: the centroids half of the retrain
    // landed (same codebook content here, generation bumped), the
    // postings half did not
    val centStore = LogStore.configured(spark, idx.centroidsRoot)
    val centRows = centStore.read().collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    centStore.rebuildWithFence(centRows.toDF("cell_id", "embedding"),
      batchId = latest, targetSegments = 1,
      setProps = Map("ivfGen" -> "1"))
    val corpus = corpusStore.read()
    val queries = corpus.where(col("vec_id") < 4)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.searchIvf(spark, idx, corpus, queries, k = 5,
        nProbe = 2)
    }
    assert(e.getMessage.contains("generations diverge"),
      s"the half-rebuilt index must refuse: ${e.getMessage}")
    // heal: maintainIvf finishes the postings rebuild (full corpus
    // reassignment under the persisted codebook, fenced at latest)
    assert(AnnIndex.maintainIvf(spark, corpusStore, idx,
      nCells = 8) == latest)
    assert(LogStore.configured(spark, idx.postingsRoot)
      .recordedProp("ivfGen").contains("1"))
    // the twin absorbed the same commits incrementally under the SAME
    // codebook — identical assignments, identical answers
    assert(AnnIndex.maintainIvf(spark, corpusStore, idxRef,
      nCells = 8, retrainDriftRatio = 0) == latest)
    def results(i: AnnIndex.IvfIndex) =
      AnnIndex.searchIvf(spark, i, corpus, queries, k = 5,
        nProbe = 2)._1
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
    assert(results(idx) == results(idxRef),
      "the healed index must answer exactly like the incremental twin")
  }

  test("TRAINED persisted index: restart search equals the in-memory " +
      "ivfTopKTrained exactly, the probe stats-prunes, and the " +
      "training config rides the table properties") {
    val dir = Files.createTempDirectory("graft-annidx").toString
    val corpusStore = new LogStore(spark, s"$dir/corpus")
    corpusStore.append(corpusDf(256))
    val corpus = corpusStore.read()
    val idx = AnnIndex.buildIvfTrained(spark, corpus,
      corpusStore.latestVersion(), s"$dir/idx", nCells = 16,
      iters = 2, postingSegments = 8)
    val queries = corpus.where(col("vec_id") < 4)
    val (res, opened, live) = AnnIndex.searchIvf(spark, idx, corpus,
      queries, k = 5, nProbe = 2)
    val got = res.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val want = Similarity.ivfTopKTrained(corpus, queries, k = 5,
        nCells = 16, nProbe = 2, iters = 2)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(got == want,
      "persisted trained search must equal ivfTopKTrained")
    assert(live == 8 && opened < live,
      s"stats-pruned probe expected: opened $opened of $live")
    // the config is LOG CONTENT — a path-only reader sees the policy
    val cents = LogStore.configured(spark, idx.centroidsRoot)
    assert(cents.recordedProp("ivfPolicy") == Some("trained"))
    assert(cents.recordedProp("ivfIters") == Some("2"))
    assert(cents.recordedProp("ivfCells") == Some("16"))
  }

  test("FILTERED search: the corpus predicate thins candidates " +
      "BEFORE the cosine (every neighbor satisfies it), over-probe " +
      "recovers the k the filter eats, results equal the filtered " +
      "in-memory construction, and the probe still stats-prunes") {
    val dir = Files.createTempDirectory("graft-annflt").toString
    val corpusStore = new LogStore(spark, s"$dir/corpus")
    corpusStore.append(corpusDf(256))
    val corpus = corpusStore.read()
    val idx = AnnIndex.buildIvf(spark, corpus,
      corpusStore.latestVersion(), s"$dir/idx", nCells = 16,
      postingSegments = 8)
    val queries = corpus.where(col("vec_id") < 4)
    // cluster-uniform predicate (ids ≡ c mod 8 per cluster, so a
    // mod-16 split keeps HALF of every cluster — the filter thins
    // cells instead of blacking out whole clusters)
    val keep = col("vec_id") % 16 < 8
    val (res, opened, live) = AnnIndex.searchIvf(spark, idx, corpus,
      queries, k = 5, nProbe = 2, corpusFilter = Some(keep),
      overProbe = 3)
    // every returned neighbor satisfies the predicate
    assert(res.where(col("neighbor_id") % 16 >= 8).count() == 0L)
    // the filter halves each cell: over-probe must still fill k
    // for every query
    val perQ = res.groupBy("query_id").count()
      .as[(Long, Long)].collect().toMap
    assert((0L until 4L).forall(q => perQ.getOrElse(q, 0L) == 5L),
      s"over-probe must recover k after filtering: $perQ")
    // parity with the in-memory construction under the same filter
    // and widened probe: candidates = probed cells ∩ keep
    val got = res.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val want = {
      val full = Similarity.ivfTopK(corpus, queries, k = 256,
        nCells = 16, nProbe = 6)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      full.where(col("neighbor_id") % 16 < 8)
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet
    }
    assert(got == want,
      s"filtered persisted search must equal the filtered in-memory " +
        s"construction (${got.size} vs ${want.size} rows)")
    // stats pruning pin on a NARROW filtered probe (4 queries × 6
    // over-probed cells above legitimately touch every segment)
    val (_, opened1, live1) = AnnIndex.searchIvf(spark, idx, corpus,
      queries.limit(1), k = 5, nProbe = 1, corpusFilter = Some(keep),
      overProbe = 2)
    assert(opened1 < live1,
      s"the filtered probe must still stats-prune: $opened1 of $live1")
    // a too-selective filter WITHOUT over-probe honestly returns < k
    // (the recall knob exists precisely for this)
    val (thin, _, _) = AnnIndex.searchIvf(spark, idx, corpus,
      queries.limit(1), k = 5, nProbe = 1,
      corpusFilter = Some(col("vec_id") % 64 === 1))
    assert(thin.count() < 5L,
      "a thin unwidened probe should come up short — that shortfall " +
        "is what overProbe exists to fix")
  }

  test("persisted IVF-PQ: build → RESTART → search equals the " +
      "in-memory IVFADC exactly; ADC scores come from the index " +
      "alone (corpus opened only for the rerank set — pinned on both " +
      "tables); maintenance carries CODES through the final-action " +
      "reduction and replays are no-ops") {
    val dir = Files.createTempDirectory("graft-annpq").toString
    val corpusStore = new LogStore(spark, s"$dir/corpus",
      statsCol = Some("vec_id"))
    // 8 range-disjoint corpus segments, so the rerank fetch has
    // something real to prune
    val base = corpusDf(256)
    (0 until 8).foreach(i => corpusStore.append(
      base.where(col("vec_id") >= i * 32 && col("vec_id") < (i + 1) * 32)))
    val corpus = corpusStore.read()
    val idx = AnnIndex.buildIvfPq(spark, corpus,
      corpusStore.latestVersion(), s"$dir/idx", nCells = 16, m = 4,
      dims = dims, ksub = 8, postingSegments = 8)
    val queries = corpus.where(col("vec_id") < 4)
    // RESTART: searchIvfPq reconstructs everything from paths alone
    val scan = AnnIndex.searchIvfPq(spark, idx, corpusStore, queries,
      k = 5, nProbe = 4, shortlist = 20)
    val got = scan.results.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val want = Similarity.ivfPqTopK(corpus, queries, k = 5,
        nCells = 16, nProbe = 4, m = 4, dims = dims, ksub = 8,
        shortlist = 20)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(got == want,
      s"persisted IVF-PQ must equal the in-memory IVFADC " +
        s"(${got.size} vs ${want.size} rows)")
    // files-opened pins, BOTH tables, on a narrow probe: postings
    // pruned by the clustered cell stats; corpus opened ∝ the
    // shortlist ids, never the candidate count
    val narrow = AnnIndex.searchIvfPq(spark, idx, corpusStore,
      queries.limit(1), k = 4, nProbe = 2, shortlist = 4)
    assert(narrow.postingsOpened < narrow.postingsLive,
      s"probe must skip posting segments: ${narrow.postingsOpened} " +
        s"of ${narrow.postingsLive}")
    assert(narrow.corpusOpened <= 4 &&
      narrow.corpusOpened < narrow.corpusLive,
      s"corpus opens must track the RERANK SET (≤ 4 ids), not the " +
        s"candidates: ${narrow.corpusOpened} of ${narrow.corpusLive}")
    // maintenance: deletes (non-codebook ids), an update that moves a
    // vector, fresh inserts — all while the cursor lags; codes must
    // ride the final-action reduction
    corpusStore.deleteWhere("vec_id IN (100, 101)")
    def bump(c: Int) = Array.tabulate(dims)(d =>
      if (d == c * 2) 10f else 0f).toSeq
    corpusStore.merge(Seq((60L, bump(5))).toDF("vec_id", "embedding"),
      "vec_id")
    corpusStore.append(corpusDf(16, seedOffset = 2000L))
    val covered = AnnIndex.maintainIvfPq(spark, corpusStore, idx)
    assert(covered == corpusStore.latestVersion())
    assert(AnnIndex.maintainIvfPq(spark, corpusStore, idx) == covered,
      "a replayed sync must be a fenced no-op")
    val postings = LogStore.configured(spark, idx.postingsRoot)
    assert(postings.read().count() == 256L - 2L + 16L,
      "2 deleted postings gone, 16 added, the moved vector once")
    // parity with a FRESH in-memory IVFADC over the final corpus (the
    // first-16/first-8 codebook rows are untouched, so the in-memory
    // construction derives the SAME codebook the index persisted)
    val corpus2 = corpusStore.read()
    val q2 = corpus2.where(col("vec_id").isin(1L, 60L, 2000L))
    val scan2 = AnnIndex.searchIvfPq(spark, idx, corpusStore, q2,
      k = 5, nProbe = 4, shortlist = 20)
    val got2 = scan2.results.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val want2 = Similarity.ivfPqTopK(corpus2, q2, k = 5, nCells = 16,
        nProbe = 4, m = 4, dims = dims, ksub = 8, shortlist = 20)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(got2 == want2,
      "the maintained index must answer like a fresh build over the " +
        "final corpus")
    assert(!got2.exists(r => Set(100L, 101L).contains(r._3)),
      "deleted vectors must never surface as neighbors")
    // the plain-IVF search path refuses an IVF-PQ index loudly
    val e = intercept[IllegalArgumentException] {
      AnnIndex.searchIvf(spark,
        AnnIndex.IvfIndex(idx.centroidsRoot, idx.postingsRoot),
        corpus2, q2)
    }
    assert(e.getMessage.contains("searchIvfPq"))
  }

  test("FILTERED IVF-PQ: carried columns ride the postings so the " +
      "predicate evaluates from the index alone, BEFORE the ADC " +
      "shortlist (a passing candidate is never displaced by a " +
      "filtered-out one); maintenance re-copies the carried values; " +
      "carry-column validation refuses collisions and non-scalars") {
    val dir = Files.createTempDirectory("graft-annpqflt").toString
    val corpusStore = new LogStore(spark, s"$dir/corpus",
      statsCol = Some("vec_id"))
    // tag must NOT correlate with the cluster (= vec_id % 8), or a
    // query's probed cells would hold no passing candidates at all:
    // (vec_id / 8) % 4 cycles WITHIN each cluster
    val base = corpusDf(256)
      .withColumn("tag", (col("vec_id") / 8).cast("long") % 4)
    (0 until 8).foreach(i => corpusStore.append(
      base.where(col("vec_id") >= i * 32 && col("vec_id") < (i + 1) * 32)))
    val corpus = corpusStore.read()
    // validation first: name collisions and non-scalar types refuse
    for (bad <- Seq("cell_id", "code_3", "embedding")) {
      val err = intercept[IllegalArgumentException] {
        AnnIndex.buildIvfPq(spark, corpus, 0L, s"$dir/bad-$bad",
          nCells = 16, m = 4, dims = dims, ksub = 8,
          carryCols = Seq(bad))
      }
      assert(err.getMessage.contains(bad))
    }
    val errArr = intercept[IllegalArgumentException] {
      AnnIndex.buildIvfPq(spark,
        corpus.withColumn("arr", array(col("vec_id"))), 0L,
        s"$dir/bad-arr", nCells = 16, m = 4, dims = dims, ksub = 8,
        carryCols = Seq("arr"))
    }
    assert(errArr.getMessage.contains("scalar"))
    val idx = AnnIndex.buildIvfPq(spark, corpus,
      corpusStore.latestVersion(), s"$dir/idx", nCells = 16, m = 4,
      dims = dims, ksub = 8, postingSegments = 8,
      carryCols = Seq("tag"))
    val postings = LogStore.configured(spark, idx.postingsRoot)
    assert(postings.read().columns.contains("tag"),
      "the carried column must land in the postings schema")
    val queries = corpus.where(col("vec_id") < 4)
    val keep = col("tag") === 0
    // a no-op predicate is bit-identical to no predicate (plumbing)
    val plain = AnnIndex.searchIvfPq(spark, idx, corpusStore, queries,
      k = 5, nProbe = 4, shortlist = 20)
    val noop = AnnIndex.searchIvfPq(spark, idx, corpusStore, queries,
      k = 5, nProbe = 4, shortlist = 20,
      postingsFilter = Some(lit(true)))
    assert(plain.results.select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet ==
      noop.results.select("query_id", "rank", "neighbor_id")
        .as[(Long, Int, Long)].collect().toSet)
    // parity with the in-memory IVFADC under the same filter and the
    // same widened probe: at a shortlist covering every candidate,
    // filter-before-shortlist ≡ filter of the full exact ranking
    // (exact-cosine order is preserved under filtering)
    val scan = AnnIndex.searchIvfPq(spark, idx, corpusStore, queries,
      k = 5, nProbe = 2, shortlist = 1000,
      postingsFilter = Some(keep), overProbe = 2)
    val got = scan.results.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    val full = Similarity.ivfPqTopK(corpus, queries, k = 512,
      nCells = 16, nProbe = 4, m = 4, dims = dims, ksub = 8,
      shortlist = 1000)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rank").asc)
    val want = full
      .where((col("neighbor_id") / 8).cast("long") % 4 === 0)
      .withColumn("r2", row_number().over(w))
      .where(col("r2") <= 5)
      .select(col("query_id"), col("r2").cast("int"),
        col("neighbor_id"))
      .as[(Long, Int, Long)].collect().toSet
    assert(got == want,
      s"filtered persisted IVF-PQ must equal the filtered in-memory " +
        s"IVFADC (${got.size} vs ${want.size} rows)")
    assert(got.nonEmpty && got.forall(r => (r._3 / 8) % 4 == 0),
      "every returned neighbor must satisfy the predicate")
    // filter-BEFORE-shortlist: at a tight shortlist the filtered
    // search fills k from PASSING candidates, where post-filtering
    // the unfiltered shortlist would come up short
    val tight = AnnIndex.searchIvfPq(spark, idx, corpusStore, queries,
      k = 2, nProbe = 2, shortlist = 2, postingsFilter = Some(keep),
      overProbe = 2)
    val tightRows = tight.results.collect()
    assert(tightRows.length == 4 * 2,
      s"the tight filtered shortlist must still fill k for every " +
        s"query, got ${tightRows.length} rows")
    val unfiltered = AnnIndex.searchIvfPq(spark, idx, corpusStore,
      queries, k = 2, nProbe = 4, shortlist = 2)
    val postFiltered = unfiltered.results
      .where((col("neighbor_id") / 8).cast("long") % 4 === 0).count()
    assert(postFiltered < tightRows.length,
      s"post-filtering the unfiltered shortlist must lose rows " +
        s"($postFiltered vs ${tightRows.length}) — the reason the " +
        "predicate applies before the window")
    // overProbe validation
    val eOp = intercept[IllegalArgumentException] {
      AnnIndex.searchIvfPq(spark, idx, corpusStore, queries,
        overProbe = 0)
    }
    assert(eOp.getMessage.contains("overProbe"))
    // maintenance: a delete, a moved vector (tag changes with the
    // update), and fresh inserts — carried values re-copied from the
    // change feed
    corpusStore.deleteWhere("vec_id IN (100, 101)")
    def bump(c: Int) = Array.tabulate(dims)(d =>
      if (d == c * 2) 10f else 0f).toSeq
    corpusStore.merge(
      Seq((64L, bump(5), 9L)).toDF("vec_id", "embedding", "tag"),
      "vec_id")
    corpusStore.append(corpusDf(16, seedOffset = 2000L)
      .withColumn("tag", (col("vec_id") / 8).cast("long") % 4))
    AnnIndex.maintainIvfPq(spark, corpusStore, idx)
    val tags = postings.read().select("vec_id", "tag")
      .as[(Long, Long)].collect().toMap
    assert(!tags.contains(100L) && !tags.contains(101L),
      "deleted postings must be gone")
    assert(tags(64L) == 9L,
      "an update postimage must carry its NEW attribute value")
    assert((2000L until 2016L).forall(i => tags(i) == (i / 8) % 4),
      "fresh inserts must carry their attributes")
    // the moved vector's new tag=9 fails the predicate: it can never
    // surface through the filtered search
    val after = AnnIndex.searchIvfPq(spark, idx, corpusStore,
      corpusStore.read().where(col("vec_id") < 4), k = 5, nProbe = 2,
      shortlist = 1000, postingsFilter = Some(keep), overProbe = 2)
    val afterRows = after.results
      .select("neighbor_id").as[Long].collect().toSet
    assert(!afterRows.contains(64L),
      "a maintenance-updated attribute must take effect in the filter")
    assert(afterRows.forall(id => tags(id) == 0L),
      "post-maintenance filtered search must honor carried values")
  }
}
