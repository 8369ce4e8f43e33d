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

  test("maintenance refuses a non-append corpus change loudly") {
    val dir = Files.createTempDirectory("graft-annidx").toString
    val corpusStore = new LogStore(spark, s"$dir/corpus")
    corpusStore.append(corpusDf(64))
    val idx = AnnIndex.buildIvf(spark, corpusStore.read(),
      corpusStore.latestVersion(), s"$dir/idx", nCells = 8,
      postingSegments = 2)
    corpusStore.deleteWhere("vec_id = 3")
    val e = intercept[IllegalStateException] {
      AnnIndex.maintainIvf(spark, corpusStore, idx, nCells = 8)
    }
    assert(e.getMessage.contains("APPEND-ONLY"))
  }
}
