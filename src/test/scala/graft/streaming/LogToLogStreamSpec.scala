package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.LogStore

/** The LogStore-as-streaming-source contract: table→table pipelines
  * absorb the source's change feed exactly once with all progress
  * state in the target's own log — equal to a batch recompute across
  * restarts, replays and lost Spark checkpoints, and LOUD on the two
  * things a blind tail must never skip (non-insert changes, vacuumed
  * gaps). */
class LogToLogStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(statsCol: Option[String] = None) = new LogStore(
    spark, Files.createTempDirectory("graft-l2l").toString + "/tbl",
    statsCol = statsCol)

  private val xform: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame =
    df => df.where(col("id") % 2 === 0)
      .withColumn("doubled", col("id") * 2)

  private def rows(t: LogStore): Set[(Long, Long)] =
    t.read().select(col("id"), col("doubled"))
      .as[(Long, Long)].collect().toSet

  private def expect(src: LogStore): Set[(Long, Long)] =
    xform(src.read()).select(col("id"), col("doubled"))
      .as[(Long, Long)].collect().toSet

  test("syncLogToLog: N incremental syncs ≡ one batch transform — " +
      "across replays, restarts (fresh handles) and dataChange=false " +
      "commits; the fence lives in the target's log") {
    val src = fresh()
    val tgt = fresh()
    src.append((1L to 10L).toDF("id"))                 // v0
    src.append((11L to 20L).toDF("id"))                // v1
    assert(StreamingOps.syncLogToLog(src, tgt, xform) == 1L)
    assert(rows(tgt) == expect(src))

    // replayed sync: fenced no-op — no new target version
    val tv = tgt.latestVersion()
    assert(StreamingOps.syncLogToLog(src, tgt, xform) == 1L)
    assert(tgt.latestVersion() == tv, "a replay must not commit")

    // restart: brand-new handles (no consumer-side state survives),
    // plus a compaction in the absorbed range (contributes nothing)
    src.append((21L to 30L).toDF("id"))                // v2
    src.compact()                                      // v3: no data change
    val src2 = new LogStore(spark, src.root)
    val tgt2 = new LogStore(spark, tgt.root)
    assert(StreamingOps.syncLogToLog(src2, tgt2, xform) == 3L)
    assert(rows(tgt2) == expect(src2),
      "incremental across a restart must equal the batch recompute")
    assert(rows(tgt2) ==
      (2L to 30L by 2).map(i => (i, i * 2)).toSet)
  }

  test("logToLogStream: a real StreamingQuery tails commits exactly " +
      "once, and a LOST Spark checkpoint cannot double-absorb (the " +
      "fence is table state, not checkpoint state)") {
    val src = fresh()
    val tgt = fresh()
    val ckpt = Files.createTempDirectory("graft-l2l-ck").toString
    src.append((1L to 10L).toDF("id"))
    def awaitTarget(want: Set[(Long, Long)]): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (System.currentTimeMillis() < deadline &&
          (tgt.latestVersion() < 0 || rows(tgt) != want))
        Thread.sleep(100)
      assert(rows(tgt) == want)
    }
    val q = StreamingOps.logToLogStream(spark, src, tgt,
      s"$ckpt/a", xform, intervalMs = 100L)
    try {
      awaitTarget(expect(src))
      src.append((11L to 20L).toDF("id"))
      awaitTarget(expect(src))
    } finally q.stop()
    // "lose" the checkpoint: restart under a DIFFERENT checkpoint dir
    // — the rate clock restarts from scratch, the fence does not
    val nVersions = tgt.latestVersion()
    val q2 = StreamingOps.logToLogStream(spark, src, tgt,
      s"$ckpt/b", xform, intervalMs = 100L)
    try {
      src.append((21L to 30L).toDF("id"))
      awaitTarget(expect(src))
      assert(tgt.latestVersion() == nVersions + 1,
        "exactly one new target commit for one new source commit — " +
          "no re-absorption of already-fenced versions")
    } finally q2.stop()
  }

  test("mirrorLogToLog: the target tracks a source through appends, " +
      "merges, deletes and RESTORE — content-equal after every sync, " +
      "atomic per batch, replay-fenced, and itself mirrorable") {
    val src = fresh(statsCol = Some("id"))
    val tgt = fresh(statsCol = Some("id"))
    def rowsOf(t: LogStore) = t.read().select(col("id"), col("v"))
      .as[(Long, String)].collect().toSet
    def sync() = StreamingOps.mirrorLogToLog(src, tgt, "id")

    src.append(Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "v"))
    sync()
    assert(rowsOf(tgt) == rowsOf(src))

    // one batch absorbing a merge AND a delete, netted per key
    src.merge(Seq((2L, "B"), (9L, "c")).toDF("id", "v"), "id") // v1
    src.deleteWhere("id = 1")                                  // v2
    sync()
    assert(rowsOf(tgt) == rowsOf(src))
    assert(rowsOf(tgt) == Set(2L -> "B", 3L -> "b", 9L -> "c"))

    // insert-then-delete inside one batch nets to ABSENT; a restore's
    // delete+reinsert churn nets to the surviving rows
    src.append(Seq((50L, "t")).toDF("id", "v"))                // v3
    src.deleteWhere("id = 50")                                 // v4
    src.restore(2)                                             // v5
    sync()
    assert(rowsOf(tgt) == rowsOf(src),
      "mirror must survive churn and rollback in one net batch")

    // replay: fenced no-op — no new target commit
    val tv = tgt.latestVersion()
    sync()
    assert(tgt.latestVersion() == tv)

    // the mirror's own feed is truthful: a SECOND-order mirror of the
    // target converges to the same content
    val tgt2 = fresh(statsCol = Some("id"))
    StreamingOps.mirrorLogToLog(tgt, tgt2, "id")
    assert(rowsOf(tgt2) == rowsOf(tgt))

    // applyChanges refuses non-NET sets loudly
    intercept[IllegalArgumentException] {
      tgt.applyChanges(Seq((2L, "x")).toDF("id", "v"),
        Seq(Tuple1(2L)).toDF("id"), "id", batchId = 999L)
    }
    intercept[IllegalArgumentException] {
      tgt.applyChanges(Seq((7L, "x"), (7L, "y")).toDF("id", "v"),
        Seq.empty[Tuple1[Long]].toDF("id"), "id", batchId = 999L)
    }
  }

  test("a maintenance-only batch advances the cursor with a txn-only " +
      "fence commit: no empty segment lands in the target (sync AND " +
      "mirror paths)") {
    val src = fresh()
    val tgt = fresh()
    src.append((1L to 10L).toDF("id"))
    StreamingOps.syncLogToLog(src, tgt, xform)
    val segsBefore = tgt.liveSegments().size
    val vBefore = tgt.latestVersion()
    src.compact()          // dataChange=false
    src.compact()          // and another
    assert(StreamingOps.syncLogToLog(src, tgt, xform) ==
      src.latestVersion())
    assert(tgt.latestVersion() == vBefore + 1,
      "the cursor must advance in ONE commit")
    assert(tgt.liveSegments().size == segsBefore,
      "a fence commit must not add any segment — empty or otherwise")
    assert(tgt.lastTxn() == src.latestVersion())
    assert(rows(tgt) == expect(src), "content untouched by the fence")
    // the fence commit contributes NOTHING to the target's own feed
    assert(tgt.readChanges(tgt.latestVersion(), tgt.latestVersion())
      .count() == 0)

    // same contract on the keyed mirror path
    val msrc = fresh(statsCol = Some("id"))
    val mtgt = fresh(statsCol = Some("id"))
    msrc.append(Seq((1L, "a")).toDF("id", "v"))
    StreamingOps.mirrorLogToLog(msrc, mtgt, "id")
    val (mv, msegs) = (mtgt.latestVersion(), mtgt.liveSegments().size)
    msrc.compact()
    StreamingOps.mirrorLogToLog(msrc, mtgt, "id")
    assert(mtgt.latestVersion() == mv + 1 &&
      mtgt.liveSegments().size == msegs,
      "mirror fence: one txn-only commit, zero segments")
    assert(mtgt.lastTxn() == msrc.latestVersion())
  }

  test("netChanges refuses duplicate-key sources LOUDLY: two same-key " +
      "rows in one commit would be silently collapsed by the window's " +
      "arbitrary tie-break — the mirror must throw, not guess") {
    val src = fresh(statsCol = Some("id"))
    val tgt = fresh(statsCol = Some("id"))
    src.append(Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("id", "v"))
    val e = intercept[IllegalArgumentException] {
      StreamingOps.mirrorLogToLog(src, tgt, "id")
    }
    assert(e.getMessage.contains("not unique"), e.getMessage)
    // tied DELETE events are harmless (removing twice nets to removed):
    // a feed whose only tie is on deletes must pass
    val src2 = fresh(statsCol = Some("id"))
    val tgt2 = fresh(statsCol = Some("id"))
    src2.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    src2.deleteWhere("id = 1")
    StreamingOps.mirrorLogToLog(src2, tgt2, "id")
    assert(tgt2.read().select(col("id")).as[Long].collect().toSet ==
      Set(2L))
  }

  test("composite-key mirroring: a (id, d) business key tracks the " +
      "source through mergeKeyed / delete / restore churn — " +
      "content-equal after every sync, no concatenation workaround") {
    def freshKeyed() = new LogStore(spark,
      Files.createTempDirectory("graft-l2lk").toString + "/tbl",
      statsCol = Some("id"))
    val src = freshKeyed()
    val tgt = freshKeyed()
    val keys = Seq("id", "d")
    def rowsOf(t: LogStore) = t.read()
      .select(col("id"), col("d"), col("v"))
      .as[(Long, String, String)].collect().toSet
    def sync() = StreamingOps.mirrorLogToLogKeyed(src, tgt, keys)

    // two rows share id, two share d — only the TUPLE is unique
    src.append(Seq((1L, "d1", "a"), (1L, "d2", "b"), (2L, "d1", "c"))
      .toDF("id", "d", "v"))
    sync()
    assert(rowsOf(tgt) == rowsOf(src))

    // composite merge: updates (1,d2) only — (1,d1) must survive
    src.mergeKeyed(Seq((1L, "d2", "B"), (3L, "d9", "n"))
      .toDF("id", "d", "v"), keys)
    src.deleteWhere("id = 2 AND d = 'd1'")
    sync()
    assert(rowsOf(tgt) == rowsOf(src))
    assert(rowsOf(tgt) ==
      Set((1L, "d1", "a"), (1L, "d2", "B"), (3L, "d9", "n")))

    // restore churn nets correctly on the tuple
    src.restore(0)
    sync()
    assert(rowsOf(tgt) == rowsOf(src))
    assert(rowsOf(tgt) ==
      Set((1L, "d1", "a"), (1L, "d2", "b"), (2L, "d1", "c")))

    // replay fence + second-order mirror
    val tv = tgt.latestVersion()
    sync()
    assert(tgt.latestVersion() == tv)
    val tgt2 = freshKeyed()
    StreamingOps.mirrorLogToLogKeyed(tgt, tgt2, keys)
    assert(rowsOf(tgt2) == rowsOf(tgt))

    // composite refusals: same-tuple dup upserts; key in both sides
    intercept[IllegalArgumentException] {
      tgt.applyChangesKeyed(
        Seq((7L, "d1", "x"), (7L, "d1", "y")).toDF("id", "d", "v"),
        Seq.empty[(Long, String)].toDF("id", "d"), keys, batchId = 999L)
    }
    intercept[IllegalArgumentException] {
      tgt.applyChangesKeyed(
        Seq((1L, "d1", "x")).toDF("id", "d", "v"),
        Seq((1L, "d1")).toDF("id", "d"), keys, batchId = 999L)
    }
    // same id in upserts and deletes is FINE when the d differs — the
    // tuple is the key
    tgt.applyChangesKeyed(
      Seq((1L, "d1", "z")).toDF("id", "d", "v"),
      Seq((1L, "d2")).toDF("id", "d"), keys,
      batchId = tgt.lastTxn() + 1)
    assert(rowsOf(tgt) == Set((1L, "d1", "z"), (2L, "d1", "c")))
  }

  test("upsertAggToLog: an update-mode aggregation lands as fenced " +
      "keyed upserts — the state table equals the batch aggregate " +
      "across a RESTART, and a replayed batch id is a no-op") {
    val base = Files.createTempDirectory("graft-ups").toString
    val src = new LogStore(spark, s"$base/src")
    val tgt = new LogStore(spark, s"$base/state")
    src.append((0L until 40L).map(i => (i, s"k${i % 3}")).toDF("id", "k"))
    src.append((40L until 80L).map(i => (i, s"k${i % 3}")).toDF("id", "k"))
    def agg() = spark.readStream.format("graft-log")
      .option("path", src.root)
      .option("maxVersionsPerTrigger", "1").load()
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
    val q1 = StreamingOps.upsertAggToLog(agg(), tgt, Seq("k"),
      s"$base/ckpt")
    try q1.processAllAvailable() finally q1.stop()
    def state(): Map[String, (Long, Long)] = tgt.read()
      .select(col("k"), col("n"), col("s"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def want(): Map[String, (Long, Long)] = src.read()
      .groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(state() == want(), "phase 1 state must equal the batch agg")
    // a REPLAYED batch id changes nothing (the fence in the target log)
    val vBefore = tgt.latestVersion()
    val replay = tgt.applyChangesKeyed(
      tgt.read(), tgt.read().select(col("k")).limit(0), Seq("k"),
      batchId = tgt.lastTxn())
    assert(replay == -1L && tgt.latestVersion() == vBefore,
      "a replayed micro-batch must be a no-op")
    // RESTART: more source commits, a NEW query on the same checkpoint
    src.append((80L until 120L).map(i => (i, s"k${i % 3}")).toDF("id", "k"))
    val q2 = StreamingOps.upsertAggToLog(agg(), tgt, Seq("k"),
      s"$base/ckpt")
    try q2.processAllAvailable() finally q2.stop()
    assert(state() == want(),
      "post-restart state must equal the batch aggregate exactly")
    // the state table is itself a truthful change-feed producer: the
    // last commit carries pre/post images, so it can be mirrored on
    val feed = tgt.readChanges(tgt.latestVersion())
      .groupBy(col("_change_type")).count()
      .as[(String, Long)].collect().toMap
    assert(feed.keySet.subsetOf(Set("update_preimage",
      "update_postimage", "insert")))
  }

  test("the two silent-gap hazards are LOUD: a non-insert change " +
      "refuses (blind append would corrupt), and a source vacuumed " +
      "past the cursor refuses (resync, never skip)") {
    val src = fresh()
    val tgt = fresh()
    src.append((1L to 10L).toDF("id"))
    StreamingOps.syncLogToLog(src, tgt, xform)
    src.deleteWhere("id = 3")
    val e = intercept[IllegalStateException] {
      StreamingOps.syncLogToLog(src, tgt, xform)
    }
    assert(e.getMessage.contains("append-only"), e.getMessage)

    val src2 = fresh()
    val tgt2 = fresh()
    src2.append((1L to 5L).toDF("id"))                 // v0
    StreamingOps.syncLogToLog(src2, tgt2, xform)       // cursor = 0
    src2.append((6L to 9L).toDF("id"))                 // v1
    src2.compact()                                     // v2
    src2.vacuum(retainLast = 1, orphanMinAgeMs = 0L)   // horizon = 2
    val e2 = intercept[IllegalStateException] {
      StreamingOps.syncLogToLog(src2, tgt2, xform)
    }
    assert(e2.getMessage.contains("vacuum"), e2.getMessage)
  }
}
