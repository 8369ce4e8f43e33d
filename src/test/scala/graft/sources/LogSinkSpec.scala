package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.LogStore

/** The DSv2 write path's contract: batch appends land as one
  * committed version with full stats/bloom metadata, table creation
  * and schema evolution work through the connector, type mutation
  * refuses loudly, streaming writes are exactly-once under checkpoint
  * loss, empty epochs advance the fence without junk segments, and
  * staging directories never leak into the table. */
class LogSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def tmp() =
    Files.createTempDirectory("graft-sink").toString + "/tbl"

  private def writeBatch(df: DataFrame, root: String): Unit =
    df.write.format("graft-log").option("path", root)
      .mode("append").save()

  test("batch write CREATES a table: one version, recorded schema, " +
      "readable through every path") {
    val root = tmp()
    val df = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    writeBatch(df, root)
    val t = new LogStore(spark, root)
    assert(t.latestVersion() == 0L)
    assert(t.read().as[(Long, String)].collect().toSet ==
      (1L to 100L).map(i => (i, s"v$i")).toSet)
    assert(t.recordedSchema().map(_.fieldNames.toSeq) ==
      Some(Seq("id", "v")),
      "the connector write must stamp the metadata action")
    // and the connector's own snapshot path reads it back
    val viaConnector = spark.read.format("graft-log")
      .option("path", root).option("mode", "snapshot").load()
    assert(viaConnector.count() == 100L)
  }

  test("batch write APPENDS to a configured table with the same " +
      "stats/bloom metadata as a programmatic append — the pruning " +
      "economics survive the connector") {
    val root = tmp()
    val t = new LogStore(spark, root, statsCol = Some("id"),
      bloomCol = Some("k"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "k"))
    writeBatch(Seq((100L, "x"), (101L, "y")).toDF("id", "k"), root)
    val r = LogStore.configured(spark, root)
    assert(r.latestVersion() == 1L)
    val (df, scanned, live) = r.readRange("100", "101")
    assert(live == 2 && scanned == 1,
      "the connector-written segment must carry range stats")
    assert(df.count() == 2)
    val (lk, s2, _) = r.pointLookup("x")
    assert(s2 == 1 && lk.count() == 1,
      "the connector-written segment must carry a bloom filter")
    // no staging residue
    val residue = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("_stage-"))
    assert(residue.isEmpty, s"staging must be cleaned: ${residue.toSeq}")
  }

  test("schema evolution through the connector: a new column unions " +
      "into the recorded schema, old rows read null; a type mutation " +
      "refuses loudly") {
    val root = tmp()
    writeBatch(Seq((1L, "a")).toDF("id", "v"), root)
    writeBatch(Seq((2L, "b", 9.5)).toDF("id", "v", "score"), root)
    val t = new LogStore(spark, root)
    val rows = t.read().select(col("id"), col("score"))
      .as[(Long, Option[Double])].collect().toMap
    assert(rows == Map(1L -> None, 2L -> Some(9.5)))
    val e = intercept[Exception] {
      writeBatch(Seq(("oops", "c")).toDF("id", "v"), root)
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("never mutates types") ||
        Option(e.getCause).exists(
          _.getMessage.contains("never mutates types"))))
    assert(t.read().count() == 2, "the refused write must land nothing")
  }

  test("unsupported (nested) column types refuse at write planning") {
    val root = tmp()
    val e = intercept[Exception] {
      Seq((1L, Seq(1, 2))).toDF("id", "xs")
        .write.format("graft-log").option("path", root)
        .mode("append").save()
    }
    assert(e.getMessage.contains("flat columns"))
  }

  test("streaming write is exactly-once: one fenced commit per epoch, " +
      "and a FULL replay (checkpoint deleted) re-lands nothing") {
    val root = tmp()
    val ckpt = Files.createTempDirectory("graft-sink-ck").toString

    def run(checkpoint: String): Unit = {
      val in = MemoryStream[(Long, String)]
      in.addData((1L, "a"), (2L, "b")) // epoch 0
      val q = in.toDF().toDF("id", "v").writeStream
        .format("graft-log").option("path", root)
        .option("checkpointLocation", checkpoint)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        in.addData((3L, "c")) // epoch 1
        q.processAllAvailable()
      } finally q.stop()
    }

    run(ckpt)
    val t = new LogStore(spark, root)
    assert(t.read().as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(t.latestVersion() == 1L, "one commit per epoch")
    assert(t.lastTxn() == 1L, "the epoch id rides the txn fence")

    // the disaster drill: lose the Spark checkpoint entirely and
    // replay the same epochs — the table fence must block every one
    run(Files.createTempDirectory("graft-sink-ck2").toString)
    assert(t.read().count() == 3,
      "replayed epochs must publish nothing")
    assert(t.latestVersion() == 1L, "no new versions on replay")
  }

  test("an empty epoch advances the fence with a txn-only commit — " +
      "no junk segment") {
    val root = tmp()
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "a")) // epoch 0: data
    val q = in.toDF().toDF("id", "v")
      .where(col("id") > 100L) // epoch filter: everything dropped
      .writeStream.format("graft-log").option("path", root)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sink-ck3").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      in.addData((2L, "b")) // epoch 1: also filtered to empty
      q.processAllAvailable()
    } finally q.stop()
    val t = new LogStore(spark, root)
    // both epochs were empty: with no table yet, epoch 0 is a pure
    // no-op (no log to fence); once SOME epoch lands data the fence
    // advances — exercise that half with a data-bearing epoch too
    assert(t.latestVersion() == -1L,
      "all-empty epochs on a nonexistent table must create nothing")

    val in2 = MemoryStream[(Long, String)]
    in2.addData((1L, "x"))      // epoch 0: data → creates the table
    val q2 = in2.toDF().toDF("id", "v")
      .where(col("id") < 100L)
      .writeStream.format("graft-log").option("path", root)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sink-ck4").toString)
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      in2.addData((500L, "y"))  // epoch 1: filtered to empty → fence
      q2.processAllAvailable()
    } finally q2.stop()
    assert(t.read().count() == 1)
    assert(t.lastTxn() == 1L,
      "the empty epoch must advance the fence")
    assert(t.liveSegmentInfos().size == 1,
      "the empty epoch must not add a segment")
  }

  test("auto-maintenance: a streaming ingest with maintainMinBytes " +
      "keeps its live segment count bounded, content intact, and the " +
      "maintenance commits stay out of the change feed") {
    val root = tmp()
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("id", "v").writeStream
      .format("graft-log").option("path", root)
      .option("maintainMinBytes", (1L << 20).toString) // all tiny
      .option("maintainSmallLimit", "3")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sink-maint").toString)
      .outputMode("append").start()
    try {
      (0 until 6).foreach { e =>
        in.addData((e.toLong, s"v$e"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val t = new LogStore(spark, root)
    assert(t.read().count() == 6, "every epoch's rows must survive")
    val live = t.liveSegmentInfos().size
    assert(live <= 3,
      s"the bin-pack policy must bound the segment count, got $live")
    // maintenance rewrites are dataChange=false: the feed is exactly
    // the six inserts
    val feed = t.readChanges(0).groupBy(col("_change_type"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(feed == Map("insert" -> 6L))
  }

  test("per-epoch staging isolation: epochs write into THEIR OWN " +
      "_stage-*-e<epoch> directory and each commit removes it — no " +
      "staging residue outlives the query") {
    val root = tmp()
    val in = MemoryStream[(Long, String)]
    in.addData((1L, "a"), (2L, "b")) // epoch 0
    val q = in.toDF().toDF("id", "v").writeStream
      .format("graft-log").option("path", root)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sink-ck5").toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      in.addData((3L, "c")) // epoch 1
      q.processAllAvailable()
    } finally q.stop()
    val t = new LogStore(spark, root)
    assert(t.read().count() == 3 && t.latestVersion() == 1L)
    // the broken shape this pins against: all epochs writing into one
    // shared bare-prefix dir that no commit's cleanup ever targeted,
    // accumulating files for the query's lifetime (and matching
    // vacuum's _stage-* orphan pattern while STILL ACTIVE)
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val residue = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("_stage-"))
    assert(residue.isEmpty,
      s"staging dirs must die with their epoch's commit, found: " +
        residue.mkString(", "))
  }
  test("OVERWRITE is one atomic replace commit: new content in, old " +
      "out, honest diff feed, prior snapshot time-travels; a zero-row " +
      "overwrite is an atomic truncate; streaming overwrite refuses") {
    val root = tmp()
    writeBatch((1L to 50L).map(i => (i, "old")).toDF("id", "v"), root)
    writeBatch((51L to 80L).map(i => (i, "old")).toDF("id", "v"), root)
    val t = new LogStore(spark, root)
    val vBefore = t.latestVersion()
    (100L to 120L).map(i => (i, "new")).toDF("id", "v")
      .write.format("graft-log").option("path", root)
      .mode("overwrite").save()
    assert(t.latestVersion() == vBefore + 1,
      "an overwrite is ONE commit, not truncate + append")
    assert(t.read().as[(Long, String)].collect().toSet ==
      (100L to 120L).map(i => (i, "new")).toSet)
    // prior snapshots stay readable at their versions
    assert(t.read(vBefore).count() == 80L)
    // the feed is the honest diff: 80 deletes + 21 inserts
    val feed = t.readChanges(vBefore + 1)
      .groupBy(col("_change_type")).count()
      .as[(String, Long)].collect().toMap
    assert(feed == Map("delete" -> 80L, "insert" -> 21L), s"got $feed")
    // SQL INSERT OVERWRITE rides the same path
    val dir2 = Files.createTempDirectory("graft-sink").toString
    spark.conf.set("spark.sql.catalog.gow",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.gow.root", dir2)
    spark.sql("CREATE TABLE gow.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gow.t SELECT id, 'a' FROM range(0, 10)")
    spark.sql(
      "INSERT OVERWRITE gow.t SELECT id, 'b' FROM range(100, 105)")
    assert(spark.sql("SELECT count(*) FROM gow.t").head().getLong(0)
      == 5L)
    assert(spark.sql(
      "SELECT count(*) FROM gow.t WHERE v = 'a'").head().getLong(0)
      == 0L)
    // zero-row overwrite = atomic truncate, content gone, history kept
    spark.sql("INSERT OVERWRITE gow.t SELECT id, 'c' FROM range(0) ")
    assert(spark.sql("SELECT count(*) FROM gow.t").head().getLong(0)
      == 0L)
    // streaming + overwrite refuses loudly
    val src = MemoryStream[Long]
    val e = intercept[Exception] {
      src.toDF().toDF("id")
        .writeStream.format("graft-log")
        .option("path", tmp())
        .option("checkpointLocation",
          Files.createTempDirectory("graft-sink-ck").toString)
        .outputMode("complete")
        .start()
    }
    def msgs(x: Throwable): String =
      if (x == null) "" else x.getMessage + " " + msgs(x.getCause)
    assert(msgs(e).contains("append-mode") ||
      msgs(e).toLowerCase.contains("complete"))
  }
}