package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The log-structured table's transactional contract: snapshot
  * isolation, time travel, logical delete, compaction invariance,
  * optimistic-concurrency conflict, and crash-invisibility of
  * unpublished segments. */
class LogStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh() = new LogStore(spark,
    Files.createTempDirectory("graft-log").toString + "/tbl")

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("id")).as[Long].collect().toSet

  test("append versions accumulate; time travel pins old snapshots") {
    val t = fresh()
    val v0 = t.append((1L to 5L).toDF("id"))
    val v1 = t.append((6L to 8L).toDF("id"))
    assert(v0 == 0 && v1 == 1)
    assert(ids(t.read()) == (1L to 8L).toSet)
    assert(ids(t.read(0)) == (1L to 5L).toSet,
      "version 0 must still read exactly its own snapshot")
  }

  test("deleteWhere is a logical rewrite: latest loses the rows, the " +
      "prior version keeps them") {
    val t = fresh()
    t.append((1L to 10L).toDF("id"))
    val v = t.deleteWhere("id % 2 = 0")
    assert(ids(t.read()) == Set(1L, 3L, 5L, 7L, 9L))
    assert(ids(t.read(v - 1)) == (1L to 10L).toSet,
      "pre-delete snapshot must be unaffected")
  }

  test("compaction preserves rows exactly and collapses to one " +
      "segment; the pre-compaction version stays readable") {
    val t = fresh()
    t.append((1L to 4L).toDF("id"))
    t.append((5L to 9L).toDF("id"))
    val before = t.latestVersion()
    assert(t.liveSegments(before).size == 2)
    t.compact()
    assert(t.liveSegments().size == 1)
    assert(ids(t.read()) == (1L to 9L).toSet)
    assert(ids(t.read(before)) == (1L to 9L).toSet)
    assert(t.liveSegments(before).size == 2,
      "time travel must replay the uncompacted file list")
  }

  test("optimistic concurrency: a transaction based on a stale " +
      "snapshot loses its commit slot loudly") {
    val t = fresh()
    t.append((1L to 3L).toDF("id"))
    val myBase = t.latestVersion() // transaction reads at version 0
    // a racing writer lands version 1 first
    val hadoop = new org.apache.hadoop.fs.Path(t.root + "/_log/00000001.json")
    val fs = hadoop.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(hadoop, false)
    out.write("{\"add\":\"seg-other\"}\n".getBytes("UTF-8"))
    out.close()
    // the stale transaction must NOT silently land on top
    intercept[t.ConcurrentCommitException] {
      t.append((4L to 6L).toDF("id"), baseVersion = myBase)
    }
  }

  test("a written-but-unpublished segment is invisible (crash between " +
      "data write and log publish)") {
    val t = fresh()
    t.append((1L to 3L).toDF("id"))
    (100L to 105L).toDF("id").write.parquet(t.root + "/seg-orphan")
    assert(ids(t.read()) == (1L to 3L).toSet,
      "readers must only see segments the log publishes")
  }

  test("data skipping: a range read scans only segments whose min/max " +
      "overlap, without touching the others' parquet") {
    val t = new LogStore(spark,
      Files.createTempDirectory("graft-log").toString + "/tbl",
      statsCol = Some("id"))
    t.append((1L to 100L).toDF("id"))
    t.append((1000L to 1100L).toDF("id"))
    t.append((5000L to 5100L).toDF("id"))
    val (df, scanned, live) = t.readRange("1050", "1060")
    assert(live == 3 && scanned == 1,
      s"only the middle segment overlaps [1050,1060]: $scanned/$live")
    assert(ids(df) == (1050L to 1060L).toSet)
    // numeric compare, not lexicographic: "999" > "1000" as strings,
    // but segment [1000,1100] must still be the only hit for [999,1001]
    val (df2, scanned2, _) = t.readRange("999", "1001")
    assert(scanned2 == 1 && ids(df2) == Set(1000L, 1001L))
    // a miss range scans nothing and returns empty
    val (df3, scanned3, _) = t.readRange("200", "900")
    assert(scanned3 == 0 && df3.count() == 0)
  }

  test("segments without stats are never skipped (stats are strictly " +
      "an optimization)") {
    val dir = Files.createTempDirectory("graft-log").toString + "/tbl"
    // first segment written WITHOUT stats config, second with
    new LogStore(spark, dir).append((1L to 5L).toDF("id"))
    val t = new LogStore(spark, dir, statsCol = Some("id"))
    t.append((100L to 110L).toDF("id"))
    val (df, scanned, live) = t.readRange("105", "106")
    assert(live == 2 && scanned == 2,
      "the stats-less segment must be assumed to overlap")
    assert(ids(df) == Set(105L, 106L))
  }

  test("appendStream: the txn action fences micro-batch replays " +
      "inside the table's own log") {
    val t = fresh()
    assert(t.appendStream((1L to 3L).toDF("id"), batchId = 0L) == 0L)
    assert(t.appendStream((4L to 6L).toDF("id"), batchId = 1L) == 1L)
    // at-least-once replay of batch 0: fenced, no duplicate rows
    assert(t.appendStream((1L to 3L).toDF("id"), batchId = 0L) == -1L)
    assert(ids(t.read()) == (1L to 6L).toSet)
    assert(t.lastTxn() == 1L)
  }

  test("streamingLogIngest: a real file stream lands each micro-batch " +
      "as one committed version, exactly once") {
    import graft.streaming.StreamingOps
    val base = Files.createTempDirectory("graft-logstream").toString
    val t = new LogStore(spark, s"$base/tbl")
    val b0 = (1L to 50L).toDF("id")
    b0.write.parquet(s"$base/rows")
    val q = StreamingOps.streamingLogIngest(spark, s"$base/rows",
      b0.schema, t, s"$base/ckpt")
    try {
      q.processAllAvailable()
      (51L to 80L).toDF("id").write.mode("append").parquet(s"$base/rows")
      q.processAllAvailable()
      assert(ids(t.read()) == (1L to 80L).toSet)
    } finally q.stop()
    // replay the first batch by hand: the log fence rejects it
    assert(t.appendStream(b0, batchId = 0L) == -1L)
    assert(ids(t.read()) == (1L to 80L).toSet)
  }
}
