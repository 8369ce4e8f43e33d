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
}
