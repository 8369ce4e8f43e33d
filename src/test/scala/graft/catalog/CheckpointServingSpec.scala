package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The checkpoint carries EVERYTHING resolution needs — live segment
  * set with stats, Bloom filters, row counts, deletion-vector state,
  * schema, props, txn fence — proven the hard way: after deleting
  * every version file the checkpoint covers, a fresh store must
  * resolve, prune, count and read IDENTICALLY from the checkpoint
  * alone. At 10⁶ segments this is the difference between skipping
  * decisions in O(tail) and replaying the table's whole life. */
class CheckpointServingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("resolution from the checkpoint ALONE: version files behind " +
      "the checkpoint deleted, a fresh store still prunes on stats + " +
      "bloom, answers COUNT from recorded rows, and reconciles DVs") {
    val root = Files.createTempDirectory("graft-cksrv").toString + "/t"
    val w = new LogStore(spark, root, statsCol = Some("id"),
      bloomCol = Some("k"), checkpointInterval = 5)
    (0 until 10).foreach { i =>
      w.append((i * 100L until i * 100L + 100L)
        .map(x => (x, s"k$x")).toDF("id", "k"))
    }
    w.deleteWhereDV("id IN (5, 205)") // dv state must ride too
    w.checkpoint() // snapshot at latest (v10)
    val latest = w.latestVersion()
    // destroy the covered prefix: if ANY read path still replayed it,
    // everything below would fail loudly
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    (0L until latest).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(
        f"$root/_log/$v%08d.json"), false)
    }
    val r = LogStore.configured(spark, root)
    assert(r.latestVersion() == latest)
    // stats pruning served from the checkpoint
    val (df, scanned, live) = r.readRange("300", "350")
    assert(live == 10 && scanned == 1 && df.count() == 51L)
    // bloom pruning served from the checkpoint
    val (lk, opened, _) = r.pointLookup("k777")
    assert(opened == 1 && lk.count() == 1L)
    // dv state served from the checkpoint: the deleted rows stay gone
    assert(r.read().count() == 998L)
    assert(r.read().where(col("id").isin(5L, 205L)).count() == 0L)
    // the recorded schema + props survived (a configured reader from
    // the path alone) and the txn fence is intact
    assert(r.recordedSchema().map(_.fieldNames.toSeq) ==
      Some(Seq("id", "k")))
    // COUNT(*) answered from recorded per-segment rows minus dv
    val segs = r.liveSegmentInfos()
    assert(segs.flatMap(_.liveRows).sum == 998L)
  }
}
