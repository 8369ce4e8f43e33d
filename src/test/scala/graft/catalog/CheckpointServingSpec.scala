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

  test("MULTI-PART checkpoint round trip: past checkpointShardRows " +
      "the snapshot shards into part files + Bloom SIDECARS behind a " +
      "manifest; with the covered version files deleted, a fresh " +
      "store resolves, stats-prunes WITHOUT reading a sidecar byte, " +
      "bloom-prunes identically to the single-file form, reconciles " +
      "DVs, a later checkpoint carries the sidecar hexes forward, " +
      "and the trim reclaims a superseded shard set whole") {
    val root = Files.createTempDirectory("graft-ckmp").toString + "/t"
    // shard threshold 4: ten segments force 3 parts — the full
    // multi-part machinery on a spec-sized table
    val w = new LogStore(spark, root, statsCol = Some("id"),
      bloomCol = Some("k"), checkpointInterval = 1000,
      checkpointShardRows = 4)
    (0 until 10).foreach { i =>
      w.append((i * 100L until i * 100L + 100L)
        .map(x => (x, s"k$x")).toDF("id", "k"))
    }
    w.deleteWhereDV("id IN (5, 205)")
    w.checkpoint()
    val latest = w.latestVersion()
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // the sharded layout is real: manifest + parts + bloom sidecars
    val logFiles = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$root/_log"))
      .map(_.getPath.getName).toSet
    assert(logFiles.exists(_.contains(".checkpoint.part-")) &&
      logFiles.exists(_.contains(".checkpoint.bloom-")),
      s"expected part + bloom files, got $logFiles")
    val manifestLen = fs.getFileStatus(new org.apache.hadoop.fs.Path(
      f"$root/_log/$latest%08d.checkpoint")).getLen
    assert(manifestLen < 1024,
      s"the manifest must be small — adds live in the parts: $manifestLen")
    (0L until latest).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(
        f"$root/_log/$v%08d.json"), false)
    }
    val r = new LogStore(spark, root, statsCol = Some("id"),
      bloomCol = Some("k"), checkpointShardRows = 4)
    assert(r.latestVersion() == latest)
    // stats pruning: a stats-only resolution — correct from the
    // parts alone (sidecars unread by construction: segments answer
    // mayContain conservatively without them)
    val (df, scanned, live) = r.readRange("300", "350")
    assert(live == 10 && scanned == 1 && df.count() == 51L)
    // bloom pruning: the sidecars ARE fetched for the point lookup
    // and skip exactly like the inline form
    val (lk, opened, _) = r.pointLookup("k777")
    assert(opened == 1 && lk.count() == 1L)
    // dv state rides the parts (not the sidecars)
    assert(r.read().count() == 998L)
    assert(r.recordedSchema().map(_.fieldNames.toSeq) ==
      Some(Seq("id", "k")))
    assert(r.liveSegmentInfos().flatMap(_.liveRows).sum == 998L)
    val w2 = new LogStore(spark, root, statsCol = Some("id"),
      bloomCol = Some("k"), checkpointInterval = 1000,
      checkpointShardRows = 4)
    w2.append(Seq((5000L, "k5000")).toDF("id", "k"))
    w2.checkpoint() // a LATER sharded checkpoint, seeded from the first
    val r2 = new LogStore(spark, root, statsCol = Some("id"),
      bloomCol = Some("k"), checkpointShardRows = 4)
    val (lk2, opened2, live2) = r2.pointLookup("k777")
    assert(live2 == 11 && opened2 == 1 && lk2.count() == 1L,
      s"hexes must survive checkpoint-over-checkpoint: opened $opened2 " +
        s"of $live2")
    // vacuum's log trim reclaims the superseded sharded checkpoint's
    // MANIFEST, and every part/sidecar no surviving manifest still
    // references; files CARRIED FORWARD by a surviving (incremental)
    // manifest are protected until superseded
    (0 until 3).foreach(i =>
      w2.append(Seq((6000L + i, s"k${6000 + i}")).toDF("id", "k")))
    w2.checkpoint()
    val res = w2.vacuum(retainLast = 2, orphanMinAgeMs = 0L)
    assert(res.trimmedLogFiles > 0)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/_log"))
      .map(_.getPath.getName).toSet
    assert(!after.contains(f"${latest}%08d.checkpoint"),
      s"the superseded manifest must be trimmed: $after")
    val stillReferenced = after
      .filter(n => n.endsWith(".checkpoint"))
      .flatMap { n =>
        val in = fs.open(new org.apache.hadoop.fs.Path(s"$root/_log/$n"))
        val body = try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString finally in.close()
        ("\"ckptPartFiles\"\\s*:\\s*\"([^\"]*)\"".r
          .findFirstMatchIn(body).map(_.group(1)).toSeq ++
          "\"ckptBloomFiles\"\\s*:\\s*\"([^\"]*)\"".r
            .findFirstMatchIn(body).map(_.group(1)).toSeq)
          .flatMap(_.split(',')).filter(_ != "-")
      }
    after.filter(n => n.contains(".checkpoint.part-") ||
        n.contains(".checkpoint.bloom-")).foreach { n =>
      assert(stillReferenced.contains(n),
        s"an unreferenced shard file must be trimmed: $n")
    }
    assert(r2.read().count() == 1002L)
  }

  test("INCREMENTAL checkpoints: a commit rewrites only the buckets " +
      "it touched — the manifest carries every clean bucket's part " +
      "and sidecar BY NAME from the previous checkpoint; resolution " +
      "from the carried layout alone is exact, and vacuum protects " +
      "carried originals until no manifest references them") {
    val root = Files.createTempDirectory("graft-ckinc").toString + "/t"
    val w = new LogStore(spark, root, statsCol = Some("id"),
      bloomCol = Some("k"), checkpointInterval = 1000,
      checkpointShardRows = 4)
    (0 until 32).foreach { i =>
      w.append((i * 100L until i * 100L + 10L)
        .map(x => (x, s"k$x")).toDF("id", "k"))
    }
    w.checkpoint() // FULL: 32 segments over 8 buckets
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val cp1 = w.latestVersion()
    def logFiles() = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$root/_log"))
      .map(_.getPath.getName).toSet
    val full = logFiles().filter(_.startsWith(f"$cp1%08d.checkpoint."))
    assert(full.count(_.contains(".part-")) >= 4,
      s"expected a real multi-bucket layout: $full")
    // ONE touched segment → the next checkpoint rewrites ≤1 bucket
    w.append(Seq((9999L, "k9999")).toDF("id", "k"))
    w.checkpoint()
    val cp2 = w.latestVersion()
    val freshFiles = logFiles().filter(_.startsWith(f"$cp2%08d"))
    assert(freshFiles.count(_.contains(".part-")) <= 1 &&
      freshFiles.count(_.contains(".bloom-")) <= 1,
      s"write cost must be ∝ the delta, not the live set: $freshFiles")
    // the manifest references the PREVIOUS checkpoint's files for
    // every clean bucket
    val in = fs.open(new org.apache.hadoop.fs.Path(
      f"$root/_log/$cp2%08d.checkpoint"))
    val manifest = try scala.io.Source.fromInputStream(in, "UTF-8")
      .mkString finally in.close()
    assert(manifest.contains(f"$cp1%08d.checkpoint.part-"),
      s"clean buckets must be carried by name: $manifest")
    // resolution from the carried layout ALONE (version files gone)
    (0L until cp2).foreach(v => fs.delete(
      new org.apache.hadoop.fs.Path(f"$root/_log/$v%08d.json"), false))
    val r = LogStore.configured(spark, root)
    assert(r.read().count() == 32 * 10 + 1L)
    val (_, scanned, live) = r.readRange("300", "309")
    assert(live == 33 && scanned == 1,
      s"stats pruning through carried parts: $scanned of $live")
    val (lk, opened, _) = r.pointLookup("k9999")
    assert(opened == 1 && lk.count() == 1L,
      "bloom pruning must reach carried sidecars AND the fresh bucket")
    // vacuum: carried cp1 files survive (cp2's manifest references
    // them), cp1's own manifest goes
    val res = r.vacuum(retainLast = 1, orphanMinAgeMs = 0L)
    assert(res.trimmedLogFiles > 0)
    val after = logFiles()
    assert(!after.contains(f"$cp1%08d.checkpoint"),
      s"superseded manifest must go: $after")
    assert(after.exists(n => n.startsWith(f"$cp1%08d.checkpoint.part-")),
      s"carried originals must be vacuum-protected: $after")
    assert(LogStore.configured(spark, root).read().count() == 321L)
  }
}
