package graft.catalog

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A log-structured table with snapshot isolation, time travel and
  * compaction — the lakehouse transaction pattern of the Delta Lake
  * paper (Armbrust et al., VLDB 2020 — public), reduced to its load-
  * bearing core on plain parquet + a JSON action log:
  *
  *  - the table IS the log: `_log/<version>.json` files, each a list
  *    of `add`/`remove` actions naming immutable parquet data
  *    segments. A snapshot at version V is the replay of actions
  *    0..V — reads never see a half-written commit because data
  *    segments are written BEFORE the version file that publishes
  *    them.
  *  - optimistic concurrency: a commit writes its segments, then
  *    creates `<nextVersion>.json` with create-exclusive semantics —
  *    two writers racing the same version: one wins, the loser gets a
  *    [[ConcurrentCommitException]] and must rebase. (On object
  *    stores without atomic create this slot needs a coordination
  *    service — the paper's §3.2 caveat; local/HDFS create(false) is
  *    atomic.)
  *  - delete/compact are LOGICAL rewrites: new segments added, old
  *    ones removed in the same commit; prior versions stay readable
  *    (time travel) because removed segments are not physically
  *    deleted until a vacuum (not implemented — retention policy is
  *    deployment-specific).
  *
  * At 100 TB the wins are the same as the paper's: O(1) commits
  * regardless of table size, readers pinned to a consistent snapshot
  * while writers land, and compaction fixing small-file pressure
  * without blocking reads. */
class LogStore(spark: SparkSession, val root: String) {

  final class ConcurrentCommitException(v: Long)
    extends RuntimeException(s"version $v was committed concurrently")

  private val logDir = s"$root/_log"
  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionPath(v: Long): Path =
    new Path(f"$logDir/$v%08d.json")

  /** Committed versions in order, -1 if the table does not exist. */
  def latestVersion(): Long = {
    val d = new Path(logDir)
    if (!fs.exists(d)) return -1L
    val vs = fs.listStatus(d).map(_.getPath.getName)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
    if (vs.isEmpty) -1L else vs.max
  }

  /** Parse one version file: (adds, removes) segment names. The
    * format is one JSON object per line, `{"add":"seg"}` or
    * `{"remove":"seg"}` — minimal on purpose; stats/partition values
    * per action are the natural extension. */
  private def readActions(v: Long): (Seq[String], Seq[String]) = {
    val in = fs.open(versionPath(v))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val add = "\"add\"\\s*:\\s*\"([^\"]+)\"".r
      .findAllMatchIn(body).map(_.group(1)).toSeq
    val rem = "\"remove\"\\s*:\\s*\"([^\"]+)\"".r
      .findAllMatchIn(body).map(_.group(1)).toSeq
    (add, rem)
  }

  /** The live segment set at `version` (default: latest): replay the
    * log in order. O(#actions), independent of data size. */
  def liveSegments(version: Long = Long.MaxValue): Seq[String] = {
    val latest = latestVersion()
    require(latest >= 0, s"no log at $root")
    val upTo = math.min(version, latest)
    require(upTo >= 0, s"bad version $version")
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    (0L to upTo).foreach { v =>
      val (adds, removes) = readActions(v)
      live ++= adds
      live --= removes
    }
    live.toSeq
  }

  /** Snapshot read at `version` (default latest) — a parquet scan of
    * exactly the live segments; committed-but-then-removed segments
    * of later versions are invisible, uncommitted segments always
    * are. */
  def read(version: Long = Long.MaxValue): DataFrame = {
    val segs = liveSegments(version)
    if (segs.isEmpty)
      throw new IllegalStateException(s"empty table at $root")
    spark.read.parquet(segs.map(s => s"$root/$s"): _*)
  }

  /** Write `df` as a fresh immutable segment and return its name —
    * NOT yet visible; publication happens in [[commit]]. */
  private def writeSegment(df: DataFrame): String = {
    val name = s"seg-${java.util.UUID.randomUUID().toString.take(12)}"
    df.write.parquet(s"$root/$name")
    name
  }

  /** Publish a commit at `expected` version via create-exclusive —
    * the optimistic-concurrency point. */
  private def commit(expected: Long, adds: Seq[String],
      removes: Seq[String]): Long = {
    fs.mkdirs(new Path(logDir))
    val body = (adds.map(s => s"""{"add":"$s"}""") ++
      removes.map(s => s"""{"remove":"$s"}"""))
      .mkString("", "\n", "\n")
    val out = try fs.create(versionPath(expected), false)
      catch { case _: java.io.IOException =>
        throw new ConcurrentCommitException(expected) }
    try out.write(body.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    expected
  }

  /** Append `df` as a new version; returns the committed version.
    * `baseVersion` is the snapshot the writer READ before producing
    * `df` — the commit lands at baseVersion+1 or throws
    * [[ConcurrentCommitException]] if another writer got there first
    * (the paper's optimistic loop: re-read, re-derive, retry). The
    * default re-reads latest at call time, which is correct for
    * blind appends but forfeits conflict detection for read-modify-
    * write transactions — those must pass the version they read. */
  def append(df: DataFrame,
      baseVersion: Long = Long.MinValue): Long = {
    val base =
      if (baseVersion == Long.MinValue) latestVersion() else baseVersion
    commit(base + 1, Seq(writeSegment(df)), Nil)
  }

  /** Logical delete: rewrite the rows NOT matching `predicate` into a
    * new segment, remove every current segment — one commit, prior
    * snapshots untouched. (Without per-segment stats this rewrites
    * the whole table; add-file pruning by min/max stats is the
    * optimization the paper layers on.) */
  def deleteWhere(predicate: String): Long = {
    val v = latestVersion()
    val old = liveSegments(v)
    val kept = read(v).where(s"NOT ($predicate)")
    commit(v + 1, Seq(writeSegment(kept)), old)
  }

  /** Compaction: same rows, one segment — the small-files fix. The
    * snapshot BEFORE compaction remains readable at its version. */
  def compact(): Long = {
    val v = latestVersion()
    val old = liveSegments(v)
    commit(v + 1, Seq(writeSegment(read(v))), old)
  }
}
