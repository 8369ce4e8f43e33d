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
class LogStore(spark: SparkSession, val root: String,
    statsCol: Option[String] = None) {

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

  /** One published segment with its optional [statsCol] min/max —
    * the skipping index. `num` records whether the bounds compare
    * numerically (stored as strings either way, so the log format
    * stays line-oriented). */
  final case class Segment(name: String, min: Option[String],
      max: Option[String], num: Boolean) {
    /** Could this segment contain a row with statsCol in [lo, hi]?
      * No stats ⇒ must assume yes (the safe default that makes stats
      * strictly an optimization). */
    def mayOverlap(lo: String, hi: String): Boolean = (min, max) match {
      case (Some(mn), Some(mx)) =>
        if (num) mn.toDouble <= hi.toDouble && mx.toDouble >= lo.toDouble
        else mn <= hi && mx >= lo
      case _ => true
    }
  }

  /** Parse one version file: (adds, removes, txns). One JSON object
    * per line: `{"add":"seg"[,"min":"..","max":"..","num":true]}`,
    * `{"remove":"seg"}`, or `{"txn":<id>}` (the idempotent-stream
    * fence). Flat line-oriented JSON on purpose — greppable, and a
    * regex parse with no library dependency. */
  private def readActions(v: Long)
      : (Seq[Segment], Seq[String], Seq[Long]) = {
    val in = fs.open(versionPath(v))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val addRe = ("\"add\"\\s*:\\s*\"([^\"]+)\"" +
      "(?:,\"min\":\"([^\"]*)\",\"max\":\"([^\"]*)\",\"num\":(true|false))?").r
    val adds = addRe.findAllMatchIn(body).map { m =>
      Segment(m.group(1), Option(m.group(2)), Option(m.group(3)),
        m.group(4) == "true")
    }.toSeq
    val rem = "\"remove\"\\s*:\\s*\"([^\"]+)\"".r
      .findAllMatchIn(body).map(_.group(1)).toSeq
    val txns = "\"txn\"\\s*:\\s*(-?\\d+)".r
      .findAllMatchIn(body).map(_.group(1).toLong).toSeq
    (adds, rem, txns)
  }

  /** The live segment set (with stats) at `version` (default:
    * latest): replay the log in order. O(#actions), independent of
    * data size. */
  def liveSegmentInfos(version: Long = Long.MaxValue): Seq[Segment] = {
    val latest = latestVersion()
    require(latest >= 0, s"no log at $root")
    val upTo = math.min(version, latest)
    require(upTo >= 0, s"bad version $version")
    val live = scala.collection.mutable.LinkedHashMap.empty[String, Segment]
    (0L to upTo).foreach { v =>
      val (adds, removes, _) = readActions(v)
      adds.foreach(a => live(a.name) = a)
      removes.foreach(live -= _)
    }
    live.values.toSeq
  }

  def liveSegments(version: Long = Long.MaxValue): Seq[String] =
    liveSegmentInfos(version).map(_.name)

  /** The last stream-transaction id recorded in the log, or
    * Long.MinValue — the replay fence of [[appendStream]] (the
    * paper's `txn` action). */
  def lastTxn(): Long = {
    val latest = latestVersion()
    if (latest < 0) return Long.MinValue
    val ids = (0L to latest).flatMap(v => readActions(v)._3)
    if (ids.isEmpty) Long.MinValue else ids.max
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

  /** Data-skipping read: scan ONLY the live segments whose
    * [statsCol] min/max range may overlap [lo, hi], then apply the
    * row-level filter on what is scanned — segment-level pruning
    * BEFORE any parquet footer is opened, the log-side complement of
    * parquet's row-group stats. Returns (dataframe, scanned, live) so
    * callers (and the spec) can see the skip rate. */
  def readRange(lo: String, hi: String,
      version: Long = Long.MaxValue): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.{col => fcol, lit => flit}
    val c = statsCol.getOrElse(
      throw new IllegalStateException("no statsCol configured"))
    val live = liveSegmentInfos(version)
    val hit = live.filter(_.mayOverlap(lo, hi))
    if (hit.isEmpty)
      return (read(version).where(flit(false)), 0, live.size)
    val scan = spark.read.parquet(hit.map(s => s"$root/${s.name}"): _*)
    val dt = scan.schema(c).dataType
    (scan.where(fcol(c).between(flit(lo).cast(dt), flit(hi).cast(dt))),
      hit.size, live.size)
  }

  /** Write `df` as a fresh immutable segment and return its add
    * action (with [statsCol] min/max when configured) — NOT yet
    * visible; publication happens in [[commit]]. */
  private def writeSegment(df: DataFrame): Segment = {
    val name = s"seg-${java.util.UUID.randomUUID().toString.take(12)}"
    df.write.parquet(s"$root/$name")
    statsCol match {
      case Some(c) if df.columns.contains(c) =>
        import org.apache.spark.sql.functions.{max => fmax, min => fmin, col => fcol}
        val written = spark.read.parquet(s"$root/$name")
        val row = written
          .agg(fmin(fcol(c)).cast("string"), fmax(fcol(c)).cast("string"))
          .head()
        val num = written.schema(c).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType]
        if (row.isNullAt(0)) Segment(name, None, None, num)
        else Segment(name, Some(row.getString(0)), Some(row.getString(1)),
          num)
      case _ => Segment(name, None, None, num = false)
    }
  }

  private def addJson(s: Segment): String = (s.min, s.max) match {
    case (Some(mn), Some(mx)) =>
      s"""{"add":"${s.name}","min":"$mn","max":"$mx","num":${s.num}}"""
    case _ => s"""{"add":"${s.name}"}"""
  }

  /** Publish a commit at `expected` version via create-exclusive —
    * the optimistic-concurrency point. */
  private def commit(expected: Long, adds: Seq[Segment],
      removes: Seq[String], txn: Option[Long] = None): Long = {
    fs.mkdirs(new Path(logDir))
    val body = (adds.map(addJson) ++
      removes.map(s => s"""{"remove":"$s"}""") ++
      txn.map(id => s"""{"txn":$id}""").toSeq)
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

  /** Idempotent streaming append — the paper's `txn` action: the
    * commit records the micro-batch id, and a replay of an
    * already-recorded batch is a NO-OP, so foreachBatch's
    * at-least-once delivery becomes exactly-once table content (the
    * same fence discipline as the sketch-state maintainers, here
    * carried inside the table's own log). Returns the committed
    * version, or -1 for a fenced replay. */
  def appendStream(df: DataFrame, batchId: Long): Long = {
    if (batchId <= lastTxn()) return -1L
    commit(latestVersion() + 1, Seq(writeSegment(df)), Nil,
      txn = Some(batchId))
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
