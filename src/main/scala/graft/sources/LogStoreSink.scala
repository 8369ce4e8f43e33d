package graft.sources

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, NullOrdering, SortDirection, SortOrder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

import graft.catalog.LogStore

/** The `graft-log` WRITE path — `df.write.format("graft-log")
  * .option("path", root).mode("append").save()` and
  * `df.writeStream.format("graft-log")` — the sink half of the DSv2
  * connector, so a transactional table can be produced by ANY Spark
  * job (SQL inserts, streaming queries, other teams' pipelines)
  * without touching the programmatic API:
  *
  *  - **Executors write, the driver commits.** Each task streams its
  *    rows into its own parquet file under a staging directory
  *    (`_stage-*` — invisible: no commit references it); the driver's
  *    commit renames exactly the files named in the task COMMIT
  *    MESSAGES into a fresh `seg-*` directory and publishes it as one
  *    version via [[graft.catalog.LogStore.publishSegments]] — so a
  *    crashed/speculated task attempt's file (present on disk, absent
  *    from the messages) can never leak into the table. Crash-orphaned
  *    staging directories are reclaimed by vacuum's orphan path.
  *  - **The table's own contract is enforced at commit**: schema
  *    enforcement against the recorded metadata action (add columns =
  *    evolution, mutate a type = loud refusal), skipping stats + Bloom
  *    filters computed per the table's recorded `props` configuration
  *    — a connector write is indistinguishable from a programmatic
  *    append. The table advertises ACCEPT_ANY_SCHEMA so Spark defers
  *    schema checking to this gate (Spark's own by-name check would
  *    refuse the evolution the table is contractually obliged to
  *    accept).
  *  - **Streaming is exactly-once** by the same `txn` fence as
  *    `appendStream`: the epoch id rides the commit; a replayed epoch
  *    (restart from a stale — or deleted — Spark checkpoint) publishes
  *    nothing and its staged files are discarded. An empty epoch
  *    advances the fence with a txn-only commit (no junk segment).
  *
  * At 100 TB the shape is the point: N tasks write N files in
  * parallel (no driver data path), the commit is O(files) renames +
  * one O(segment) stats pass, and the optimistic-retry loop makes
  * concurrent writers safe. */
final class LogWriteBuilder(root: String, info: LogicalWriteInfo)
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  // INSERT OVERWRITE / df.write.mode("overwrite"): Spark signals a
  // full-table overwrite as truncate-then-append on ONE builder; the
  // sink turns it into ONE atomic publishReplace commit (new segments
  // in, every prior live segment out, honest minimal-diff feed, prior
  // snapshots time-travelable). Filter-scoped overwrites are not
  // offered (no SupportsOverwrite) — Spark refuses them loudly.
  private var overwrite = false
  override def truncate(): WriteBuilder = { overwrite = true; this }

  override def build(): Write = {
    val schema = info.schema()
    schema.fields.foreach { f =>
      require(LogParquetWrite.writable(f.dataType),
        s"graft-log stores flat columns; '${f.name}' is ${f.dataType}")
    }
    // auto-maintenance (write options): when `maintainMinBytes` is
    // set, each successful commit is followed by a maintainLayout
    // pass — a streaming ingest (one small segment per epoch) keeps
    // its segment count bounded forever, hands-off
    val opts = info.options()
    val maintain = Option(opts.get("maintainMinBytes")).map { mb =>
      MaintainOpts(mb.toLong,
        Option(opts.get("maintainSmallLimit")).map(_.toInt)
          .getOrElse(8),
        Option(opts.get("maintainMaxBytes")).map(_.toLong)
          .getOrElse(128L << 20))
    }
    // clustered ingest: `clusterBy=col[,col2]` asks Spark (via
    // RequiresDistributionAndOrdering) to RANGE-distribute and sort
    // the rows before they reach the writers, and the commit then
    // publishes each task file as ITS OWN segment — per-segment
    // bounds become tight disjoint ranges, so skipping reads prune
    // from the FIRST write, no post-hoc OPTIMIZE needed
    val clusterBy = Option(opts.get("clusterBy")).toSeq
      .flatMap(_.split(',').toSeq).map(_.trim).filter(_.nonEmpty)
    clusterBy.foreach(c => require(schema.fieldNames.contains(c),
      s"clusterBy column '$c' is not in the write schema"))
    val clusterParts =
      Option(opts.get("clusterPartitions")).map(_.toInt).getOrElse(0)
    new LogWrite(root, schema, maintain, clusterBy, clusterParts,
      overwrite)
  }
}

final case class MaintainOpts(minBytes: Long, smallLimit: Int,
    maxBytes: Long)

final class LogWrite(root: String, schema: StructType,
    maintain: Option[MaintainOpts], clusterBy: Seq[String] = Nil,
    clusterParts: Int = 0, overwrite: Boolean = false)
    extends Write with RequiresDistributionAndOrdering {
  override def description(): String = s"GraftLogWrite($root)"

  private def sortOrders: Array[SortOrder] = clusterBy.map(c =>
    Expressions.sort(Expressions.column(c), SortDirection.ASCENDING,
      NullOrdering.NULLS_FIRST)).toArray
  override def requiredDistribution(): Distribution =
    if (clusterBy.isEmpty) Distributions.unspecified()
    else Distributions.ordered(sortOrders)
  override def requiredOrdering(): Array[SortOrder] =
    if (clusterBy.isEmpty) Array.empty else sortOrders
  override def requiredNumPartitions(): Int = clusterParts

  override def toBatch: BatchWrite =
    new LogBatchWrite(root, schema, maintain, clusterBy.nonEmpty,
      overwrite)
  override def toStreaming: StreamingWrite = {
    // complete-mode streaming would overwrite per epoch; the keyed
    // upsert sink (StreamingOps.upsertAggToLog) is the supported
    // latest-state shape — refusing beats silently appending
    if (overwrite) throw new UnsupportedOperationException(
      "graft-log streaming writes are append-mode (epoch-fenced); " +
        "for a latest-state table use update mode with " +
        "StreamingOps.upsertAggToLog")
    new LogStreamingWrite(root, schema, maintain, clusterBy.nonEmpty)
  }
}

final case class LogWriteMessage(file: Option[String])
  extends WriterCommitMessage

/** One batch append: all task files → one `seg-*` directory → one
  * committed version. */
final class LogBatchWrite(root: String, schema: StructType,
    maintain: Option[MaintainOpts] = None,
    fileAsSegment: Boolean = false,
    overwrite: Boolean = false)
    extends BatchWrite {
  private val stage = s"_stage-${UUID.randomUUID().toString.take(12)}"

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new LogDataWriterFactory(s"$root/$stage",
      LogDataWriterFactory.physicalFor(SparkSession.active, root,
        schema),
      LogStreamPlanning.confEntries(SparkSession.active))

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    if (overwrite)
      LogSinkCommit.publishOverwrite(root, s"$root/$stage", schema,
        messages, fileAsSegment = fileAsSegment)
    else LogSinkCommit.publish(root, s"$root/$stage", schema,
      messages, txn = None, maintain = maintain,
      fileAsSegment = fileAsSegment)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    LogSinkCommit.cleanup(SparkSession.active, s"$root/$stage")
}

/** One streaming query: per EPOCH, its own staging directory (so an
  * in-flight epoch is never confused with an abandoned one), one
  * `seg-*` directory, one fenced commit. */
final class LogStreamingWrite(root: String, schema: StructType,
    maintain: Option[MaintainOpts] = None,
    fileAsSegment: Boolean = false)
    extends StreamingWrite {
  private val stagePrefix = s"$root/_stage-${
    UUID.randomUUID().toString.take(12)}"

  // the factory gets the bare prefix; each task APPENDS its epoch
  // (createWriter's epochId) so files land in the exact per-epoch
  // directory commit/abort operate on — epoch isolation is real, an
  // abort(epochId) removes precisely the files its epoch staged
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new LogDataWriterFactory(stagePrefix,
      LogDataWriterFactory.physicalFor(SparkSession.active, root,
        schema),
      LogStreamPlanning.confEntries(SparkSession.active))

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    LogSinkCommit.publish(root, s"$stagePrefix-e$epochId", schema,
      messages, txn = Some(epochId), maintain = maintain,
      fileAsSegment = fileAsSegment)

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    LogSinkCommit.cleanup(SparkSession.active, s"$stagePrefix-e$epochId")
}

private[sources] object LogSinkCommit {
  /** Driver-side publish: move exactly the message-named files from
    * `stageDir` into a fresh segment directory, commit it through the
    * table's own gate (schema enforcement, stats, Bloom, optimistic
    * retry, txn fence), then drop the staging directory — losers of a
    * speculative race and all. A fenced streaming replay (publish
    * returns -1) discards the staged segment instead. */
  def publish(root: String, stageDir: String, schema: StructType,
      messages: Array[WriterCommitMessage], txn: Option[Long],
      maintain: Option[MaintainOpts] = None,
      fileAsSegment: Boolean = false): Unit = {
    val spark = SparkSession.active
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val files = messages.collect {
      case LogWriteMessage(Some(f)) => f
    }
    if (files.isEmpty) {
      // nothing written: an EMPTY epoch still advances the stream
      // fence (txn-only commit, no junk segment); an empty batch
      // write of a not-yet-existing table is a no-op
      val store = LogStore.configured(spark, root)
      txn.foreach { id =>
        if (store.latestVersion() >= 0) store.commitFence(id)
      }
      cleanup(spark, stageDir)
      return
    }
    val segNames = stageToSegments(fs, root, files.toSeq, fileAsSegment)
    val store = LogStore.configured(spark, root)
    val v = store.publishSegments(segNames, schema, txn = txn)
    if (v == -1L) // fenced replay: the epoch already landed
      segNames.foreach(s => fs.delete(new Path(s"$root/$s"), true))
    cleanup(spark, stageDir)
    // post-commit maintenance: below the threshold it is a commit-free
    // no-op; NOTHING here may fail the epoch that already landed —
    // a lost maintenance race (concurrent writer) just waits for the
    // next batch
    if (v != -1L) maintain.foreach { m =>
      try store.maintainLayout(m.minBytes, m.smallLimit, m.maxBytes)
      catch {
        case scala.util.control.NonFatal(e) => System.err.println(
          s"[graft-log] post-commit maintainLayout at $root skipped: $e")
      }
    }
  }

  /** Move the message-named staged files into fresh `seg-*`
    * directories — one segment per commit (the append shape) or one
    * per task file (clustered ingest: each range-partitioned file
    * carries its own tight bounds in the log). */
  private def stageToSegments(fs: org.apache.hadoop.fs.FileSystem,
      root: String, files: Seq[String],
      fileAsSegment: Boolean): Seq[String] = {
    val groups: Seq[Seq[String]] =
      if (fileAsSegment) files.map(Seq(_)) else Seq(files)
    groups.map { group =>
      val segName = s"seg-${UUID.randomUUID().toString.take(12)}"
      fs.mkdirs(new Path(s"$root/$segName"))
      group.foreach { f =>
        val from = new Path(f)
        if (!fs.rename(from,
            new Path(s"$root/$segName/${from.getName}")))
          throw new java.io.IOException(s"staging rename of $f failed")
      }
      segName
    }
  }

  /** INSERT OVERWRITE / mode("overwrite"): the staged files REPLACE
    * the table's entire live content in ONE commit
    * ([[graft.catalog.LogStore.publishReplace]] — readVersion+1 OCC,
    * schema enforcement, stats/Bloom metadata, honest minimal-diff
    * change feed; prior snapshots stay time-travelable at their
    * versions). An overwrite with ZERO rows is an atomic truncate;
    * one against an empty/nonexistent table degrades to the plain
    * first publish. */
  def publishOverwrite(root: String, stageDir: String,
      schema: StructType, messages: Array[WriterCommitMessage],
      fileAsSegment: Boolean = false): Unit = {
    val spark = SparkSession.active
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val files = messages.collect { case LogWriteMessage(Some(f)) => f }
    val store = LogStore.configured(spark, root)
    val readVersion = store.latestVersion()
    val removes =
      if (readVersion < 0) Nil else store.liveSegments(readVersion)
    if (files.isEmpty && removes.isEmpty) {
      cleanup(spark, stageDir) // overwriting nothing with nothing
      return
    }
    // zero staged files = atomic truncate: no segment directory may
    // be created (an empty seg dir is unreadable and unreferenced)
    val segNames =
      if (files.isEmpty) Nil
      else stageToSegments(fs, root, files.toSeq, fileAsSegment)
    store.publishReplace(segNames, removes, schema, readVersion)
    cleanup(spark, stageDir)
  }

  def cleanup(spark: SparkSession, stageDir: String): Unit = {
    val fs = new Path(stageDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(stageDir), true)
  }
}

final class LogDataWriterFactory(stageDir: String, schema: StructType,
    confEntries: Array[(String, String)])
    extends DataWriterFactory with StreamingDataWriterFactory {
  private def conf: Configuration = {
    val c = new Configuration(false)
    confEntries.foreach { case (k, v) => c.set(k, v) }
    c
  }
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new LogDataWriter(
      s"$stageDir/part-$partitionId-$taskId.parquet", schema, conf)
  // the streaming form: stageDir is the QUERY prefix — the epoch id
  // completes it to the per-epoch staging directory the driver's
  // commit(epochId)/abort(epochId) operate on, so epochs never share
  // a staging dir and abort cleanup actually removes what was written
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new LogDataWriter(
      s"$stageDir-e$epochId/part-$partitionId-$taskId.parquet", schema,
      conf)
}

object LogDataWriterFactory {
  /** The PHYSICAL write schema for a write of `schema` into the table
    * at `root`: field names swapped per the table's RECORDED column
    * mapping, matched by LOGICAL name — a plain DataFrame append
    * carries no mapping metadata of its own, so the table's schema is
    * the source of truth; fields unknown to the table (a write-side
    * evolution) keep their own name. Identity for unmapped tables and
    * first writes. Resolved DRIVER-side (factories serialize to
    * executors). Rows arrive in the logical schema's POSITIONS, so
    * renaming the fields is the whole translation. */
  def physicalFor(spark: org.apache.spark.sql.SparkSession,
      root: String, schema: StructType): StructType = {
    import graft.catalog.LogStore
    val recorded =
      try {
        val st = new LogStore(spark, root)
        if (st.latestVersion() < 0) None else st.recordedSchema()
      } catch { case scala.util.control.NonFatal(_) => None }
    val byName = recorded
      .map(_.fields.iterator
        .map(f => f.name -> LogStore.physicalName(f)).toMap)
      .getOrElse(Map.empty[String, String])
    if (byName.forall { case (l, p) => l == p }) schema
    else StructType(schema.fields.map(f =>
      f.copy(name = byName.getOrElse(f.name, LogStore.physicalName(f)))))
  }
}

/** Executor-side writer: one task, one parquet file, opened LAZILY on
  * the first row (an empty task stages nothing), rows converted
  * InternalRow → parquet Group against the exact physical encodings
  * the read side ([[LogStreamPartitionReader]]) understands. */
final class LogDataWriter(file: String, schema: StructType,
    conf: Configuration) extends DataWriter[InternalRow] {
  private val messageType = LogParquetWrite.messageTypeOf(schema)
  private val factory = new SimpleGroupFactory(messageType)
  private var writer: ParquetWriter[Group] = _

  override def write(row: InternalRow): Unit = {
    if (writer == null) {
      GroupWriteSupport.setSchema(messageType, conf)
      writer = ExampleParquetWriter.builder(new Path(file))
        .withConf(conf)
        .withCompressionCodec(CompressionCodecName.SNAPPY)
        .build()
    }
    writer.write(LogParquetWrite.toGroup(row, schema, factory))
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    LogWriteMessage(Option(writer).map(_ => file))
  }

  override def abort(): Unit = {
    if (writer != null) {
      writer.close()
      new Path(file).getFileSystem(conf).delete(new Path(file), false)
    }
  }

  override def close(): Unit = ()
}

private[sources] object LogParquetWrite {
  def writable(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
        FloatType | DoubleType | StringType | BinaryType | DateType |
        TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Spark schema → parquet MessageType, with the standard logical
    * annotations so the files read back IDENTICALLY through both
    * Spark's vectorized reader (LogStore.read) and the connector's
    * Group reader: INT(8/16) for byte/short, DATE on INT32,
    * TIMESTAMP(MICROS, adjusted/unadjusted) on INT64, STRING on
    * BINARY, DECIMAL on INT32/INT64/BINARY by precision. */
  def messageTypeOf(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t = f.dataType match {
        case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN)
        case ByteType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.intType(8, true))
        case ShortType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.intType(16, true))
        case IntegerType => Types.optional(PrimitiveTypeName.INT32)
        case LongType => Types.optional(PrimitiveTypeName.INT64)
        case FloatType => Types.optional(PrimitiveTypeName.FLOAT)
        case DoubleType => Types.optional(PrimitiveTypeName.DOUBLE)
        case StringType => Types.optional(PrimitiveTypeName.BINARY)
          .as(LogicalTypeAnnotation.stringType())
        case BinaryType => Types.optional(PrimitiveTypeName.BINARY)
        case DateType => Types.optional(PrimitiveTypeName.INT32)
          .as(LogicalTypeAnnotation.dateType())
        case TimestampType => Types.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.MICROS))
        case TimestampNTZType => Types.optional(PrimitiveTypeName.INT64)
          .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.MICROS))
        case d: DecimalType if d.precision <= 9 =>
          Types.optional(PrimitiveTypeName.INT32)
            .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision))
        case d: DecimalType if d.precision <= 18 =>
          Types.optional(PrimitiveTypeName.INT64)
            .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision))
        case d: DecimalType =>
          Types.optional(PrimitiveTypeName.BINARY)
            .as(LogicalTypeAnnotation.decimalType(d.scale, d.precision))
        case other => throw new IllegalArgumentException(
          s"graft-log stores flat columns; got $other")
      }
      b.addField(t.named(f.name))
    }
    b.named("graft_log_write")
  }

  /** One InternalRow → Group; nulls are simply not added (optional
    * fields, repetition 0 — exactly what the read side maps back to
    * null). */
  def toGroup(row: InternalRow, schema: StructType,
      factory: SimpleGroupFactory): Group = {
    val g = factory.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        schema.fields(i).dataType match {
          case BooleanType => g.add(i, row.getBoolean(i))
          case ByteType => g.add(i, row.getByte(i).toInt)
          case ShortType => g.add(i, row.getShort(i).toInt)
          case IntegerType | DateType => g.add(i, row.getInt(i))
          case LongType => g.add(i, row.getLong(i))
          case FloatType => g.add(i, row.getFloat(i))
          case DoubleType => g.add(i, row.getDouble(i))
          case StringType => g.add(i,
            Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
          case BinaryType => g.add(i,
            Binary.fromConstantByteArray(row.getBinary(i)))
          case TimestampType | TimestampNTZType => g.add(i, row.getLong(i))
          case d: DecimalType if d.precision <= 9 =>
            g.add(i, row.getDecimal(i, d.precision, d.scale)
              .toUnscaledLong.toInt)
          case d: DecimalType if d.precision <= 18 =>
            g.add(i, row.getDecimal(i, d.precision, d.scale)
              .toUnscaledLong)
          case d: DecimalType =>
            g.add(i, Binary.fromConstantByteArray(
              row.getDecimal(i, d.precision, d.scale)
                .toJavaBigDecimal.unscaledValue().toByteArray))
          case other => throw new IllegalArgumentException(
            s"unwritable type $other")
        }
      }
      i += 1
    }
    g
  }
}
