package graft.sources

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

import graft.catalog.LogStore

/** SQL-CALLABLE MAINTENANCE — the weekly 100 TB commands with no
  * Scala in sight, as DSv2 stored procedures on the graft catalog:
  *
  * {{{
  *   CALL graft.system.optimize(`table` => 'ns.t',
  *     target_segments => 8, where_col => 'id',
  *     where_lo => '100', where_hi => '200')   -- subset re-cluster
  *   CALL graft.system.optimize(`table` => 'ns.t',
  *     min_segment_bytes => 1048576)           -- small-file bin-pack
  *   CALL graft.system.maintain(`table` => 'ns.t',
  *     min_segment_bytes => 1048576)           -- the hands-off policy
  *   CALL graft.system.vacuum(`table` => 'ns.t', retain_last => 10)
  *   CALL graft.system.checkpoint(`table` => 'ns.t')
  * }}}
  *
  * Each procedure resolves the table path through the catalog's own
  * identifier rules, reconstructs the store FROM THE LOG's recorded
  * props (so skipping-config-aware selection needs no out-of-band
  * setup), delegates to the programmatic command —
  * [[graft.catalog.LogStore.optimizeWhere]] / [[graft.catalog
  * .LogStore.maintainLayout]] / [[graft.catalog.LogStore.vacuum]] /
  * [[graft.catalog.LogStore.checkpoint]] — and returns the same
  * result numbers as one SQL row (also visible in `t$history`).
  * All of them keep the commands' economics: subset optimize costs ∝
  * selected bytes, maintain below threshold is a commit-free no-op,
  * vacuum's orphan age guard holds its conservative default. */
private[sources] sealed abstract class GraftProcedure(
    pname: String, catalog: GraftLogCatalog)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = pname
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false // they commit

  protected def in(n: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(n, dt).build()
  protected def inDefault(n: String, dt: DataType,
      sqlDefault: String): ProcedureParameter =
    ProcedureParameter.in(n, dt).defaultValue(sqlDefault).build()

  /** The `table` argument ('ns.t' or 't', relative to the catalog
    * root) as a configured store. */
  protected def storeOf(input: InternalRow): LogStore = {
    require(!input.isNullAt(0), s"$pname needs `table` => 'ns.t'")
    val parts = input.getUTF8String(0).toString.split('.').toSeq
    LogStore.configured(SparkSession.active,
      catalog.resolveTableDir(parts))
  }

  protected def one(schema: StructType,
      vals: Array[Any]): util.Iterator[Scan] =
    util.Collections.singletonList(new LocalScan {
      override def readSchema(): StructType = schema
      override def description(): String = s"graft_$pname result"
      override def rows(): Array[InternalRow] =
        Array(new GenericInternalRow(vals))
    }: Scan).iterator()

  protected def clusterCols(input: InternalRow, i: Int)
      : Seq[org.apache.spark.sql.Column] =
    if (input.isNullAt(i)) Nil
    else input.getUTF8String(i).toString.split(',').toSeq
      .map(_.trim).filter(_.nonEmpty)
      .map(org.apache.spark.sql.functions.col)
}

private[sources] final class OptimizeProcedure(
    catalog: GraftLogCatalog) extends GraftProcedure("optimize", catalog) {
  override def description(): String =
    "rewrite segments: full re-cluster, stats-selected subset, or " +
      "small-file bin-pack — cost ∝ selected bytes"
  override def parameters(): Array[ProcedureParameter] = Array(
    in("table", StringType),
    inDefault("target_segments", IntegerType, "8"),
    inDefault("where_col", StringType, "CAST(NULL AS STRING)"),
    inDefault("where_lo", StringType, "CAST(NULL AS STRING)"),
    inDefault("where_hi", StringType, "CAST(NULL AS STRING)"),
    inDefault("min_segment_bytes", LongType, "CAST(0 AS BIGINT)"),
    inDefault("cluster_by", StringType, "CAST(NULL AS STRING)"),
    // DV COMPACTION selector: also rewrite every segment carrying a
    // deletion vector, folding merge-on-read debt back into clean
    // segments — the weekly command for a dvDeletes table
    inDefault("with_deletes", BooleanType, "false"))

  private val out = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("rewritten", IntegerType, nullable = false),
    StructField("produced", IntegerType, nullable = false),
    StructField("carried", IntegerType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[Scan] = {
    val store = storeOf(input)
    val target = input.getInt(1)
    val preds =
      if (input.isNullAt(2)) Nil
      else {
        require(!input.isNullAt(3) && !input.isNullAt(4),
          "where_col needs where_lo and where_hi")
        Seq((input.getUTF8String(2).toString,
          input.getUTF8String(3).toString,
          input.getUTF8String(4).toString))
      }
    val minBytes = input.getLong(5)
    val cluster = clusterCols(input, 6)
    val withDeletes = !input.isNullAt(7) && input.getBoolean(7)
    val r =
      if (preds.isEmpty && minBytes <= 0L && !withDeletes)
        store.optimize(target, cluster: _*)
      else store.optimizeWhere(target, preds, minBytes, cluster,
        withDeletes)
    one(out, Array(r.version, r.rewritten, r.produced, r.carried))
  }
}

private[sources] final class MaintainProcedure(
    catalog: GraftLogCatalog) extends GraftProcedure("maintain", catalog) {
  override def description(): String =
    "hands-off bin-pack + DV-compaction policy: commit-free no-op " +
      "below the small-segment and vector-pressure thresholds"
  override def parameters(): Array[ProcedureParameter] = Array(
    in("table", StringType),
    in("min_segment_bytes", LongType),
    inDefault("small_limit", IntegerType, "8"),
    inDefault("max_segment_bytes", LongType,
      s"CAST(${128L << 20} AS BIGINT)"),
    inDefault("cluster_by", StringType, "CAST(NULL AS STRING)"),
    // vector pressure: rewrite any segment whose deletion vector
    // holds >= this fraction of its rows (0 disables the rule)
    inDefault("dv_fraction", DoubleType, "CAST(0.5 AS DOUBLE)"))

  private val out = StructType(Seq(
    StructField("triggered", BooleanType, nullable = false),
    StructField("small_before", IntegerType, nullable = false),
    StructField("dv_pressured", IntegerType, nullable = false),
    StructField("version", LongType, nullable = true),
    StructField("rewritten", IntegerType, nullable = true),
    StructField("produced", IntegerType, nullable = true)))

  override def call(input: InternalRow): util.Iterator[Scan] = {
    val store = storeOf(input)
    val r = store.maintainLayout(input.getLong(1), input.getInt(2),
      input.getLong(3), clusterCols(input, 4),
      dvFraction = if (input.isNullAt(5)) 0.5 else input.getDouble(5))
    one(out, Array(r.triggered, r.smallBefore, r.dvPressured,
      r.result.map(o => o.version: Any).orNull,
      r.result.map(o => o.rewritten: Any).orNull,
      r.result.map(o => o.produced: Any).orNull))
  }
}

private[sources] final class VacuumProcedure(
    catalog: GraftLogCatalog) extends GraftProcedure("vacuum", catalog) {
  override def description(): String =
    "physically reclaim segments behind a retention horizon (the " +
      "orphan age guard keeps its conservative default)"
  override def parameters(): Array[ProcedureParameter] = Array(
    in("table", StringType),
    inDefault("retain_last", IntegerType, "10"),
    inDefault("orphan_min_age_ms", LongType,
      s"CAST(${3600L * 1000} AS BIGINT)"))

  private val out = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("n_deleted", IntegerType, nullable = false),
    StructField("n_log_trimmed", IntegerType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[Scan] = {
    val store = storeOf(input)
    val r = store.vacuum(input.getInt(1), input.getLong(2))
    one(out, Array(r.version, r.deleted.size, r.trimmedLogFiles))
  }
}

private[sources] final class CheckpointProcedure(
    catalog: GraftLogCatalog) extends GraftProcedure("checkpoint", catalog) {
  override def description(): String =
    "snapshot the replayed log state so resolution seeds O(1)"
  override def parameters(): Array[ProcedureParameter] =
    Array(in("table", StringType))

  private val out = StructType(Seq(
    StructField("version", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[Scan] = {
    val store = storeOf(input)
    store.checkpoint()
    one(out, Array(store.latestVersion()))
  }
}

/** `CALL graft.system.add_check_constraint(`table` => 'ns.t',
  * name => 'qty_positive', expr => 'l_quantity >= 0')` — the SQL face
  * of [[graft.catalog.LogStore.addCheckConstraint]]: validates the
  * existing rows, commits the constraint as metadata, and every
  * subsequent write (INSERT, MERGE, UPDATE, streaming, clustered
  * ingest) must satisfy it before its commit. */
private[sources] final class AddConstraintProcedure(
    catalog: GraftLogCatalog)
    extends GraftProcedure("add_check_constraint", catalog) {
  override def description(): String =
    "add a CHECK constraint: validate existing rows, then gate every " +
      "subsequent write on the expression (ANSI: NULL passes)"
  override def parameters(): Array[ProcedureParameter] = Array(
    in("table", StringType),
    in("name", StringType),
    in("expr", StringType))

  private val out = StructType(Seq(
    StructField("version", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[Scan] = {
    val store = storeOf(input)
    require(!input.isNullAt(1) && !input.isNullAt(2),
      "add_check_constraint needs name => ... and expr => ...")
    val v = store.addCheckConstraint(
      input.getUTF8String(1).toString, input.getUTF8String(2).toString)
    one(out, Array(v))
  }
}

/** `CALL graft.system.drop_check_constraint(`table` => 'ns.t',
  * name => 'qty_positive')` — metadata-only removal; writes stop
  * validating from the commit on. */
private[sources] final class DropConstraintProcedure(
    catalog: GraftLogCatalog)
    extends GraftProcedure("drop_check_constraint", catalog) {
  override def description(): String =
    "drop a CHECK constraint (metadata-only)"
  override def parameters(): Array[ProcedureParameter] = Array(
    in("table", StringType),
    in("name", StringType))

  private val out = StructType(Seq(
    StructField("version", LongType, nullable = false)))

  override def call(input: InternalRow): util.Iterator[Scan] = {
    val store = storeOf(input)
    require(!input.isNullAt(1),
      "drop_check_constraint needs name => ...")
    val v = store.dropCheckConstraint(input.getUTF8String(1).toString)
    one(out, Array(v))
  }
}
