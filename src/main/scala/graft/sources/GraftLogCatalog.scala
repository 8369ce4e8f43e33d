package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.LogStore

/** The transactional tables as a SQL CATALOG — the surface that makes
  * the engine usable from pure SQL, no Scala API in sight:
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.GraftLogCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.root", "/data/tables")
  *
  *   CREATE TABLE graft.sales.orders (id BIGINT, amount DOUBLE)
  *     TBLPROPERTIES ('statsCol' = 'id', 'bloomCol' = 'region')
  *   INSERT INTO graft.sales.orders SELECT ...
  *   SELECT * FROM graft.sales.orders WHERE id BETWEEN 10 AND 20
  *   SELECT * FROM graft.sales.orders VERSION AS OF 3
  *   SELECT * FROM graft.sales.orders TIMESTAMP AS OF '...'
  * }}}
  *
  *  - **Layout**: one directory per table under the configured
  *    `root`, namespaces as intermediate directories; a directory IS
  *    a table iff it carries a `_log`. No metastore — the transaction
  *    log is the single source of truth, so the same paths stay fully
  *    usable through the programmatic API and the `graft-log` format.
  *  - **CREATE TABLE** initializes version 0 with the schema metadata
  *    action; `statsCol` / `statsCols` / `bloomCol` / `bloomBits`
  *    TBLPROPERTIES become the table's recorded skipping
  *    configuration (the `props` action) — every later writer,
  *    SQL or programmatic, inherits it from the log.
  *  - **Reads** are the connector's snapshot scan: filter pushdown to
  *    segment stats/Bloom skipping, column pruning, and SQL time
  *    travel (`VERSION AS OF` / `TIMESTAMP AS OF`) resolved through
  *    the in-log commit stamps.
  *  - **Writes** (INSERT INTO / INSERT BY NAME / CTAS /
  *    DataFrame saveAsTable-style appends) ride the DSv2 sink:
  *    staged executor files, one published commit, the table's own
  *    schema-enforcement gate.
  *  - **ALTER TABLE refuses loudly** — a LogStore schema evolves by
  *    WRITING evolved rows (the add-columns contract), never by
  *    catalog-side DDL mutation; renames/drops are filesystem moves
  *    guarded by existence checks.
  */
class GraftLogCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {
  private var catalogName: String = _
  private var rootDir: String = _

  private def spark = SparkSession.active
  private def fs: FileSystem = new Path(rootDir).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    rootDir = options.get("root")
    require(rootDir != null && rootDir.nonEmpty,
      s"catalog '$name' needs spark.sql.catalog.$name.root = <dir>")
  }

  override def name(): String = catalogName

  // advertise constraint DDL + CREATE-time column DEFAULTs so
  // Spark's parser routes ALTER TABLE … ADD/DROP CONSTRAINT here and
  // accepts DEFAULT clauses in CREATE TABLE (the default rides the
  // schema's CURRENT_DEFAULT metadata, which the log round-trips)
  override def capabilities(): util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  // path safety: identifier parts become directory names, so they may
  // not traverse ("..", "/") or hide ("" / ".") — refuse loudly on
  // EVERY operation; `_log` exactly stays blocked everywhere because a
  // namespace or table named `_log` makes its PARENT directory
  // classify as a table (isTable checks for a `_log` child).
  private def validPart(p: String): Boolean =
    p.nonEmpty && p != "." && p != ".." &&
      !p.contains("/") && !p.contains("\\") && p != "_log"

  // engine-reserved names — `seg-*`/`cdc-*`/`dv-*`/`_`-prefixed
  // collide with the data/staging directories the store itself writes
  // under a table root. Enforced at CREATE/RENAME time only: a table
  // that somehow exists under such a name (pre-rule logs, an external
  // copy) must stay reachable for DROP/RENAME, or it is stuck forever.
  private def reservedPart(p: String): Boolean =
    p.startsWith("_") || p.startsWith("seg-") ||
      p.startsWith("cdc-") || p.startsWith("dv-")

  private def requireCreatable(parts: Seq[String]): Unit =
    parts.foreach(p => require(!reservedPart(p),
      s"illegal identifier part '$p' (engine-reserved prefix)"))

  private def dirOf(parts: Seq[String]): String = {
    parts.foreach(p => require(validPart(p),
      s"illegal identifier part '$p'"))
    (rootDir +: parts).mkString("/")
  }

  private def tableDir(ident: Identifier): String =
    dirOf(ident.namespace.toSeq :+ ident.name)

  /** A table path from `ns.t` parts, through the same identifier
    * rules as every other catalog surface — the stored procedures'
    * resolver; refuses paths that are not tables. */
  private[sources] def resolveTableDir(parts: Seq[String]): String = {
    val dir = dirOf(parts)
    if (!isTable(dir))
      throw new NoSuchTableException(
        Identifier.of(parts.init.toArray, parts.last))
    dir
  }

  private def isTable(dir: String): Boolean =
    fs.exists(new Path(s"$dir/_log"))

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = dirOf(namespace.toSeq)
    if (!fs.exists(new Path(dir)))
      throw new NoSuchNamespaceException(namespace)
    fs.listStatus(new Path(dir)).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => isTable(s"$dir/$n"))
      .sorted
      .map(Identifier.of(namespace, _))
  }

  private def snapshotTable(ident: Identifier, versionAsOf: Option[Long],
      timestampAsOf: Option[Long]): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    // time travel presents the schema AS OF the target version — a
    // query behind an ADD COLUMN evolution sees the old shape, same
    // as the programmatic read(version)
    val schema = (versionAsOf, timestampAsOf) match {
      case (None, None) => LogStreamSource.snapshotSchema(dir)
      case _ =>
        val store = LogStore.configured(spark, dir)
        val v = versionAsOf.getOrElse(
          store.versionAsOf(timestampAsOf.get))
        store.recordedSchema(v) match {
          case Some(sc) => StructType(
            sc.fields.toSeq.map(_.copy(nullable = true)))
          case None => LogStreamSource.snapshotSchema(dir)
        }
    }
    new LogStreamTable(schema, dir,
      None, None, None, None, snapshot = true,
      versionAsOf = versionAsOf, timestampAsOf = timestampAsOf,
      acceptAnySchema = false)
  }

  /** `table$changes` / `table$history` / `table$detail` — the
    * Iceberg-style METADATA TABLES, so the change feed and the ops
    * views are plain SQL too: `SELECT * FROM cat.ns.t$changes` (also
    * streamable: `spark.readStream.table("cat.ns.t$changes")`),
    * `... t$history` (the per-version audit), `... t$detail` (the
    * one-row ops snapshot). Everything else resolves as the snapshot
    * table. */
  override def loadTable(ident: Identifier): Table = {
    val dollar = ident.name.indexOf('$')
    if (dollar > 0) {
      val dir = dirOf(ident.namespace.toSeq :+
        ident.name.substring(0, dollar))
      if (!isTable(dir)) throw new NoSuchTableException(ident)
      ident.name.substring(dollar + 1) match {
        case "changes" =>
          new LogStreamTable(LogStreamSource.feedSchema(dir), dir,
            None, None, None, None, readOnly = true)
        case "history" => new LogDriverTable(s"${ident.name}($dir)",
          () => LogStore.configured(SparkSession.active, dir)
            .describeHistory())
        case "detail" => new LogDriverTable(s"${ident.name}($dir)",
          () => LogStore.configured(SparkSession.active, dir)
            .describeDetail())
        case "segments" => new LogDriverTable(s"${ident.name}($dir)",
          () => LogStore.configured(SparkSession.active, dir)
            .describeSegments())
        case _ => throw new NoSuchTableException(ident)
      }
    } else snapshotTable(ident, None, None)
  }

  /** SQL `VERSION AS OF <v>`. */
  override def loadTable(ident: Identifier, version: String): Table =
    snapshotTable(ident, Some(version.toLongOption.getOrElse(
      throw new IllegalArgumentException(
        s"graft-log versions are commit numbers; got '$version'"))),
      None)

  /** SQL `TIMESTAMP AS OF <ts>` — Spark hands MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    snapshotTable(ident, None, Some(Math.floorDiv(timestamp, 1000L)))

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "graft-log tables manage their own layout (cluster via " +
        "OPTIMIZE/statsCol), PARTITIONED BY is not supported")
    require(!ident.name.contains('$'),
      "'$' names the metadata tables (t$changes/t$history/t$detail)")
    requireCreatable(ident.namespace.toSeq :+ ident.name)
    val dir = tableDir(ident)
    if (isTable(dir)) throw new TableAlreadyExistsException(ident)
    val props = properties.asScala
    val store = new LogStore(spark, dir,
      statsCol = props.get("statsCol"),
      checkpointInterval =
        props.get("checkpointInterval").map(_.toInt).getOrElse(10),
      bloomCol = props.get("bloomCol"),
      bloomBits = props.get("bloomBits").map(_.toInt).getOrElse(4096),
      statsCols = props.get("statsCols").toSeq
        .flatMap(_.split(',').toSeq).map(_.trim).filter(_.nonEmpty),
      dvDeletes = props.get("dvDeletes").exists(_.toBoolean),
      bloomCols = props.get("bloomCols").toSeq
        .flatMap(_.split(',').toSeq).map(_.trim).filter(_.nonEmpty))
    store.create(schema)
    loadTable(ident)
  }

  /** The safe DDL evolutions, every one a METADATA-ONLY commit:
    * `ADD COLUMN` (nullable, top-level, flat-writable —
    * [[graft.catalog.LogStore.addColumns]]), `RENAME COLUMN` and
    * `DROP COLUMN` via column mapping (the physical name stays, only
    * the logical view changes — [[graft.catalog.LogStore
    * .renameColumn]]/[[graft.catalog.LogStore.dropColumns]]; columns
    * carrying the skipping config refuse toward TBLPROPERTIES
    * first), `ALTER COLUMN TYPE` WIDENING (BYTE→SHORT→INT→LONG,
    * FLOAT→DOUBLE — [[graft.catalog.LogStore.widenColumn]]; old
    * segments up-cast at scan time), and SET/UNSET TBLPROPERTIES.
    * Everything else keeps the reasoned refusal: types never
    * narrow or cross families (coexisting-types corruption) — that
    * evolves by CTAS migration. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val dir = tableDir(ident)
    if (!isTable(dir)) throw new NoSuchTableException(ident)
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val sets = changes.collect { case s: TableChange.SetProperty => s }
    val unsets = changes.collect {
      case r: TableChange.RemoveProperty => r }
    val renames = changes.collect {
      case r: TableChange.RenameColumn => r }
    val drops = changes.collect {
      case d: TableChange.DeleteColumn => d }
    val retypes = changes.collect {
      case t: TableChange.UpdateColumnType => t }
    val conAdds = changes.collect {
      case c: TableChange.AddConstraint => c }
    val conDrops = changes.collect {
      case d: TableChange.DropConstraint => d }
    if (adds.size + sets.size + unsets.size + renames.size +
        drops.size + retypes.size + conAdds.size + conDrops.size !=
        changes.size)
      throw new UnsupportedOperationException(
        "graft-log ALTER TABLE supports ADD COLUMN (nullable), " +
          "RENAME COLUMN, DROP COLUMN, ALTER COLUMN TYPE (widening), " +
          "ADD/DROP CONSTRAINT ... CHECK " +
          "and SET/UNSET TBLPROPERTIES only — schemas otherwise " +
          "evolve by WRITING evolved rows (columns may be added by " +
          "any append; types only ever WIDEN, never mutate)")
    // ALTER TABLE … ADD CONSTRAINT name CHECK (expr): the native SQL
    // face of LogStore.addCheckConstraint — existing rows validated,
    // then every write gated. Only CHECK is enforceable here; a
    // PRIMARY KEY / UNIQUE / FOREIGN KEY this engine cannot enforce
    // must refuse rather than record a lie.
    conAdds.foreach { a =>
      a.constraint() match {
        case ck: org.apache.spark.sql.connector.catalog.constraints.Check =>
          require(ck.enforced(),
            "graft-log enforces every recorded CHECK constraint — " +
              "NOT ENFORCED is not supported")
          require(ck.predicateSql() != null,
            "ADD CONSTRAINT needs the CHECK expression as SQL")
          LogStore.configured(spark, dir)
            .addCheckConstraint(ck.name(), ck.predicateSql())
        case other => throw new UnsupportedOperationException(
          "graft-log enforces CHECK constraints only (PRIMARY KEY / " +
            s"UNIQUE / FOREIGN KEY are not enforceable): ${other.toDDL}")
      }
    }
    conDrops.foreach { d =>
      val store = LogStore.configured(spark, dir)
      if (store.checkConstraints().contains(d.name())) {
        store.dropCheckConstraint(d.name()): Unit
      } else if (!d.ifExists())
        throw new IllegalArgumentException(
          s"no CHECK constraint '${d.name()}' on ${ident.name}")
    }
    if (sets.nonEmpty || unsets.nonEmpty)
      LogStore.configured(spark, dir).setProperties(
        sets.map(s => s.property -> s.value).toMap,
        unsets.map(_.property).toSet)
    renames.foreach { r =>
      require(r.fieldNames.length == 1,
        "graft-log stores flat columns; nested RENAME COLUMN " +
          s"'${r.fieldNames.mkString(".")}' is not supported")
      LogStore.configured(spark, dir)
        .renameColumn(r.fieldNames()(0), r.newName())
    }
    if (drops.nonEmpty) {
      drops.foreach(d => require(d.fieldNames.length == 1,
        "graft-log stores flat columns; nested DROP COLUMN " +
          s"'${d.fieldNames.mkString(".")}' is not supported"))
      LogStore.configured(spark, dir)
        .dropColumns(drops.map(_.fieldNames()(0)).toSeq)
    }
    retypes.foreach { t =>
      require(t.fieldNames.length == 1,
        "graft-log stores flat columns; nested ALTER COLUMN " +
          s"'${t.fieldNames.mkString(".")}' is not supported")
      LogStore.configured(spark, dir)
        .widenColumn(t.fieldNames()(0), t.newDataType())
    }
    if (adds.isEmpty) return loadTable(ident)
    val fields = adds.map { a =>
      require(a.fieldNames.length == 1,
        "graft-log stores flat columns; nested ADD COLUMN " +
          s"'${a.fieldNames.mkString(".")}' is not supported")
      require(a.position() == null,
        "column positions are not supported (the log appends new " +
          "columns after the existing shape)")
      require(a.isNullable,
        s"added column '${a.fieldNames()(0)}' must be nullable — " +
          "existing rows have no value for it")
      require(a.defaultValue() == null,
        s"added column '${a.fieldNames()(0)}' may not carry a " +
          "DEFAULT: existing rows would read NULL from the same " +
          "absent-column storage new rows read the default from — " +
          "defaults are CREATE-time only in graft-log")
      require(LogParquetWrite.writable(a.dataType()),
        s"graft-log stores flat columns; '${a.fieldNames()(0)}' is " +
          s"${a.dataType()}")
      org.apache.spark.sql.types.StructField(a.fieldNames()(0),
        a.dataType(), nullable = true)
    }
    LogStore.configured(spark, dir)
      .addColumns(StructType(fields.toArray))
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val dir = tableDir(ident)
    if (!isTable(dir)) return false
    fs.delete(new Path(dir), true)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    requireCreatable(newIdent.namespace.toSeq :+ newIdent.name)
    val from = tableDir(oldIdent)
    val to = tableDir(newIdent)
    if (!isTable(from)) throw new NoSuchTableException(oldIdent)
    if (fs.exists(new Path(to)))
      throw new TableAlreadyExistsException(newIdent)
    fs.mkdirs(new Path(to).getParent)
    if (!fs.rename(new Path(from), new Path(to)))
      throw new java.io.IOException(s"rename $from -> $to failed")
  }

  // ---- stored procedures (SQL CALL): the maintenance commands ----
  // CALL graft.system.optimize/maintain/vacuum/checkpoint — see
  // [[GraftProcedure]]; `system` is a virtual namespace (no
  // directory), so procedure names can never collide with tables.

  private def procedureOf(name: String)
      : Option[org.apache.spark.sql.connector.catalog.procedures
        .UnboundProcedure] = name match {
    case "optimize" => Some(new OptimizeProcedure(this))
    case "maintain" => Some(new MaintainProcedure(this))
    case "vacuum" => Some(new VacuumProcedure(this))
    case "checkpoint" => Some(new CheckpointProcedure(this))
    case "add_check_constraint" =>
      Some(new AddConstraintProcedure(this))
    case "drop_check_constraint" =>
      Some(new DropConstraintProcedure(this))
    case _ => None
  }

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures
        .UnboundProcedure = {
    val inSystem = ident.namespace.isEmpty ||
      ident.namespace.sameElements(Array("system"))
    (if (inSystem) procedureOf(ident.name) else None).getOrElse(
      throw new RuntimeException(
        s"procedure ${ident.namespace.mkString(".")}.${ident.name} " +
          s"not found; $catalogName.system has: optimize, maintain, " +
          "vacuum, checkpoint, add_check_constraint, " +
          "drop_check_constraint"))
  }

  override def listProcedures(
      namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      Array("add_check_constraint", "checkpoint",
          "drop_check_constraint", "maintain", "optimize", "vacuum")
        .map(Identifier.of(Array("system"), _))
    else Array.empty

  // ---- namespaces (plain directories without a _log) ----

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(rootDir)
    if (!fs.exists(root)) return Array.empty
    fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(n => !isTable(s"$rootDir/$n") && n != "_log")
      .sorted
      .map(Array(_))
  }

  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Array.empty // single-level namespaces
  }

  /** True iff `namespace` could legally BE a namespace: no
    * engine-reserved part anywhere, and no strict prefix that is
    * itself a table. The CREATE/RENAME-only relaxation of the
    * reserved-prefix rule is for TABLES (a stuck table must stay
    * reachable for DROP/RENAME); namespace operations get no such
    * relaxation — `seg-*`/`cdc-*`/`dv-*`/`_*` directories are the
    * store's own data/staging dirs, and resolving one as a namespace
    * would let `DROP NAMESPACE ... CASCADE` delete a live segment out
    * of a table whose log still references it. Likewise any path
    * passing THROUGH a table root points at table internals, never at
    * a namespace. */
  private def legalNamespacePath(namespace: Array[String]): Boolean =
    !namespace.exists(reservedPart) &&
      (1 until namespace.length).forall(i =>
        !isTable(dirOf(namespace.take(i).toSeq)))

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || (legalNamespacePath(namespace) &&
      fs.exists(new Path(dirOf(namespace.toSeq))) &&
      !isTable(dirOf(namespace.toSeq)))

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    requireCreatable(namespace.toSeq)
    require(legalNamespacePath(namespace),
      s"namespace ${namespace.mkString(".")} resolves inside a table")
    val dir = dirOf(namespace.toSeq)
    if (fs.exists(new Path(dir)))
      throw new NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(new Path(dir))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft-log namespaces carry no metadata to alter")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val dir = dirOf(namespace.toSeq)
    if (!namespaceExists(namespace) || namespace.isEmpty) return false
    if (!cascade && fs.listStatus(new Path(dir)).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty")
    fs.delete(new Path(dir), true)
  }
}

/** A driver-computed metadata view as a DSv2 table ([[LocalScan]]):
  * the rows are small by nature (one per version / one per table), so
  * they materialize on the driver at scan time — never on the data
  * path. */
final class LogDriverTable(label: String,
    compute: () => org.apache.spark.sql.DataFrame)
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}

  private lazy val df = compute()

  override def name(): String = s"graft_log_$label"
  override def schema(): StructType = df.schema
  override def capabilities(): util.Set[TableCapability] =
    util.Collections.singleton(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = df.schema
        override def description(): String = name()
        override def rows()
            : Array[org.apache.spark.sql.catalyst.InternalRow] = {
          val enc = org.apache.spark.sql.catalyst.encoders
            .RowEncoder.encoderFor(df.schema)
          val ser = org.apache.spark.sql.catalyst.encoders
            .ExpressionEncoder(enc).createSerializer()
          df.collect().map(r => ser(r).copy())
        }
      }
    }
}
