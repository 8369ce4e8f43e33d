package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete DataSource V2 read path: a deterministic synthetic table
  * `(id BIGINT, bucket INT, payload STRING)` with `id ∈ [0, rows)`,
  * `bucket = id % 16`, `payload = "row-" + id` — the engine's "another
  * source format" exercised at the connector API rather than through a
  * file format. What makes it worth having:
  *
  *  - **Filter pushdown** ([[SupportsPushDownFilters]]): range and
  *    equality predicates on `id` narrow the generated interval BEFORE
  *    any row exists — the source-side analogue of parquet row-group
  *    pruning. Pushed filters are visible in the scan description
  *    (`GraftSynth[lo,hi)`), which PlanAuditSpec asserts.
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): readers
  *    materialize only requested columns.
  *  - **Partition planning**: the interval splits into `parts`
  *    contiguous slices, each an independent [[InputPartition]] — the
  *    unit of executor parallelism.
  *  - **Complete aggregate pushdown** ([[SupportsPushDownAggregates]]):
  *    ungrouped COUNT(*)/COUNT(id)/MIN(id)/MAX(id) — composed with any
  *    pushed id-range filters — collapse to ONE closed-form row
  *    computed at the connector; Spark plans no aggregate at all
  *    (`supportCompletePushDown`). This is the connector contract that
  *    lets a warehouse answer `SELECT count(*) … WHERE id < k` from
  *    metadata instead of a scan — the same shape parquet footer
  *    counts and Delta stats serve at 100 TB. Anything not covered
  *    (group-bys, other columns) declines cleanly and runs post-scan.
  *
  * Usage: `spark.read.format("graft.sources.SyntheticProvider")
  * .option("rows", n).option("parts", p).load()`.
  */
class SyntheticProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("parts", "4").toInt)
}

object SyntheticSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("payload", StringType, nullable = false)))
}

final class SyntheticTable(rows: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synth($rows)"
  override def schema(): StructType = SyntheticSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, parts)
}

final class SyntheticScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required: StructType = SyntheticSource.schema
  private var aggFns: Seq[String] = Nil

  private def isId(
      e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case n: NamedReference => n.fieldNames.sameElements(Array("id"))
      case _ => false
    }

  /** COUNT(*), COUNT(id) (id is non-null, so ≡ COUNT(*)), MIN(id),
    * MAX(id), no grouping — else decline entirely (all-or-nothing, as
    * the API requires for complete pushdown). */
  private def translate(agg: Aggregation): Option[Seq[String]] =
    if (agg.groupByExpressions.nonEmpty) None
    else {
      val fns = agg.aggregateExpressions.toSeq.map {
        case _: CountStar => Some("count")
        case c: Count if !c.isDistinct && isId(c.column) => Some("count")
        case m: Min if isId(m.column) => Some("min")
        case m: Max if isId(m.column) => Some("max")
        case _ => None
      }
      if (fns.contains(None)) None else Some(fns.flatten)
    }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined

  override def pushAggregation(agg: Aggregation): Boolean =
    translate(agg) match {
      case Some(fns) => aggFns = fns; true
      case None => false
    }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1); true
      case LessThan("id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1); true
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    rejected // everything else stays a post-scan residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    if (aggFns.nonEmpty)
      new SyntheticAggScan(math.max(lo, 0L), math.max(hi, 0L), aggFns)
    else
      new SyntheticScan(math.max(lo, 0L), math.max(hi, 0L), parts, required)
}

/** Closed-form aggregate scan: the pushed COUNT/MIN/MAX over the
  * (filtered) id interval, emitted as a single row from a single
  * partition — no per-row generation at all. */
final class SyntheticAggScan(lo: Long, hi: Long, fns: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(fns.zipWithIndex.map {
    case (f, i) => StructField(s"agg_$i", LongType, nullable = f != "count")
  })
  override def description(): String =
    s"GraftSynthAgg[$lo,$hi)${fns.mkString("(", ",", ")")}"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    Array(SyntheticPartition(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticAggReaderFactory(fns)
}

final class SyntheticAggReaderFactory(fns: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SyntheticPartition]
    val n = math.max(p.end - p.start, 0L)
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val more = !emitted; emitted = true; more }
      override def get(): InternalRow = InternalRow.fromSeq(fns.map {
        case "count" => n
        case "min" => if (n == 0L) null else p.start
        case "max" => if (n == 0L) null else p.end - 1
      })
      override def close(): Unit = ()
    }
  }
}

final class SyntheticScan(lo: Long, hi: Long, parts: Int,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String = s"GraftSynth[$lo,$hi)"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(hi - lo, 0L)
    if (n == 0L) return Array.empty
    val k = math.max(1, math.min(parts.toLong, n)).toInt
    (0 until k).map { i =>
      val start = lo + n * i / k
      val end = lo + n * (i + 1) / k
      SyntheticPartition(start, end): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required)
}

final case class SyntheticPartition(start: Long, end: Long)
    extends InputPartition

final class SyntheticReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SyntheticPartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      override def get(): InternalRow = {
        val values = required.fields.map(_.name match {
          case "id" => cur.asInstanceOf[Any]
          case "bucket" => (cur % 16).toInt.asInstanceOf[Any]
          case "payload" =>
            UTF8String.fromString(s"row-$cur").asInstanceOf[Any]
          case _ => null
        })
        InternalRow.fromSeq(values.toSeq)
      }
      override def close(): Unit = ()
    }
  }
}
