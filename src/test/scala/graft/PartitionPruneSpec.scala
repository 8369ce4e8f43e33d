package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Directory-level partition pruning evidence: a hive-partitioned
  * layout must reduce a partition-key equality filter to ONE selected
  * directory at the file index — before any parquet footer is read.
  * This is the layout half of the daily-slice story (the other half,
  * row-group-stats pushdown on the raw timestamp, is pinned by
  * EventTimestampSpec). */
class PartitionPruneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("partition-key filter selects exactly one directory") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_prune").toString
    (0 until 1000)
      .map(i => (i.toLong, s"2024-01-${10 + i % 5}", i * 1.5))
      .toDF("id", "event_date", "v")
      .write.mode("overwrite").partitionBy("event_date").parquet(path)

    val filtered = spark.read.parquet(path)
      .where(col("event_date") === "2024-01-12")
    assert(filtered.count() === 200)

    val scans = filtered.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "expected a FileSourceScanExec")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      "the event_date predicate must become a partition filter, " +
        s"not a data filter:\n${scan.metadata}")
    assert(scan.selectedPartitions.partitionCount === 1,
      s"5 date dirs on disk, filter names one — expected 1 selected " +
        s"partition, got ${scan.selectedPartitions.partitionCount}")
  }
}
