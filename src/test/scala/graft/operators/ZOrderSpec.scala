package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference Morton interleave in plain Scala. */
  private def zRef(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, j) =>
      acc | (((a >> j) & 1L) << (2 * j)) | (((b >> j) & 1L) << (2 * j + 1))
    }

  test("zValue matches the reference interleave") {
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (63L, 63L),
      (123456L, 654321L), ((1L << 21) - 1, (1L << 21) - 1))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        LayoutOps.zValue(Seq(col("a"), col("b")), bits = 21).as("z"))
      .as[(Long, Long, Long)].collect().toSeq
    got.foreach { case (a, b, z) => assert(z === zRef(a, b, 21)) }
    // unit placements: a contributes even bit positions, b odd
    assert(got.find(r => r._1 == 1L && r._2 == 0L).get._3 === 1L)
    assert(got.find(r => r._1 == 0L && r._2 == 1L).get._3 === 2L)
  }

  test("zValue is monotone within a dimension-aligned box") {
    // all points of [0,8)x[0,8) come before any point with a>=8,b>=8
    val inBox = for (a <- 0L until 8L; b <- 0L until 8L) yield zRef(a, b, 21)
    assert(inBox.max < zRef(8L, 8L, 21))
    assert(inBox.toSet.size === 64 && inBox.max === 63L)
  }

  /** Rows the parquet scan actually read (after row-group pruning). */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f.metrics("numOutputRows").value
    }.get
  }

  test("Z-clustered layout prunes row groups for a 2-D box predicate " +
      "where a linear sort cannot") {
    val grid = spark.range(0L, 4096L)
      .select((col("id") % 64).as("x"), expr("id div 64").as("y"),
        col("id").as("payload"))
    val base = Files.createTempDirectory("zorder").toString
    // one 256-row row group per file in both layouts
    LayoutOps.clusterByZ(grid, Seq("x", "y"), numPartitions = 4)
      .write.option("maxRecordsPerFile", 256).mode("overwrite")
      .parquet(s"$base/zorder")
    grid.orderBy("x", "y")
      .write.option("maxRecordsPerFile", 256).mode("overwrite")
      .parquet(s"$base/linear")

    def boxed(path: String) = spark.read.parquet(path)
      .where(col("x") < 8 && col("y") < 8)
    val (zRows, linRows) =
      (scanRows(boxed(s"$base/zorder")), scanRows(boxed(s"$base/linear")))
    assert(boxed(s"$base/zorder").count() === 64L)
    assert(boxed(s"$base/linear").count() === 64L)
    // the 8x8 box is exactly z < 64 → one 256-row group suffices; the
    // x-sorted layout needs every group containing x<8 (512 rows: the
    // y predicate prunes nothing there)
    assert(zRows <= 256L,
      s"z-clustered scan should read one row group, read $zRows rows")
    assert(zRows < linRows,
      s"z-layout must out-prune linear sort: z=$zRows linear=$linRows")
  }
}
