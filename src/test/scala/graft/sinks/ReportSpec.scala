package graft.sinks

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.StreamingOps

class ReportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("S7: canonical report JSON is byte-stable (golden)") {
    val report = BatchReport(success = true, targetDate = "2024-01-15",
      scheduled = true, sessionCount = 3, recordCount = 3,
      totalPageViews = 1234, totalBillingAmount = 12.345,
      successful = 2, failed = 0, skipped = 1,
      topShops = Seq(
        ShopReportRow("shop-a", 1000, 10.0, "success"),
        ShopReportRow("shop\"b", 234, 2.345, "success")),
      remainderShops = 0, error = None)
    val golden =
      """{"success":true,"targetDate":"2024-01-15","scheduled":true,""" +
      """"sessionCount":3,"recordCount":3,"totalPageViews":1234,""" +
      """"totalBillingAmount":12.35,"successful":2,"failed":0,"skipped":1,""" +
      """"topShops":[{"shop":"shop-a","pageViews":1000,"billingAmount":10.00,"status":"success","storeError":null,"chargeError":null},""" +
      """{"shop":"shop\"b","pageViews":234,"billingAmount":2.35,"status":"success","storeError":null,"chargeError":null}],""" +
      """"remainderShops":0,"error":null,"errorDetails":null}"""
    assert(report.toJson == golden)
  }

  test("S7: failed-batch JSON carries per-shop errors + errorDetails") {
    val report = BatchReport(success = false, targetDate = "2024-01-15",
      scheduled = true, sessionCount = 0, recordCount = 0,
      totalPageViews = 0, totalBillingAmount = 0.0,
      successful = 0, failed = 0, skipped = 0,
      topShops = Seq(ShopReportRow("shop-a", 10, 0.1, "skipped",
        storeError = Some("boom"),
        chargeError = Some("Process failed before charge sink"))),
      remainderShops = 0, error = Some("Process failed: boom"),
      errorDetails = Some(ErrorDetails("boom", "2024-01-16T01:00:00Z",
        Some("x" * 2000))))
    val json = report.toJson
    assert(json.contains(
      """"storeError":"boom","chargeError":"Process failed before charge sink""""))
    assert(json.contains(
      """"errorDetails":{"message":"boom","timestamp":"2024-01-16T01:00:00Z","stack":""""))
    // stack truncates at render (slack.ts:191): 1000 chars, not 2000
    assert(json.contains("\"stack\":\"" + "x" * 1000 + "\""))
    assert(!json.contains("x" * 1001))
  }

  test("X11/X12: error truncation and status labels") {
    assert(ReportOps.truncateError("x" * 2000).length == 1000)
    assert(ReportOps.truncateError(null) == "")
    assert(ReportOps.statusLabel("success") == "Charged")
    assert(ReportOps.statusLabel("skipped") == "Skipped (no usage)")
    assert(ReportOps.statusLabel("weird") == "weird")
  }

  test("streaming daily page views == batch pageViewsForDate") {
    val dir = Files.createTempDirectory("graft-spv").toString + "/ev"
    val rows = Seq(
      ("shop-a.myshopify.com", "page_viewed", Timestamp.valueOf("2024-01-15 10:00:00")),
      ("shop-a.myshopify.com", "page_viewed", Timestamp.valueOf("2024-01-15 12:00:00")),
      ("shop-b.myshopify.com", "page_viewed", Timestamp.valueOf("2024-01-15 13:00:00")),
      ("shop-b.myshopify.com", "clicked", Timestamp.valueOf("2024-01-15 13:30:00")),
      ("shop-c.myshopify.com", "page_viewed", Timestamp.valueOf("2024-01-16 01:00:00"))
    ).toDF("shop", "name", "created_at")
    rows.write.parquet(dir)

    val schema = StructType(Seq(StructField("shop", StringType),
      StructField("name", StringType),
      StructField("created_at", TimestampType)))
    val streamed = StreamingOps.runToMemory(spark,
      StreamingOps.streamingDailyPageViews(spark, dir, schema), "spv_out")
      .where($"day" === Timestamp.valueOf("2024-01-15 00:00:00"))
      .select("shop", "event_count").as[(String, Long)].collect().toSet

    val batch = graft.operators.BillingOps
      .pageViewsForDate(rows, "2024-01-15")
      .as[(String, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch == Set(("shop-a", 2L), ("shop-b", 1L)))
  }

  test("stateful streaming: per-shop totals accumulate across micro-batches") {
    val dir = Files.createTempDirectory("graft-state").toString + "/ev"
    val schema = StructType(Seq(StructField("shop", StringType),
      StructField("name", StringType),
      StructField("created_at", TimestampType)))
    def batch(rows: (String, String, String)*) =
      rows.map { case (s, n, t) => (s, n, Timestamp.valueOf(t)) }
        .toDF("shop", "name", "created_at")

    batch(("shop-a.myshopify.com", "page_viewed", "2024-01-15 10:00:00"),
      ("shop-b.myshopify.com", "page_viewed", "2024-01-15 10:01:00"))
      .write.mode("append").parquet(dir)

    val q = StreamingOps.statefulRunningCounts(spark, dir, schema)
      .toDF().writeStream.outputMode("update").format("memory")
      .queryName("state_out").start()
    q.processAllAvailable()
    // second micro-batch: shop-a views again -> cumulative total 2
    batch(("shop-a.myshopify.com", "page_viewed", "2024-01-15 11:00:00"))
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("state_out").as[(String, Long)].collect().toSet
    assert(rows.contains(("shop-a", 1L)) && rows.contains(("shop-a", 2L)),
      s"expected cumulative updates, got $rows")
    assert(rows.contains(("shop-b", 1L)))
  }
}
