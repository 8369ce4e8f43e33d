package graft.driver

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.AppendStore
import graft.model._
import graft.operators.BillingOps
import graft.sinks._

/** End-to-end orchestration of the daily billing batch — the Spark
  * re-expression of the reference's `BillingService`
  * (`/root/reference/src/services/billing.ts:26-240,282-326`).
  *
  * The whole relational middle (scan → filter → agg → join → derive) is
  * ONE lazy plan; actions happen only at the explicitly-ordered effect
  * points, preserving the reference's write-ahead invariant:
  *
  *   1. guard: zero sessions → skipped result, nothing written
  *   2. append PENDING records (write-ahead intent log) — a failure here
  *      aborts BEFORE any external charge (`billing.ts:120-121`)
  *   3. external charge sink (bounded concurrency, retried)
  *   4. append FINAL records — append-only, never UPDATE
  *      (`billing.ts:161-163`); current state = latest-record-wins view
  *   5. totals + report
  */
final class BillingJob(
    spark: SparkSession,
    usageStore: AppendStore,
    chargeSink: ChargeSink,
    reportSink: ReportSink = new StdoutReportSink,
    cfg: BillingConfig = BillingConfig()) {

  import spark.implicits._

  /** §3.1: the production daily run. */
  def processDailyBilling(rawSessions: DataFrame, rawEvents: DataFrame,
      targetDate: String, scheduled: Boolean = false): BatchReport = {
    try {
      val sessions = BillingOps.activeSessions(rawSessions).cache()
      val sessionCount = sessions.count()
      if (sessionCount == 0) { // early-exit guard (billing.ts:56-69)
        val report = emptyReport(targetDate, scheduled,
          error = Some("No active sessions found"))
        reportSink.send(report)
        return report
      }

      val pageViews = BillingOps.pageViewsForDate(rawEvents, targetDate)
      val records =
        BillingOps.billingRecords(sessions, pageViews, targetDate, cfg)
      val pending = BillingOps.withPendingStatus(records).cache()

      // 2. write-ahead: pending rows land before any charge is attempted
      usageStore.append(pending)

      // 3. charge — J2 folded in: (shop, accessToken, amount) travel
      // together so the sink needs no map probe
      val chargeInputs = pending
        .join(sessions.select(BillingOps.normalizeShop($"shop").as("shop"),
          $"accessToken"), Seq("shop"))
        .select($"shop", $"accessToken", $"billing_amount".as("amount"))
        .as[ChargeInput]
      val results = chargeSink.chargeAll(spark, chargeInputs).cache()

      // 4. append final statuses (J3 enrich; append-only)
      val enriched =
        BillingOps.enrichWithChargeResults(pending, results.toDF())
      usageStore.append(enriched)

      // 5. totals + report (A2/A3/A4, L2)
      val report = buildReport(targetDate, scheduled, sessionCount,
        enriched, results.collect().toSeq)
      reportSink.send(report)
      sessions.unpersist(); pending.unpersist(); results.unpersist()
      report
    } catch {
      case e: Throwable =>
        val report = emptyReport(targetDate, scheduled,
          error = Some(ReportOps.truncateError(
            Option(e.getMessage).getOrElse(e.getClass.getName))))
        reportSink.send(report)
        report
    }
  }

  /** §3.2: the dry run — same read/join/aggregate plan, no writes, no
    * charges (reference `billing.ts:282-326`). Returns the billing
    * records frame; this is the oracle-comparison surface. */
  def testBillingForDate(rawSessions: DataFrame, rawEvents: DataFrame,
      targetDate: String): DataFrame = {
    val sessions = BillingOps.activeSessions(rawSessions)
    val pageViews = BillingOps.pageViewsForDate(rawEvents, targetDate)
    BillingOps.billingRecords(sessions, pageViews, targetDate, cfg)
  }

  private def buildReport(targetDate: String, scheduled: Boolean,
      sessionCount: Long, enriched: DataFrame,
      results: Seq[UsageChargeResult]): BatchReport = {
    val t = BillingOps.totals(enriched).head()
    val (ok, ko, skip) = ReportOps.histogram(results)
    val active = enriched.where($"page_views" > 0)
    val activeCount = active.count()
    val top = BillingOps.topShops(enriched, 10)
      .select($"shop", $"page_views", $"billing_amount",
        $"shopify_billing_status")
      .collect().toSeq.map(r => ShopReportRow(r.getString(0), r.getLong(1),
        r.getDouble(2), r.getString(3)))
    BatchReport(success = ko == 0, targetDate, scheduled, sessionCount,
      recordCount = t.getLong(0),
      totalPageViews = if (t.isNullAt(1)) 0L else t.getLong(1),
      totalBillingAmount = if (t.isNullAt(2)) 0.0 else t.getDouble(2),
      successful = ok, failed = ko, skipped = skip,
      topShops = top, remainderShops = math.max(0L, activeCount - 10),
      error = None)
  }

  private def emptyReport(targetDate: String, scheduled: Boolean,
      error: Option[String]): BatchReport =
    BatchReport(success = false, targetDate, scheduled, 0, 0, 0, 0.0,
      0, 0, 0, Nil, 0, error)
}
