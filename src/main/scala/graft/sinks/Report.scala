package graft.sinks

import graft.model.UsageChargeResult

/** S7: the batch-result report — collected summary rendered driver-side
  * (reference `/root/reference/src/services/slack.ts:29-303`). Transport
  * is pluggable; default renders canonical JSON to stdout. Report errors
  * never fail the batch (the reference swallows its own Slack errors,
  * `slack.ts:299-302`).
  *
  * Per-shop error context: the reference carries a store-write error and
  * a charge error on every shop row (`slack.ts:230-237`,
  * `bigQueryError`/`shopifyError`) — here `storeError`/`chargeError`. */
final case class ShopReportRow(shop: String, pageViews: Long,
    billingAmount: Double, status: String,
    storeError: Option[String] = None,
    chargeError: Option[String] = None)

/** Failure context attached to a failed batch (reference
  * `billing.ts:226-231`): message + ISO timestamp + stack trace. */
final case class ErrorDetails(message: String, timestamp: String,
    stack: Option[String])

final case class BatchReport(
    success: Boolean,
    targetDate: String,
    scheduled: Boolean,
    sessionCount: Long,
    recordCount: Long,
    totalPageViews: Long,
    totalBillingAmount: Double,
    successful: Long,
    failed: Long,
    skipped: Long,
    topShops: Seq[ShopReportRow],
    remainderShops: Long,
    error: Option[String],
    errorDetails: Option[ErrorDetails] = None) {

  /** Canonical JSON (stable field order, 2-dp money — X10). */
  def toJson: String = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    def opt(o: Option[String]) = o.map(q).getOrElse("null")
    val shops = topShops.map(r =>
      s"""{"shop":${q(r.shop)},"pageViews":${r.pageViews},""" +
      s""""billingAmount":${f"${r.billingAmount}%.2f"},"status":${q(r.status)},""" +
      s""""storeError":${opt(r.storeError)},"chargeError":${opt(r.chargeError)}}""")
      .mkString("[", ",", "]")
    // stack truncation at render time mirrors slack.ts:191
    val errDetails = errorDetails.map(d =>
      s"""{"message":${q(d.message)},"timestamp":${q(d.timestamp)},""" +
      s""""stack":${opt(d.stack.map(ReportOps.truncateError(_)))}}""")
      .getOrElse("null")
    s"""{"success":$success,"targetDate":${q(targetDate)},""" +
    s""""scheduled":$scheduled,"sessionCount":$sessionCount,""" +
    s""""recordCount":$recordCount,"totalPageViews":$totalPageViews,""" +
    s""""totalBillingAmount":${f"$totalBillingAmount%.2f"},""" +
    s""""successful":$successful,"failed":$failed,"skipped":$skipped,""" +
    s""""topShops":$shops,"remainderShops":$remainderShops,""" +
    s""""error":${opt(error)},"errorDetails":$errDetails}"""
  }
}

trait ReportSink { def send(report: BatchReport): Unit }

final class StdoutReportSink extends ReportSink {
  override def send(report: BatchReport): Unit =
    try println(report.toJson)
    catch { case _: Throwable => () } // report failure never fails the batch
}

final class CollectingReportSink extends ReportSink {
  val reports = scala.collection.mutable.ArrayBuffer.empty[BatchReport]
  override def send(report: BatchReport): Unit = reports += report
}

object ReportOps {
  /** Status → human label decode (X12, reference `slack.ts:305-313`). */
  def statusLabel(status: String): String = status match {
    case "success" => "Charged"
    case "failed" => "Charge failed"
    case "skipped" => "Skipped (no usage)"
    case "pending" => "Pending"
    case other => other
  }

  /** Stack-trace truncation for error context (X11, `slack.ts:191`). */
  def truncateError(s: String, max: Int = 1000): String =
    if (s == null) "" else s.substring(0, math.min(s.length, max))

  def histogram(results: Seq[UsageChargeResult]): (Long, Long, Long) = (
    results.count(r => r.success && !r.skipped).toLong,
    results.count(r => !r.success).toLong,
    results.count(_.skipped).toLong)
}
