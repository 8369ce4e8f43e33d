package graft.model

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.types._

/** Canonical data model of the engine — the reference's record types
  * re-expressed as Scala case classes usable as `Dataset[T]` element types.
  *
  * Reference: `/root/reference/src/types/billing.ts:1-41` (record shapes) and
  * the table DDL at `/root/reference/src/services/bigquery.ts:114-127`.
  *
  * Money stays `Double` for hash-compatibility with the reference
  * (`src/types/billing.ts:18-19` keeps amounts as JS numbers); a
  * `DecimalType(12,2)` view can be layered on top where exactness matters.
  */
final case class ShopifySession(
    session_id: String,
    shop: String,
    accessToken: String,
    created_at: Timestamp,
    updated_at: Timestamp)

/** Output row of the daily page-view aggregation (A1). */
final case class PageViewEvent(shop: String, event_count: Long)

/** The billing fact row (append-only audit-log semantics — duplicate
  * `(shop, billing_date)` keys are BY DESIGN; reads of current state go
  * through the latest-record-wins view, SURVEY §2.4 A5). */
final case class BillingRecord(
    shop: String,
    billing_date: Date,
    page_views: Long,
    billing_amount: Double,
    rate_per_million: Double,
    shopify_charge_id: Option[String],
    shopify_billing_status: String,
    shopify_error_message: Option[String],
    shopify_processed_at: Option[Timestamp],
    created_at: Option[Timestamp])

/** Engine configuration (reference: `src/services/billing.ts:19-23`). */
final case class BillingConfig(
    ratePerMillion: Double = 10.0,
    timezone: String = "Asia/Tokyo",
    billingTime: String = "01:00")

/** Per-shop outcome of the external charge sink
  * (reference: `src/services/shopifyBilling.ts:5-11`). */
final case class UsageChargeResult(
    shop: String,
    success: Boolean,
    chargeId: Option[String],
    error: Option[String],
    amount: Double,
    skipped: Boolean)

/** Input row consumed by the charge executor: one fully-resolved charge,
  * J2 pre-folded into the row (SURVEY §2.3 J2 — the hash-map probe in the
  * reference disappears once `(shop, accessToken, amount)` travel together).
  * `idempotencyKey` (typically `shop:billing_date`) rides along so the
  * remote API can dedup if a Spark task retry replays a partition that
  * already charged some shops — eager driver-side materialization protects
  * against plan re-execution, but not against retries WITHIN the one
  * materializing action. */
final case class ChargeInput(shop: String, accessToken: String,
    amount: Double, idempotencyKey: String = "")

object Status {
  val Pending = "pending"
  val Success = "success"
  val Failed = "failed"
  val Skipped = "skipped"
}

object Schemas {

  /** Canonical `usage_records` schema (reference DDL
    * `src/services/bigquery.ts:114-127`): five REQUIRED core fields, four
    * NULLABLE `shopify_*` evolution fields, REQUIRED `created_at` stamp. */
  val usageRecords: StructType = StructType(Seq(
    StructField("shop", StringType, nullable = false),
    StructField("billing_date", DateType, nullable = false),
    StructField("page_views", LongType, nullable = false),
    StructField("billing_amount", DoubleType, nullable = false),
    StructField("rate_per_million", DoubleType, nullable = false),
    StructField("shopify_charge_id", StringType, nullable = true),
    StructField("shopify_billing_status", StringType, nullable = true),
    StructField("shopify_error_message", StringType, nullable = true),
    StructField("shopify_processed_at", TimestampType, nullable = true),
    StructField("created_at", TimestampType, nullable = false)
  ))

  /** Raw sessions table as stored (physical names `createdAt`/`updatedAt`
    * drift from the logical snake_case — renamed at scan time, S1/P1;
    * reference `src/services/bigquery.ts:21-31`). */
  val rawSessions: StructType = StructType(Seq(
    StructField("shop", StringType, nullable = true),
    StructField("accessToken", StringType, nullable = true),
    StructField("createdAt", TimestampType, nullable = true),
    StructField("updatedAt", TimestampType, nullable = true)
  ))

  /** Raw event-log table (reference `src/services/bigquery.ts:41-56`). */
  val rawEvents: StructType = StructType(Seq(
    StructField("shop", StringType, nullable = true),
    StructField("name", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false)
  ))
}
