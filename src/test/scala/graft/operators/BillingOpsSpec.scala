package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.BillingConfig

class BillingOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def rawSessions = Seq(
    ("shop-a", "tok-a", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
    ("shop-b", "tok-b", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
    ("shop-null", null, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
    ("shop-empty", "", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
    (null, "tok-x", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")),
    ("", "tok-y", ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
  ).toDF("shop", "accessToken", "createdAt", "updatedAt")

  private def rawEvents = Seq(
    // suffixed shop form, target date
    ("shop-a.myshopify.com", "page_viewed", ts("2024-01-15 10:00:00")),
    ("shop-a.myshopify.com", "page_viewed", ts("2024-01-15 23:59:59")),
    ("shop-a.myshopify.com", "other_event", ts("2024-01-15 10:00:00")),
    ("shop-a.myshopify.com", "page_viewed", ts("2024-01-16 00:00:00")), // next day
    ("shop-b.myshopify.com", "page_viewed", ts("2024-01-14 23:59:59")), // prev day
    (null, "page_viewed", ts("2024-01-15 10:00:00")),
    ("", "page_viewed", ts("2024-01-15 10:00:00"))
  ).toDF("shop", "name", "created_at")

  test("S1/F1: activeSessions filters null/empty credentials, renames, derives session_id") {
    val out = BillingOps.activeSessions(rawSessions)
    assert(out.columns.toSet ==
      Set("shop", "accessToken", "created_at", "updated_at", "session_id"))
    val rows = out.select("shop", "session_id").as[(String, String)].collect().toSet
    assert(rows == Set(("shop-a", "shop-a"), ("shop-b", "shop-b")))
  }

  test("P2/X9: shop normalization round-trip and idempotence") {
    val df = Seq("a.myshopify.com", "a").toDF("shop")
    val out = df.select(
      BillingOps.normalizeShop($"shop").as("norm"),
      BillingOps.normalizeShop(BillingOps.normalizeShop($"shop")).as("norm2"),
      BillingOps.ensureShopSuffix(BillingOps.ensureShopSuffix($"shop")).as("full2"),
      BillingOps.ensureShopSuffix($"shop").as("full")).collect()
    out.foreach { r =>
      assert(r.getString(0) == r.getString(1), "normalize must be idempotent")
      assert(r.getString(2) == r.getString(3), "ensureSuffix must be idempotent")
      assert(r.getString(3).endsWith(".myshopify.com"))
    }
    // degenerate doubled suffix strips exactly ONE layer — same as the
    // reference's anchored REGEXP_REPLACE (bigquery.ts:44)
    val doubled = Seq("x.myshopify.com.myshopify.com").toDF("shop")
      .select(BillingOps.normalizeShop($"shop")).as[String].head()
    assert(doubled == "x.myshopify.com")
    // round-trip: norm(full(bare)) == bare
    val rt = Seq("bare-shop").toDF("shop")
      .select(BillingOps.normalizeShop(BillingOps.ensureShopSuffix($"shop")))
      .as[String].head()
    assert(rt == "bare-shop")
  }

  test("S2/F2/A1: pageViewsForDate filters name+date+shop, strips suffix, counts") {
    val out = BillingOps.pageViewsForDate(rawEvents, "2024-01-15")
      .as[(String, Long)].collect().toMap
    assert(out == Map("shop-a" -> 2L)) // only the two page_viewed on the date
  }

  test("X6: charge rounding table from the reference fixtures") {
    // views -> expected amount at $10/1M (FIXTURES.md 1.4)
    val cases = Seq(0L -> 0.0, 1L -> 0.0, 499999L -> 5.0, 500000L -> 5.0,
      1000000L -> 10.0, 1234567L -> 12.35)
    val got = cases.map(_._1).toDF("views")
      .select($"views", BillingOps.chargeAmount($"views", 10.0).as("amt"))
      .as[(Long, Double)].collect().toMap
    cases.foreach { case (v, expected) => assert(got(v) == expected,
      s"views=$v expected $expected got ${got(v)}") }
  }

  test("J1: billingRecords keeps every session; missing shops get 0 views") {
    val sessions = BillingOps.activeSessions(rawSessions)
    val pv = BillingOps.pageViewsForDate(rawEvents, "2024-01-15")
    val out = BillingOps.billingRecords(sessions, pv, "2024-01-15")
    assert(out.count() == sessions.count(), "J1 invariant |out| == |sessions|")
    val byShop = out.select("shop", "page_views")
      .as[(String, Long)].collect().toMap
    assert(byShop == Map("shop-a" -> 2L, "shop-b" -> 0L))
  }

  test("A5: latestUsageState picks the newest record per (shop, billing_date)") {
    val d = java.sql.Date.valueOf("2024-01-15")
    val records = Seq(
      ("shop-a", d, 10L, 0.0, 10.0, "pending", ts("2024-01-16 01:00:00")),
      ("shop-a", d, 10L, 0.0, 10.0, "success", ts("2024-01-16 02:00:00")),
      ("shop-b", d, 5L, 0.0, 10.0, "pending", ts("2024-01-16 01:00:00"))
    ).toDF("shop", "billing_date", "page_views", "billing_amount",
      "rate_per_million", "shopify_billing_status", "created_at")
    val out = BillingOps.latestUsageState(records)
      .select("shop", "shopify_billing_status").as[(String, String)]
      .collect().toMap
    assert(out == Map("shop-a" -> "success", "shop-b" -> "pending"))
  }

  test("A5: equal created_at ties break toward the non-pending record") {
    val d = java.sql.Date.valueOf("2024-01-15")
    val t = ts("2024-01-16 01:00:00")
    val records = Seq(
      ("shop-a", d, 10L, 0.0, 10.0, "pending", t),
      ("shop-a", d, 10L, 0.0, 10.0, "failed", t)
    ).toDF("shop", "billing_date", "page_views", "billing_amount",
      "rate_per_million", "shopify_billing_status", "created_at")
    val out = BillingOps.latestUsageState(records)
      .select("shopify_billing_status").as[String].collect()
    assert(out.toSeq == Seq("failed"))
  }

  test("A5: equal created_at ties use the TOTAL lifecycle order") {
    val d = java.sql.Date.valueOf("2024-01-15")
    val t = ts("2024-01-16 01:00:00")
    // success > skipped > failed > pending at the same timestamp —
    // every pair of statuses resolves the same way on re-read
    val records = Seq(
      ("shop-a", d, 10L, 0.0, 10.0, "failed", t),
      ("shop-a", d, 10L, 0.0, 10.0, "success", t),
      ("shop-b", d, 10L, 0.0, 10.0, "skipped", t),
      ("shop-b", d, 10L, 0.0, 10.0, "failed", t)
    ).toDF("shop", "billing_date", "page_views", "billing_amount",
      "rate_per_million", "shopify_billing_status", "created_at")
    val out = BillingOps.latestUsageState(records)
      .select("shop", "shopify_billing_status").as[(String, String)]
      .collect().toMap
    assert(out == Map("shop-a" -> "success", "shop-b" -> "skipped"))
  }

  test("F5: splitBySkip routes zero amounts to skipped") {
    val df = Seq(("a", 0.0), ("b", 1.5), ("c", -1.0)).toDF("shop", "billing_amount")
    val out = BillingOps.splitBySkip(df).select("shop", "charge_route")
      .as[(String, String)].collect().toMap
    assert(out == Map("a" -> "skipped", "b" -> "charge", "c" -> "skipped"))
  }

  test("A2/A4: totals and status histogram") {
    val df = Seq(
      ("a", 100L, 1.0, "success"), ("b", 0L, 0.0, "skipped"),
      ("c", 50L, 0.5, "failed"), ("d", 10L, 0.1, "success")
    ).toDF("shop", "page_views", "billing_amount", "shopify_billing_status")
    val t = BillingOps.totals(df).head()
    assert(t.getLong(0) == 4 && t.getLong(1) == 160L && t.getDouble(2) == 1.6)
    val h = BillingOps.statusHistogram(df).head()
    assert((h.getLong(0), h.getLong(1), h.getLong(2)) == ((2L, 1L, 1L)))
  }

  test("L2: topShops orders by amount desc with shop tiebreak, excludes zero activity") {
    val df = Seq(
      ("a", 5L, 2.0), ("b", 3L, 3.0), ("c", 0L, 0.0), ("d", 9L, 2.0)
    ).toDF("shop", "page_views", "billing_amount")
    val out = BillingOps.topShops(df, 2).select("shop").as[String].collect()
    assert(out.toSeq == Seq("b", "a"))
  }

  test("X5: JST business date from UTC instants") {
    // 2024-01-15 14:00 UTC = 2024-01-15 23:00 JST -> yesterday = 01-14
    assert(BillingOps.jstYesterday(
      ts("2024-01-15 14:00:00").getTime) == "2024-01-14")
    // 2024-01-15 15:30 UTC = 2024-01-16 00:30 JST -> yesterday = 01-15
    assert(BillingOps.jstYesterday(
      ts("2024-01-15 15:30:00").getTime) == "2024-01-15")
  }

  test("X8: UTC-today dry-run default, and its divergence from X5") {
    // plain UTC calendar date
    assert(BillingOps.utcToday(
      ts("2024-01-15 14:00:00").getTime) == "2024-01-15")
    // boundary: one instant before/after the JST midnight at 15:00 UTC.
    // Before it the two clocks DISAGREE (dry run would bill one day
    // later than production); after it they coincide.
    val before = ts("2024-01-15 14:59:59").getTime
    assert(BillingOps.utcToday(before) == "2024-01-15")
    assert(BillingOps.jstYesterday(before) == "2024-01-14")
    val after = ts("2024-01-15 15:00:00").getTime
    assert(BillingOps.utcToday(after) == "2024-01-15")
    assert(BillingOps.jstYesterday(after) == "2024-01-15")
    // UTC midnight: utcToday rolls, jstYesterday keeps the JST calendar
    val utcMidnight = ts("2024-01-16 00:00:00").getTime
    assert(BillingOps.utcToday(utcMidnight) == "2024-01-16")
    assert(BillingOps.jstYesterday(utcMidnight) == "2024-01-15")
  }
}
