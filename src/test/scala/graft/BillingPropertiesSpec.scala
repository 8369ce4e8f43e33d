package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.propBoolean
import org.scalacheck.Test.{check, Parameters}

import graft.operators.{BillingOps, SkewOps}

/** Property-based invariants (SURVEY §5.2) — scalacheck generators, each
  * property evaluated as a single Spark job over a generated column. */
class BillingPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(10)
  private def holds(p: Prop): Unit = {
    val r = check(params, p)
    assert(r.passed, r.status.toString)
  }

  test("X6: billing amount is non-negative and monotone in views") {
    holds(Prop.forAll(Gen.listOfN(40, Gen.chooseNum(0L, 5000000L))) { views =>
      views.isEmpty || {
        val amounts = views.toDF("v")
          .select($"v", BillingOps.chargeAmount($"v", 10.0).as("a"))
          .as[(Long, Double)].collect().toMap
        views.forall(v => amounts(v) >= 0.0) && {
          val sorted = views.sorted.map(amounts)
          sorted.zip(sorted.tail).forall { case (a, b) => a <= b }
        }
      }
    })
  }

  test("X6 decimal twin: equals exact BigDecimal HALF_UP money for any " +
      "views, and equals the double path on the 2-dp domain") {
    // rate = whole cents (2-dp money) up to $10^4, views up to 10^9:
    // amounts stay inside DECIMAL(12,2); the decimal path must
    // reproduce exact decimal arithmetic bit-for-bit
    val viewsGen = Gen.listOfN(40, Gen.chooseNum(0L, 1000000000L))
    val rateGen = Gen.chooseNum(0L, 1000000L).map(_ / 100.0)
    holds(Prop.forAll(viewsGen, rateGen) { (views, rate) =>
      views.isEmpty || {
        val got = views.toDF("v")
          .select($"v", BillingOps.chargeAmountDecimal($"v", rate)
            .cast("string").as("a"))
          .as[(Long, String)].collect().toMap
        views.forall { v =>
          val exact = (BigDecimal(v) * BigDecimal(rate.toString) /
            BigDecimal(1000000))
            .setScale(2, BigDecimal.RoundingMode.HALF_UP)
          BigDecimal(got(v)) == exact
        }
      }
    })
    // 2-dp domain: views a multiple of 10^6 makes the exact amount a
    // 2-dp value (rate is 2-dp), where double and decimal must agree —
    // divergence is only licensed at representation-error ties beyond
    // 2 decimals, which this domain excludes by construction
    val megaViews = Gen.listOfN(40, Gen.chooseNum(0L, 1000L)
      .map(_ * 1000000L))
    holds(Prop.forAll(megaViews, rateGen) { (views, rate) =>
      views.isEmpty || {
        val rows = views.toDF("v")
          .select(BillingOps.chargeAmount($"v", rate).as("d"),
            BillingOps.chargeAmountDecimal($"v", rate)
              .cast("double").as("dec"))
          .as[(Double, Double)].collect()
        rows.forall { case (d, dec) => d == dec }
      }
    })
  }

  test("J1: output cardinality equals active sessions, any event set") {
    val shopGen = Gen.listOfN(15, Gen.alphaLowerStr.suchThat(_.nonEmpty))
    holds(Prop.forAll(shopGen, shopGen) { (sessionShops, eventShops) =>
      (sessionShops.nonEmpty && eventShops.nonEmpty) ==> {
        val t0 = Timestamp.valueOf("2024-01-15 10:00:00")
        val sessions = BillingOps.activeSessions(
          sessionShops.distinct.map(s => (s, "tok", t0, t0))
            .toDF("shop", "accessToken", "createdAt", "updatedAt"))
        val events = eventShops.map(s => (s + ".myshopify.com", "page_viewed", t0))
          .toDF("shop", "name", "created_at")
        val pv = BillingOps.pageViewsForDate(events, "2024-01-15")
        val out = BillingOps.billingRecords(sessions, pv, "2024-01-15")
        out.count() == sessions.count()
      }
    })
  }

  test("A5: latest-wins view is exactly the last write per key") {
    val statusGen = Gen.listOfN(20,
      Gen.zip(Gen.oneOf("s1", "s2", "s3"), Gen.oneOf("pending", "success", "failed")))
    holds(Prop.forAll(statusGen) { writes =>
      writes.nonEmpty ==> {
        val d = java.sql.Date.valueOf("2024-01-15")
        // later writes get strictly increasing created_at
        val rows = writes.zipWithIndex.map { case ((shop, st), i) =>
          (shop, d, 1L, 0.0, 10.0, st,
            new Timestamp(1700000000000L + i * 1000L))
        }
        val df = rows.toDF("shop", "billing_date", "page_views",
          "billing_amount", "rate_per_million", "shopify_billing_status",
          "created_at")
        val got = BillingOps.latestUsageState(df)
          .select("shop", "shopify_billing_status")
          .as[(String, String)].collect().toMap
        val expected = writes.zipWithIndex
          .groupBy(_._1._1)
          .map { case (shop, ws) => shop -> ws.maxBy(_._2)._1._2 }
        got == expected
      }
    })
  }

  test("P2: normalization idempotent; round-trip stable for bare domains") {
    val shop = Gen.alphaLowerStr.suchThat(s => s.nonEmpty && !s.contains("."))
    holds(Prop.forAll(Gen.listOfN(30, shop)) { shops =>
      shops.isEmpty || {
        val out = shops.toDF("shop").select(
          BillingOps.normalizeShop(
            BillingOps.ensureShopSuffix($"shop")).as("rt"),
          BillingOps.normalizeShop(
            BillingOps.normalizeShop($"shop")).as("norm2"),
          BillingOps.normalizeShop($"shop").as("norm1"),
          $"shop").collect()
        out.forall(r => r.getString(0) == r.getString(3) &&
          r.getString(1) == r.getString(2))
      }
    })
  }

  test("skew: salted join and salted count equal their plain forms") {
    // hot key: 500 of 600 rows share key 1
    val left = ((1 to 500).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong + 1, i)))
      .toDF("k", "lv")
    val right = (1 to 50).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, "k").select("k", "lv", "rv")
      .as[(Long, Int, String)].collect().toSet
    val salted = SkewOps.saltedJoin(left, right, "k", 8)
      .select("k", "lv", "rv").as[(Long, Int, String)].collect().toSet
    assert(salted == plain)
    val plainCount = left.groupBy("k").count()
      .as[(Long, Long)].collect().toSet
    val saltedCount = SkewOps.saltedCount(left, "k", 8)
      .as[(Long, Long)].collect().toSet
    assert(saltedCount == plainCount)
  }
}
