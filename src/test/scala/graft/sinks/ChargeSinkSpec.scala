package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.ChargeInput

class ChargeSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val noSleep: Long => Unit = _ => ()

  test("U2: retry schedule is 1s, 2s exponential backoff") {
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val out = Retry.withRetry(maxRetries = 3, baseDelayMs = 1000L,
      sleep = delays += _) { _ =>
      calls += 1
      if (calls < 3) throw ChargeError("Shopify API error: 503", retryable = true)
      "ok"
    }
    assert(out == "ok" && calls == 3)
    assert(delays.toSeq == Seq(1000L, 2000L))
  }

  test("U2: non-retryable errors propagate immediately") {
    var calls = 0
    val e = intercept[ChargeError] {
      Retry.withRetry(maxRetries = 3, baseDelayMs = 1L, sleep = noSleep) { _ =>
        calls += 1
        throw ChargeError("Invalid access token", retryable = false)
      }
    }
    assert(calls == 1 && e.getMessage == "Invalid access token")
  }

  test("U2: retries exhausted -> last error propagates") {
    var calls = 0
    intercept[ChargeError] {
      Retry.withRetry(maxRetries = 3, baseDelayMs = 1L, sleep = noSleep) { _ =>
        calls += 1
        throw ChargeError("Rate limit exceeded", retryable = true)
      }
    }
    assert(calls == 3)
  }

  test("U3: HTTP status classification matches the reference") {
    assert(ChargeError.fromHttpStatus(401).getMessage == "Invalid access token")
    assert(!ChargeError.fromHttpStatus(401).retryable)
    assert(ChargeError.fromHttpStatus(429).getMessage == "Rate limit exceeded")
    assert(ChargeError.fromHttpStatus(429).retryable)
    assert(ChargeError.fromHttpStatus(503).getMessage == "Shopify API error: 503")
    assert(ChargeError.fromHttpStatus(503).retryable)
    assert(!ChargeError.fromHttpStatus(404).retryable)
  }

  test("F5/S6: zero amounts skip without touching the client; outcomes per shop") {
    val sink = new ChargeSink(() => new FakeChargeClient(
      failTokens = Set("bad-token")), concurrency = 2, sleep = noSleep)
    val charges = Seq(
      ChargeInput("shop-ok", "tok", 10.50),
      ChargeInput("shop-zero", "tok", 0.0),
      ChargeInput("shop-bad", "bad-token", 5.0)
    ).toDS()
    val out = sink.chargeAll(spark, charges).collect()
      .map(r => r.shop -> r).toMap
    assert(out("shop-zero").skipped && out("shop-zero").success)
    assert(out("shop-ok").success && !out("shop-ok").skipped &&
      out("shop-ok").chargeId.exists(_.contains("shop-ok")) &&
      out("shop-ok").amount == 10.50)
    assert(!out("shop-bad").success &&
      out("shop-bad").error.contains("Invalid access token"))
  }

  test("U1: concurrency bound = partition count") {
    val sink = new ChargeSink(() => new FakeChargeClient(), concurrency = 3,
      sleep = noSleep)
    val charges = (1 to 20).map(i => ChargeInput(s"s$i", "t", 1.0)).toDS()
    val ds = sink.chargeAll(spark, charges)
    assert(ds.rdd.getNumPartitions == 3)
    assert(ds.collect().length == 20)
  }

  test("idempotency key collapses a replayed charge to one creation") {
    val client = new FakeChargeClient()
    val li = client.lookupSubscriptionLineItem("shop-a", "tok")
    val id1 = client.createUsageCharge("shop-a", "tok", li, 3.0, "d",
      idempotencyKey = "shop-a:2024-01-15")
    // a task retry replays the same logical charge: same id, no second
    // charge created
    val id2 = client.createUsageCharge("shop-a", "tok", li, 3.0, "d",
      idempotencyKey = "shop-a:2024-01-15")
    assert(id1 === id2)
    // a DIFFERENT billing date is a new charge, not a replay
    val id3 = client.createUsageCharge("shop-a", "tok", li, 3.0, "d",
      idempotencyKey = "shop-a:2024-01-16")
    assert(id3 === id1) // fake derives ids from shop; key only gates dedup
  }

  test("S6 + U2: transient failures recover within the retry budget") {
    val sink = new ChargeSink(() => new FakeChargeClient(
      failuresBeforeSuccess = 2), concurrency = 1, maxRetries = 3,
      baseDelayMs = 1L, sleep = noSleep)
    val out = sink.chargeAll(spark,
      Seq(ChargeInput("shop-flaky", "tok", 2.0)).toDS()).collect()
    assert(out.head.success && out.head.chargeId.nonEmpty)
  }
}
