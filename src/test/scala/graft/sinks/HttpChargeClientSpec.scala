package graft.sinks

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.model.ChargeInput

/** [[HttpChargeClient]] against an in-process HTTP stub — the full
  * socket path (request shaping, headers, status classification,
  * GraphQL parsing, retry integration) with zero network egress. */
class HttpChargeClientSpec extends AnyFunSuite with BeforeAndAfterAll {

  // ---- stub server ----------------------------------------------------
  private var server: HttpServer = _
  private var port: Int = _
  // per-test programmable behavior
  @volatile private var failStatus: Option[Int] = None
  @volatile private var failuresBeforeSuccess: Int = 0
  @volatile private var userError: Option[String] = None
  @volatile private var sleepMs: Long = 0L
  private val hits = new AtomicInteger(0)
  @volatile private var lastBody: String = ""
  @volatile private var lastToken: String = ""
  @volatile private var lastIdemKey: String = ""
  @volatile private var lastContentType: String = ""

  private def reset(): Unit = {
    failStatus = None; failuresBeforeSuccess = 0; userError = None
    sleepMs = 0L; hits.set(0); lastBody = ""; lastToken = ""
    lastIdemKey = ""; lastContentType = ""
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    port = server.getAddress.getPort
    server.createContext("/", { ex =>
      val n = hits.incrementAndGet()
      lastBody = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      lastToken = Option(ex.getRequestHeaders
        .getFirst("X-Shopify-Access-Token")).getOrElse("")
      lastIdemKey = Option(ex.getRequestHeaders
        .getFirst("Idempotency-Key")).getOrElse("")
      lastContentType = Option(ex.getRequestHeaders
        .getFirst("Content-Type")).getOrElse("")
      if (sleepMs > 0) Thread.sleep(sleepMs)
      (failStatus, n <= failuresBeforeSuccess) match {
        case (Some(s), _) => respond(ex, s, s"""{"errors":"status $s"}""")
        case (None, true) => respond(ex, 503, """{"errors":"down"}""")
        case _ =>
          if (lastBody.contains("currentAppInstallation"))
            respond(ex, 200,
              """{"data":{"currentAppInstallation":{"activeSubscriptions":[
                |{"lineItems":[
                |  {"id":"gid://s/Li/recurring","plan":{"pricingDetails":{"__typename":"AppRecurringPricing"}}},
                |  {"id":"gid://s/Li/usage","plan":{"pricingDetails":{"__typename":"AppUsagePricing"}}}
                |]}]}}}""".stripMargin)
          else if (lastBody.contains("appUsageRecordCreate"))
            userError match {
              case Some(msg) => respond(ex, 200,
                s"""{"data":{"appUsageRecordCreate":{"appUsageRecord":null,
                   |"userErrors":[{"field":["price"],"message":"$msg"}]}}}"""
                  .stripMargin)
              case None => respond(ex, 200,
                """{"data":{"appUsageRecordCreate":{
                  |"appUsageRecord":{"id":"gid://s/AppUsageRecord/42"},
                  |"userErrors":[]}}}""".stripMargin)
            }
          else respond(ex, 200, """{"data":{"shop":{"name":"t"}}}""")
      }
    })
    server.setExecutor(java.util.concurrent.Executors
      .newFixedThreadPool(8))
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def client(timeoutSeconds: Int = 30) = new HttpChargeClient(
    timeoutSeconds = timeoutSeconds,
    endpointOverride = Some(shop => s"http://127.0.0.1:$port/graphql/$shop"))

  // ---- request shaping ------------------------------------------------

  test("default endpoint shaping ensures the .myshopify.com suffix " +
      "and the versioned Admin path") {
    val f = HttpChargeClient.defaultEndpoint("2024-01")
    assert(f("acme") ===
      "https://acme.myshopify.com/admin/api/2024-01/graphql.json")
    assert(f("acme.myshopify.com") ===
      "https://acme.myshopify.com/admin/api/2024-01/graphql.json")
  }

  test("lookup walks subscriptions for the AppUsagePricing line item, " +
      "sending token + content-type headers") {
    reset()
    val li = client().lookupSubscriptionLineItem("acme", "tok-1")
    assert(li === "gid://s/Li/usage") // skips the recurring line item
    assert(lastToken === "tok-1")
    assert(lastContentType === "application/json")
    assert(lastBody.contains("currentAppInstallation"))
  }

  test("createUsageCharge serializes the amount as a 2-dp money string " +
      "and carries the idempotency key header") {
    reset()
    val id = client().createUsageCharge("acme", "tok-1",
      "gid://s/Li/usage", 12.5, "Page view billing: 12.50 USD",
      idempotencyKey = "acme:2024-01-15")
    assert(id === "gid://s/AppUsageRecord/42")
    assert(lastBody.contains(""""amount":"12.50""""))
    assert(lastBody.contains(""""currencyCode":"USD""""))
    assert(lastIdemKey === "acme:2024-01-15")
  }

  // ---- U3 status classification over real sockets ---------------------

  test("401 → terminal invalid-token error, no retry consumed") {
    reset(); failStatus = Some(401)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val e = intercept[ChargeError] {
      Retry.withRetry(3, 1000L, sleeps += _) { _ =>
        client().lookupSubscriptionLineItem("acme", "bad")
      }
    }
    assert(e.getMessage === "Invalid access token" && !e.retryable)
    assert(hits.get() === 1 && sleeps.isEmpty)
  }

  test("429 → retryable; backoff loop retries through real responses " +
      "then succeeds") {
    reset(); failuresBeforeSuccess = 0
    // program: first two hits 429, then success
    failStatus = Some(429)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val li = Retry.withRetry(3, 1000L, sleeps += _) { attempt =>
      if (attempt == 3) failStatus = None // recover before 3rd attempt
      client().lookupSubscriptionLineItem("acme", "tok")
    }
    assert(li === "gid://s/Li/usage")
    assert(hits.get() === 3)
    assert(sleeps.toSeq === Seq(1000L, 2000L)) // U2: 1s, 2s exponential
  }

  test("5xx → retryable server error; other 4xx → terminal") {
    reset(); failStatus = Some(503)
    val e5 = intercept[ChargeError] {
      client().lookupSubscriptionLineItem("acme", "tok") }
    assert(e5.getMessage === "Shopify API error: 503" && e5.retryable)
    reset(); failStatus = Some(404)
    val e4 = intercept[ChargeError] {
      client().lookupSubscriptionLineItem("acme", "tok") }
    assert(e4.getMessage === "HTTP error: 404" && !e4.retryable)
  }

  test("GraphQL userErrors surface as a terminal error with messages") {
    reset(); userError = Some("amount exceeds cap")
    val e = intercept[ChargeError] {
      client().createUsageCharge("acme", "tok", "li", 5.0, "d")
    }
    assert(e.getMessage === "GraphQL errors: amount exceeds cap")
    assert(!e.retryable)
  }

  test("transport timeout → terminal 'API request failed' " +
      "(reference axios-error fold)") {
    reset(); sleepMs = 2500L
    val e = intercept[ChargeError] {
      client(timeoutSeconds = 1).testConnectionOrThrow()
    }
    assert(e.getMessage.startsWith("API request failed"))
    assert(!e.retryable)
    sleepMs = 0L
  }

  test("a 2xx with a malformed body classifies terminal, not retryable") {
    reset(); userError = None; failStatus = None
    // program the stub to return junk by hitting an unknown query shape:
    // force it via sleep-free custom status? simplest: point the client
    // at a fresh context that returns broken JSON
    val broken = server.createContext("/broken",
      (ex: HttpExchange) => respond(ex, 200, "{not json"))
    try {
      val c = new HttpChargeClient(
        endpointOverride = Some(_ => s"http://127.0.0.1:$port/broken"))
      val e = intercept[ChargeError] {
        c.lookupSubscriptionLineItem("acme", "tok")
      }
      assert(e.getMessage.startsWith("API request failed: malformed"))
      assert(!e.retryable)
    } finally server.removeContext(broken)
  }

  test("constructor apiVersion is wired into the default endpoint") {
    // regression: the default used to freeze 2024-01 regardless of the
    // apiVersion the caller passed
    val c = new HttpChargeClient(apiVersion = "2025-01")
    assert(c.endpoint("acme") ===
      "https://acme.myshopify.com/admin/api/2025-01/graphql.json")
  }

  test("a 2xx with a non-array GraphQL errors payload is a terminal " +
      "error, not silent success") {
    // the reference fails on any truthy `errors`; a string or object
    // shape used to fall through to the misleading no-line-item error
    val ctx = server.createContext("/strerrors",
      (ex: HttpExchange) => respond(ex, 200,
        """{"errors":{"message":"shop is frozen"}}"""))
    try {
      val c = new HttpChargeClient(
        endpointOverride = Some(_ => s"http://127.0.0.1:$port/strerrors"))
      val e = intercept[ChargeError] {
        c.lookupSubscriptionLineItem("acme", "tok")
      }
      assert(e.getMessage.startsWith("GraphQL errors:"))
      assert(e.getMessage.contains("shop is frozen"))
      assert(!e.retryable)
    } finally server.removeContext(ctx)
  }

  test("GraphQL errors field follows JS truthiness exactly: falsy " +
      "scalars pass, the empty array (truthy in JS) is terminal") {
    val falsy = server.createContext("/falsyerrors",
      (ex: HttpExchange) => respond(ex, 200,
        """{"errors":false,"data":{"shop":{"name":"t"}}}"""))
    val emptyArr = server.createContext("/emptyerrors",
      (ex: HttpExchange) => respond(ex, 200,
        """{"errors":[],"data":{"shop":{"name":"t"}}}"""))
    try {
      // errors:false is falsy — the reference's `if (data.errors)`
      // does NOT throw, so the probe succeeds
      val cFalsy = new HttpChargeClient(
        endpointOverride = Some(_ => s"http://127.0.0.1:$port/falsyerrors"))
      assert(cFalsy.testConnection("acme", "tok"))
      // errors:[] is TRUTHY in JS — the reference throws
      val cEmpty = new HttpChargeClient(
        endpointOverride = Some(_ => s"http://127.0.0.1:$port/emptyerrors"))
      val e = intercept[ChargeError] {
        cEmpty.lookupSubscriptionLineItem("acme", "tok")
      }
      assert(e.getMessage.startsWith("GraphQL errors:"))
      assert(!e.retryable)
    } finally {
      server.removeContext(falsy); server.removeContext(emptyArr)
    }
  }

  test("testConnection probes true on success, false on any failure") {
    reset()
    assert(client().testConnection("acme", "tok"))
    failStatus = Some(500)
    assert(!client().testConnection("acme", "tok"))
  }

  // ---- end-to-end through the ChargeSink ------------------------------

  test("ChargeSink drives the HTTP client end-to-end on executors: " +
      "charge, skip, and classified failure rows") {
    reset()
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val p = port // capture: the spec class is not serializable
    val sink = new ChargeSink(
      clientFactory = () => new HttpChargeClient(
        endpointOverride = Some(shop => s"http://127.0.0.1:$p/graphql/$shop")),
      concurrency = 2, maxRetries = 3, baseDelayMs = 0L, sleep = _ => ())
    val charges = Seq(
      ChargeInput("a-shop", "tok", 10.0, "a-shop:d1"),
      ChargeInput("b-shop", "tok", 0.0, "b-shop:d1")).toDS()
    val out = sink.chargeAll(spark, charges).collect()
      .map(r => r.shop -> r).toMap
    assert(out("a-shop").success && !out("a-shop").skipped &&
      out("a-shop").chargeId === Some("gid://s/AppUsageRecord/42"))
    assert(out("b-shop").skipped && out("b-shop").amount === 0.0)
  }

  private implicit class ProbeOps(c: HttpChargeClient) {
    /** The probe swallows errors by contract; tests that need the raw
      * classification call the lookup path instead. */
    def testConnectionOrThrow(): String =
      c.lookupSubscriptionLineItem("acme", "tok")
  }
}
