package graft.sinks

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** [[SlackWebhookSink]] against an in-process HTTP stub: the
  * chat.postMessage wire shape plus the S7 swallow-own-errors
  * contract — no failure mode may escape `send`. */
class SlackWebhookSinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var port: Int = _
  @volatile private var failStatus: Option[Int] = None
  @volatile private var okFalse: Boolean = false
  @volatile private var lastBody: String = ""
  @volatile private var lastAuth: String = ""
  @volatile private var lastContentType: String = ""
  @volatile private var hits: Int = 0

  private def reset(): Unit = {
    failStatus = None; okFalse = false; lastBody = ""; lastAuth = ""
    lastContentType = ""; hits = 0
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
    server.createContext("/api/chat.postMessage", { ex =>
      hits += 1
      lastBody = new String(ex.getRequestBody.readAllBytes(),
        StandardCharsets.UTF_8)
      lastAuth = Option(ex.getRequestHeaders.getFirst("Authorization"))
        .getOrElse("")
      lastContentType = Option(ex.getRequestHeaders
        .getFirst("Content-Type")).getOrElse("")
      failStatus match {
        case Some(s) => respond(ex, s, """{"ok":false,"error":"down"}""")
        case None if okFalse =>
          respond(ex, 200, """{"ok":false,"error":"channel_not_found"}""")
        case None => respond(ex, 200, """{"ok":true,"ts":"1.2"}""")
      }
    })
    server.start()
  }

  override def afterAll(): Unit = if (server != null) server.stop(0)

  private def report(success: Boolean = true) = BatchReport(
    success = success, targetDate = "2024-01-15", scheduled = true,
    sessionCount = 3, recordCount = 3, totalPageViews = 42,
    totalBillingAmount = 1234.5, successful = 2, failed = 0, skipped = 1,
    topShops = Seq(ShopReportRow("acme", 40, 1200.0, "success")),
    remainderShops = 0,
    error = if (success) None else Some("boom"))

  private def sink(token: String = "xoxb-test") = new SlackWebhookSink(
    botToken = token, channelId = "C0123",
    endpointOverride = Some(s"http://127.0.0.1:$port/api/chat.postMessage"),
    now = () => java.time.Instant.parse("2024-01-16T01:00:00Z"))

  test("posts the chat.postMessage argument shape: channel, fallback " +
      "text, rendered blocks, bearer token") {
    reset()
    val s = sink()
    s.send(report())
    assert(s.lastOutcome === "sent")
    assert(hits === 1)
    assert(lastAuth === "Bearer xoxb-test")
    assert(lastContentType.startsWith("application/json"))
    assert(lastBody.startsWith("""{"channel":"C0123","text":"""))
    // fallback text + header block exactly as SlackBlocks renders them
    assert(lastBody.contains("バッチ処理が完了しました"))
    assert(lastBody.contains(""""blocks":["""))
    assert(lastBody.contains("✅ バッチ処理完了"))
    assert(lastBody.contains("acme"))
    // the injected clock, not wall time, lands in the 実行時刻 field
    assert(lastBody.contains("2024-01-16T01:00:00Z"))
  }

  test("non-2xx response is swallowed: send returns, batch unaffected") {
    reset(); failStatus = Some(500)
    val s = sink()
    s.send(report())                       // must not throw
    assert(s.lastOutcome === "failed: HTTP 500")
  }

  test("""a 200 with {"ok":false} is a failure, and still swallowed""") {
    reset(); okFalse = true
    val s = sink()
    s.send(report())
    assert(s.lastOutcome.startsWith("failed:"))
    assert(s.lastOutcome.contains("channel_not_found"))
  }

  test("transport failure (connection refused) is swallowed") {
    val dead = new SlackWebhookSink("xoxb-test", "C0123",
      endpointOverride = Some("http://127.0.0.1:1/api/chat.postMessage"))
    dead.send(report())                    // must not throw
    assert(dead.lastOutcome.startsWith("failed:"))
  }

  test("dummy startup token disables posting entirely") {
    reset()
    val s = sink(token = "dummy-token-for-startup")
    s.send(report())
    assert(hits === 0)
    assert(s.lastOutcome === "skipped (dummy token)")
  }

  test("missing token or channel fails construction, like the reference") {
    intercept[IllegalArgumentException] {
      new SlackWebhookSink("", "C0123")
    }
    intercept[IllegalArgumentException] {
      new SlackWebhookSink("xoxb-test", "")
    }
  }

  test("a failed batch report posts the error body") {
    reset()
    val s = sink()
    s.send(report(success = false))
    assert(s.lastOutcome === "sent")
    assert(lastBody.contains("バッチ処理でエラーが発生しました"))
    assert(lastBody.contains("boom"))
  }
}
