package graft.sinks

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** S7 transport: posts the [[SlackBlocks]] rendering of a
  * [[BatchReport]] over HTTP, mirroring the reference's
  * `chat.postMessage` call (`/root/reference/src/services/slack.ts:
  * 292-296`) and its surrounding contract:
  *
  *   - body `{"channel": …, "text": …, "blocks": […]}` — the
  *     fallback `text` and block array exactly as [[SlackBlocks.render]]
  *     produces them (`slack.ts:292-296`);
  *   - bot token as `Authorization: Bearer …` (the WebClient's wire
  *     form) with `Content-Type: application/json; charset=utf-8`;
  *   - the dummy-startup token disables posting entirely
  *     (`slack.ts:21-23`, `:54-57`);
  *   - EVERY failure — transport, non-2xx, Slack `"ok": false` — is
  *     swallowed after a stderr log: a report error must never fail
  *     the batch (`slack.ts:299-302`).
  *
  * `endpointOverride` points tests at an in-process stub (same pattern
  * as [[HttpChargeClient]]); production uses the public
  * `chat.postMessage` URL. `now` is injected so the rendered
  * timestamp stays clock-free in tests.
  */
final class SlackWebhookSink(
    botToken: String,
    channelId: String,
    timeoutSeconds: Int = 30,
    endpointOverride: Option[String] = None,
    now: () => java.time.Instant = () => java.time.Instant.now())
  extends ReportSink {

  require(botToken.nonEmpty, "botToken is required")      // slack.ts:14-16
  require(channelId.nonEmpty, "channelId is required")    // slack.ts:17-19

  private val endpoint: String =
    endpointOverride.getOrElse("https://slack.com/api/chat.postMessage")
  private val dummyToken: Boolean =
    botToken == "dummy-token-for-startup"                 // slack.ts:21

  private lazy val http: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(timeoutSeconds.toLong))
    .build()

  /** Visible for tests: the last outcome ("sent", "skipped", or the
    * swallowed failure message) — the reference logs the same trio. */
  @volatile var lastOutcome: String = ""

  override def send(report: BatchReport): Unit = {
    try {
      if (dummyToken) {                                    // slack.ts:54-57
        lastOutcome = "skipped (dummy token)"
        return
      }
      val message = report.error.getOrElse(
        s"Billing batch completed for ${report.targetDate}")
      val rendered = SlackBlocks.render(report, message, now().toString)
      // SlackBlocks.render emits {"text":…,"blocks":[…]}; splice the
      // channel in front, exactly the chat.postMessage argument shape
      val body = s"""{"channel":${SlackWebhookSink.q(channelId)},""" +
        rendered.substring(1)
      val request = HttpRequest.newBuilder()
        .uri(URI.create(endpoint))
        .timeout(Duration.ofSeconds(timeoutSeconds.toLong))
        .header("Authorization", s"Bearer $botToken")
        .header("Content-Type", "application/json; charset=utf-8")
        .POST(HttpRequest.BodyPublishers.ofString(body,
          StandardCharsets.UTF_8))
        .build()
      val response = http.send(request,
        HttpResponse.BodyHandlers.ofString())
      val status = response.statusCode()
      // the WebClient raises on non-2xx AND on {"ok": false, …}; both
      // are swallowed here per the S7 contract — but LOGGED, exactly
      // like the exception path, so a vanished report leaves a trace.
      // `ok` is read from parsed JSON (chat.postMessage echoes the
      // posted message, so substring probes can false-positive on
      // report content; a formatter's whitespace would false-negative)
      if (status < 200 || status >= 300)
        fail(s"HTTP $status")
      else {
        val ok =
          try org.json4s.jackson.JsonMethods.parse(response.body()) \ "ok"
          catch { case _: Exception => org.json4s.JNothing }
        ok match {
          case org.json4s.JBool(true) => lastOutcome = "sent"
          case _ => fail(s"non-ok response: ${response.body().take(200)}")
        }
      }
    } catch {
      // only ordinary failures are swallowed (slack.ts:299-302 catches
      // JS exceptions — it has no analogue of a fatal VM error, so the
      // contract does not cover OutOfMemoryError etc.); an interrupt is
      // swallowed like any send failure but the flag is restored so the
      // caller still observes the cancellation.
      case e: InterruptedException =>
        Thread.currentThread().interrupt()
        fail(Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
      case scala.util.control.NonFatal(e) =>               // slack.ts:299-302
        fail(Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
    }
  }

  private def fail(reason: String): Unit = {
    lastOutcome = s"failed: $reason"
    System.err.println(s"[slack] notification failed (swallowed): $reason")
  }
}

object SlackWebhookSink {
  // shared with the block renderer — one escaper, one behavior
  private def q(s: String): String = SlackBlocks.jsonQuote(s)
}
