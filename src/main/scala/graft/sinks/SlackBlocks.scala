package graft.sinks

/** Slack Block Kit rendering of a [[BatchReport]] — the reference's
  * operational report layout (`/root/reference/src/services/slack.ts:
  * 62-290`) as a PURE function `BatchReport => blocks JSON`, transport
  * left to the caller (the reference posts via `chat.postMessage`; the
  * engine's [[ReportSink]] seam stays pluggable).
  *
  * Structure mirrored block-for-block:
  *   - header with ✅/❌ status icon (`slack.ts:63-69`);
  *   - status/timestamp field pair, then the message section (`:70-89`);
  *   - target date + executed/skipped pair, optional skip reason
  *     (`:95-117`);
  *   - session/shop count pair, record/page-view count pair, total
  *     amount (`:119-155`, `toLocaleString` digit grouping → `%,d`);
  *   - charge-result histogram field ✅/❌/⏭️ (`:158-171`);
  *   - error details + 1000-char-truncated stack in code fences
  *     (`:177-196`, X11);
  *   - divider, per-shop detail for the top shops WITH activity —
  *     views/amount line, store-save icon line, charge-status icon
  *     line, optional 🔴 error lines (`:198-247`; the reference's
  *     BigQuery/Shopify product labels generalize to Store/Charge,
  *     same icons, same JP status words via [[SlackBlocks.chargeStatusText]]);
  *   - `_... 他 N ショップの結果は省略_` remainder summary (`:250-260`);
  *   - 実行タイプ spliced before the last block (`:264-272`), error
  *     code fence last (`:284-292`).
  *
  * The fallback `text` matches `slack.ts:297`. Rendering never throws;
  * the surrounding sink already swallows report errors (S7 contract).
  */
object SlackBlocks {

  /** X12 mapped to the reference's JP charge-status labels
    * (`slack.ts:306-313`). */
  def chargeStatusText(status: String): String = status match {
    case "success" => "請求成功"
    case "failed" => "請求失敗"
    case "skipped" => "請求スキップ"
    case "pending" => "請求待機"
    case _ => "不明"
  }

  private def statusIcon(status: String): String = status match {
    case "success" => "✅"
    case "failed" => "❌"
    case "skipped" => "⏭️"
    case _ => "⏳"
  }

  /** JSON string escaper — shared with [[SlackWebhookSink]] so the
    * channel id and the block contents of one payload are always
    * escaped by the same code. */
  private[sinks] def jsonQuote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  } + "\""

  private def q(s: String): String = jsonQuote(s)

  // Locale pinned: digit grouping and decimal points must render the
  // same bytes on any host (golden-tested)
  private def grouped(n: Long): String =
    String.format(java.util.Locale.US, "%,d", java.lang.Long.valueOf(n))

  private def money(d: Double): String =
    String.format(java.util.Locale.US, "%.2f", java.lang.Double.valueOf(d))

  private def header(text: String): String =
    s"""{"type":"header","text":{"type":"plain_text","text":${q(text)}}}"""

  private def section(mrkdwn: String): String =
    s"""{"type":"section","text":{"type":"mrkdwn","text":${q(mrkdwn)}}}"""

  private def fields(texts: Seq[String]): String =
    texts.map(t => s"""{"type":"mrkdwn","text":${q(t)}}""")
      .mkString("""{"type":"section","fields":[""", ",", "]}")

  private val divider = """{"type":"divider"}"""

  /** Render the full message payload: `{"text":…,"blocks":[…]}`.
    * `timestamp` is the run instant (ISO); passed in, not read from a
    * clock, so rendering stays pure and golden-testable. */
  def render(report: BatchReport, message: String, timestamp: String,
      skipReason: Option[String] = None): String = {
    val r = report
    val blocks = scala.collection.mutable.ArrayBuffer.empty[String]

    blocks += header(if (r.success) "✅ バッチ処理完了" else "❌ バッチ処理エラー")
    blocks += fields(Seq(
      s"*ステータス:*\n${if (r.success) "成功" else "失敗"}",
      s"*実行時刻:*\n$timestamp"))
    blocks += section(s"*メッセージ:*\n$message")

    val skipped = skipReason.isDefined
    blocks += fields(Seq(
      s"*処理対象日:*\n${r.targetDate}",
      s"*処理結果:*\n${if (skipped) "⏭️ スキップ" else "✅ 実行"}"))
    skipReason.foreach(reason =>
      blocks += section(s"*スキップ理由:*\n$reason"))

    if (!skipped) {
      // shops with page views = the active top rows plus the remainder
      // beyond the top-10 cut (the report already filtered activity)
      val activeShown = r.topShops.count(_.pageViews > 0)
      val shopsWithViews = activeShown + r.remainderShops
      blocks += fields(Seq(
        s"*アクティブセッション数:*\n${grouped(r.sessionCount)}",
        s"*ページビューのあるショップ数:*\n${grouped(shopsWithViews)}"))
      blocks += fields(Seq(
        s"*請求レコード数:*\n${grouped(r.recordCount)}",
        s"*総ページビュー数:*\n${grouped(r.totalPageViews)}"))
      blocks += section(
        "*総請求金額:*\n$" + money(r.totalBillingAmount))
      if (r.successful + r.failed + r.skipped > 0)
        blocks += fields(Seq(
          s"*請求結果:*\n✅ 成功: ${r.successful}\n❌ 失敗: ${r.failed}" +
            s"\n⏭️ スキップ: ${r.skipped}"))
    }

    r.errorDetails.foreach { d =>
      blocks += section(s"*🔴 エラー詳細:*\n```${d.message}```")
      d.stack.foreach(st => blocks += section(
        s"*🔍 スタックトレース:*\n```${ReportOps.truncateError(st)}```"))
    }

    val shopsWithActivity = r.topShops.filter(_.pageViews > 0)
    if (shopsWithActivity.nonEmpty) {
      blocks += divider
      blocks += section("*📊 ショップ別処理結果:*")
      val detail = shopsWithActivity.map { s =>
        val storeOk = s.storeError.isEmpty
        val sb = new StringBuilder
        sb ++= s"*${s.shop}*\n"
        sb ++= s"📊 ${grouped(s.pageViews)} views / $$${money(s.billingAmount)}\n"
        sb ++= s"${if (storeOk) "✅" else "❌"} Store " +
          s"${if (storeOk) "保存成功" else "保存失敗"}\n"
        sb ++= s"${statusIcon(s.status)} Charge ${chargeStatusText(s.status)}"
        s.storeError.foreach(e => sb ++= s"\n🔴 Store エラー: $e")
        s.chargeError.foreach(e => sb ++= s"\n🔴 Charge エラー: $e")
        sb.result()
      }.mkString("\n\n")
      blocks += section(detail)
      if (r.remainderShops > 0)
        blocks += section(s"_... 他 ${r.remainderShops} ショップの結果は省略_")
    }

    // 実行タイプ splices BEFORE the final block (slack.ts:264-272)
    val runType = section(
      s"*実行タイプ:*\n${if (r.scheduled) "スケジュール実行" else "手動実行"}")
    blocks.insert(math.max(0, blocks.length - 1), runType)

    r.error.foreach(e => blocks += section(s"*エラー詳細:*\n```$e```"))

    val fallback =
      if (r.success) "バッチ処理が完了しました" else "バッチ処理でエラーが発生しました"
    s"""{"text":${q(fallback)},"blocks":[${blocks.mkString(",")}]}"""
  }
}
