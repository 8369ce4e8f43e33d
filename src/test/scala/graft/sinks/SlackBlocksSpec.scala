package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

/** Block-for-block fidelity of [[SlackBlocks]] to the reference layout
  * (`slack.ts:62-290`): golden byte-match of a full success payload,
  * plus structural checks for the skip / error / remainder branches. */
class SlackBlocksSpec extends AnyFunSuite {

  private val fullReport = BatchReport(success = true,
    targetDate = "2024-01-15", scheduled = true,
    sessionCount = 1234, recordCount = 37, totalPageViews = 1234567,
    totalBillingAmount = 12.345, successful = 30, failed = 2, skipped = 5,
    topShops = Seq(
      ShopReportRow("shop-a", 1000, 10.0, "success"),
      ShopReportRow("shop-b", 234, 2.345, "failed",
        chargeError = Some("Rate limit exceeded")),
      ShopReportRow("shop-idle", 0, 0.0, "skipped")),
    remainderShops = 27, error = None)

  test("golden: full success payload is byte-stable") {
    val got = SlackBlocks.render(fullReport,
      message = "バッチ処理が正常に完了しました",
      timestamp = "2024-01-16T01:00:00Z")
    val golden =
      """{"text":"バッチ処理が完了しました","blocks":[""" +
      """{"type":"header","text":{"type":"plain_text","text":"✅ バッチ処理完了"}},""" +
      """{"type":"section","fields":[{"type":"mrkdwn","text":"*ステータス:*\n成功"},{"type":"mrkdwn","text":"*実行時刻:*\n2024-01-16T01:00:00Z"}]},""" +
      """{"type":"section","text":{"type":"mrkdwn","text":"*メッセージ:*\nバッチ処理が正常に完了しました"}},""" +
      """{"type":"section","fields":[{"type":"mrkdwn","text":"*処理対象日:*\n2024-01-15"},{"type":"mrkdwn","text":"*処理結果:*\n✅ 実行"}]},""" +
      """{"type":"section","fields":[{"type":"mrkdwn","text":"*アクティブセッション数:*\n1,234"},{"type":"mrkdwn","text":"*ページビューのあるショップ数:*\n29"}]},""" +
      """{"type":"section","fields":[{"type":"mrkdwn","text":"*請求レコード数:*\n37"},{"type":"mrkdwn","text":"*総ページビュー数:*\n1,234,567"}]},""" +
      """{"type":"section","text":{"type":"mrkdwn","text":"*総請求金額:*\n$12.35"}},""" +
      """{"type":"section","fields":[{"type":"mrkdwn","text":"*請求結果:*\n✅ 成功: 30\n❌ 失敗: 2\n⏭️ スキップ: 5"}]},""" +
      """{"type":"divider"},""" +
      """{"type":"section","text":{"type":"mrkdwn","text":"*📊 ショップ別処理結果:*"}},""" +
      """{"type":"section","text":{"type":"mrkdwn","text":"*shop-a*\n📊 1,000 views / $10.00\n✅ Store 保存成功\n✅ Charge 請求成功\n\n*shop-b*\n📊 234 views / $2.35\n✅ Store 保存成功\n❌ Charge 請求失敗\n🔴 Charge エラー: Rate limit exceeded"}},""" +
      """{"type":"section","text":{"type":"mrkdwn","text":"*実行タイプ:*\nスケジュール実行"}},""" +
      """{"type":"section","text":{"type":"mrkdwn","text":"_... 他 27 ショップの結果は省略_"}}""" +
      """]}"""
    assert(got === golden)
  }

  test("shops with zero page views are filtered from the detail " +
      "(slack.ts:199-200)") {
    val got = SlackBlocks.render(fullReport, "m", "t")
    assert(!got.contains("shop-idle"))
  }

  test("skip branch renders スキップ + reason and no billing sections") {
    val got = SlackBlocks.render(
      fullReport.copy(topShops = Nil, remainderShops = 0),
      "m", "t", skipReason = Some("前日データなし"))
    assert(got.contains("⏭️ スキップ"))
    assert(got.contains("*スキップ理由:*\\n前日データなし"))
    assert(!got.contains("総請求金額"))
    assert(!got.contains("アクティブセッション数"))
  }

  test("failure payload: ❌ header, 失敗 status, error details + " +
      "truncated stack in code fences, error block last") {
    val report = fullReport.copy(success = false, scheduled = false,
      error = Some("Process failed: boom"),
      errorDetails = Some(ErrorDetails("boom", "2024-01-16T01:00:00Z",
        Some("s" * 2000))))
    val got = SlackBlocks.render(report, "エラー", "t")
    assert(got.contains("❌ バッチ処理エラー"))
    assert(got.contains("*ステータス:*\\n失敗"))
    assert(got.contains("*🔴 エラー詳細:*\\n```boom```"))
    assert(got.contains("*🔍 スタックトレース:*\\n```" + "s" * 1000 + "```"))
    assert(!got.contains("s" * 1001))
    assert(got.contains("手動実行"))
    // the top-level error fence is the final block (slack.ts:284-292)
    assert(got.indexOf("Process failed: boom") > got.indexOf("実行タイプ"))
    // fallback text flips with success
    assert(got.startsWith("""{"text":"バッチ処理でエラーが発生しました""""))
  }

  test("status icons and JP labels cover the full decode table") {
    assert(SlackBlocks.chargeStatusText("success") === "請求成功")
    assert(SlackBlocks.chargeStatusText("failed") === "請求失敗")
    assert(SlackBlocks.chargeStatusText("skipped") === "請求スキップ")
    assert(SlackBlocks.chargeStatusText("pending") === "請求待機")
    assert(SlackBlocks.chargeStatusText("???") === "不明")
  }

  test("per-shop store errors render the ❌ Store line with the error " +
      "field (slack.ts:230-237)") {
    val report = fullReport.copy(topShops = Seq(
      ShopReportRow("shop-x", 10, 0.1, "skipped",
        storeError = Some("write denied"))))
    val got = SlackBlocks.render(report, "m", "t")
    assert(got.contains("❌ Store 保存失敗"))
    assert(got.contains("🔴 Store エラー: write denied"))
    assert(got.contains("⏭️ Charge 請求スキップ"))
  }
}
