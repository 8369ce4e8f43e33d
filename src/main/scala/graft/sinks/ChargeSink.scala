package graft.sinks

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{ChargeInput, UsageChargeResult}

/** Errors classified the way the reference maps HTTP statuses
  * (`/root/reference/src/services/shopifyBilling.ts:265-279`, U3).
  * `retryable` drives the retry loop. */
final case class ChargeError(message: String, retryable: Boolean)
  extends Exception(message)

object ChargeError {
  def fromHttpStatus(status: Int): ChargeError = status match {
    case 401 => ChargeError("Invalid access token", retryable = false)
    case 429 => ChargeError("Rate limit exceeded", retryable = true)
    case s if s >= 500 => ChargeError(s"Shopify API error: $s", retryable = true)
    case s => ChargeError(s"HTTP error: $s", retryable = false)
  }
}

/** The external charge API seam. The reference talks Shopify GraphQL
  * (`shopifyBilling.ts:142-232`: Q1 lookup of the usage-pricing line item,
  * M1 `appUsageRecordCreate` mutation, U6 probe); the engine keeps the
  * same three-call surface behind a serializable factory so executors can
  * construct clients per partition. Tests inject fakes at exactly this
  * seam, like the reference's own test (`shopifyBilling.test.ts:72-81`). */
trait ChargeClient {
  /** U4/Q1: resolve the subscription line item to charge against. */
  def lookupSubscriptionLineItem(shop: String, accessToken: String): String
  /** U5/M1: create the usage charge; returns the charge id. The amount is
    * serialized 2-dp at this edge (X7, `shopifyBilling.ts:209`). A
    * non-empty `idempotencyKey` asks the remote end to collapse repeats
    * of the same logical charge (Spark task retries). */
  def createUsageCharge(shop: String, accessToken: String,
      lineItemId: String, amount: Double, description: String,
      idempotencyKey: String = ""): String
  /** U6: connection probe. */
  def testConnection(shop: String, accessToken: String): Boolean
}

object Retry {
  /** U2: ≤ `maxRetries` attempts, exponential backoff
    * `baseDelayMs * 2^(attempt-1)` (reference `shopifyBilling.ts:91-140`:
    * MAX_RETRIES=3, base 1000 ms → 1s, 2s). Non-retryable errors
    * propagate immediately. `sleep` injectable for tests. */
  def withRetry[T](maxRetries: Int = 3, baseDelayMs: Long = 1000L,
      sleep: Long => Unit = Thread.sleep)(f: Int => T): T = {
    var attempt = 1
    while (true) {
      try return f(attempt)
      catch {
        case e: ChargeError if e.retryable && attempt < maxRetries =>
          sleep(baseDelayMs * (1L << (attempt - 1)))
          attempt += 1
        case e: Throwable => throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** S6: the side-effecting external charge sink.
  *
  * Distribution model: `repartition(concurrency)` bounds parallel calls
  * exactly like the reference's `pLimit(BATCH_SIZE=5)` event-loop gate
  * (`shopifyBilling.ts:53,64-78`, U1) — partition count = number of
  * concurrent in-flight charges, each partition processing its shops
  * serially. On a real cluster this scales by raising `concurrency`;
  * the per-partition client is constructed once (connection reuse) and
  * the Q1 line-item lookup is cached per (shop, token) within a
  * partition, mirroring how the reference pays Q1 once per shop.
  *
  * Semantics preserved from the reference: zero/negative amounts short-
  * circuit to `skipped` BEFORE any API call (F5, `shopifyBilling.ts:
  * 68-74`); failures after retries yield a `failed` row, never an
  * exception (the pipeline continues; `shopifyBilling.ts:79-88`).
  */
final class ChargeSink(clientFactory: () => ChargeClient,
    concurrency: Int = 5, maxRetries: Int = 3, baseDelayMs: Long = 1000L,
    sleep: Long => Unit = Thread.sleep) extends Serializable {

  def chargeAll(spark: SparkSession,
      charges: Dataset[ChargeInput]): Dataset[UsageChargeResult] = {
    import spark.implicits._
    val (factory, retries, delay, slp) =
      (clientFactory, maxRetries, baseDelayMs, sleep)
    charges.repartition(concurrency).mapPartitions { it =>
      val client = factory()
      val lineItemCache =
        scala.collection.mutable.Map.empty[(String, String), String]
      it.map { c =>
        if (c.amount <= 0.0)
          UsageChargeResult(c.shop, success = true, None, None,
            amount = 0.0, skipped = true)
        else {
          try {
            val chargeId = Retry.withRetry(retries, delay, slp) { _ =>
              val li = lineItemCache.getOrElseUpdate((c.shop, c.accessToken),
                client.lookupSubscriptionLineItem(c.shop, c.accessToken))
              client.createUsageCharge(c.shop, c.accessToken, li, c.amount,
                description = f"Page view billing: ${c.amount}%.2f USD",
                idempotencyKey = c.idempotencyKey)
            }
            UsageChargeResult(c.shop, success = true, Some(chargeId), None,
              c.amount, skipped = false)
          } catch {
            case e: Throwable =>
              UsageChargeResult(c.shop, success = false, None,
                Some(Option(e.getMessage).getOrElse(e.getClass.getName)),
                c.amount, skipped = false)
          }
        }
      }
    }
  }
}

/** A deterministic in-memory client for tests and dry runs: charges
  * succeed unless the token marks them failed, ids derive from the shop. */
final class FakeChargeClient(failTokens: Set[String] = Set.empty,
    failuresBeforeSuccess: Int = 0) extends ChargeClient with Serializable {
  private val attempts =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  override def lookupSubscriptionLineItem(shop: String, token: String) = {
    if (failTokens.contains(token))
      throw ChargeError("Invalid access token", retryable = false)
    s"gid://fake/AppSubscriptionLineItem/$shop"
  }
  private val chargedKeys =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  override def createUsageCharge(shop: String, token: String, li: String,
      amount: Double, description: String,
      idempotencyKey: String = ""): String = {
    // idempotent replay: a key that already charged returns the original
    // id without creating (or counting) a second charge
    if (idempotencyKey.nonEmpty && chargedKeys.containsKey(idempotencyKey))
      return chargedKeys.get(idempotencyKey)
    val n = attempts.merge(shop, 1, (a, b) => a + b)
    if (n <= failuresBeforeSuccess)
      throw ChargeError("Shopify API error: 503", retryable = true)
    val id = s"gid://fake/AppUsageRecord/$shop"
    if (idempotencyKey.nonEmpty) chargedKeys.put(idempotencyKey, id)
    id
  }
  override def testConnection(shop: String, token: String): Boolean =
    !failTokens.contains(token)
}
