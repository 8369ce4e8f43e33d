package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-encoding tolerance for the event log's `ts` column.
  *
  * The reference's storage layer always hands back UTC instants
  * regardless of how the warehouse stored them (`src/services/
  * bigquery.ts:132` — BigQuery TIMESTAMP → Date in UTC); the engine's
  * event source must match that robustness. Round 7 shipped into a
  * sandbox whose parquet stored `ts` as Timestamp(isAdjustedToUTC=false,
  * µs) — TIMESTAMP_NTZ to Spark 4 — and every `unix_micros(ts)` consumer
  * broke. This spec pins the contract so that failure mode cannot
  * silently recur: all three historical encodings (legacy int64 nanos,
  * NTZ micros, UTC-adjusted micros) must land as TimestampType with
  * identical UTC instant values, and the daily slice must behave
  * identically on each.
  */
class EventTimestampSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // Three instants: mid-day D, last µs of D, first µs of D+1 (the
  // boundary pair proves the slice is half-open [D 00:00, D+1 00:00)).
  private val D = "2024-01-15"
  private val microsUtc = Seq(
    1705312845123456L, // 2024-01-15 09:20:45.123456 UTC
    1705363199999999L, // 2024-01-15 23:59:59.999999 UTC
    1705363200000000L  // 2024-01-16 00:00:00.000000 UTC
  )

  /** Write a tiny events.parquet with `ts` in the given encoding;
    * returns the directory usable as an `events()` sfDir. */
  private def fixture(encoding: String): String = {
    val dir = Files.createTempDirectory(s"events-$encoding-").toString
    val base = microsUtc.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong, "view", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
    val df = encoding match {
      case "nanos" => // legacy: int64 nanoseconds since epoch
        base.withColumn("ts", col("us") * 1000L)
      case "ntz" => // Timestamp(isAdjustedToUTC=false, µs)
        base.withColumn("ts",
          timestamp_micros(col("us")).cast(TimestampNTZType))
      case "utc" => // Timestamp(isAdjustedToUTC=true, µs)
        base.withColumn("ts", timestamp_micros(col("us")))
    }
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val encodings = Seq("nanos", "ntz", "utc")

  test("events() lands ts as TimestampType with identical UTC instants " +
      "under all three storage encodings") {
    for (enc <- encodings) {
      val df = SparkEntry.events(spark, fixture(enc))
      assert(df.schema("ts").dataType == TimestampType,
        s"$enc: ts must normalize to TIMESTAMP, got " +
          df.schema("ts").dataType)
      val got = df.orderBy("event_id")
        .select(unix_micros(col("ts"))).as[Long].collect().toSeq
      assert(got == microsUtc,
        s"$enc: instants drifted: $got != $microsUtc")
    }
  }

  test("eventsOnDate() is the same half-open UTC day slice under all " +
      "three encodings") {
    for (enc <- encodings) {
      val ids = SparkEntry.eventsOnDate(spark, fixture(enc), D)
        .select("event_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(0L, 1L),
        s"$enc: day slice must keep both D rows and drop the D+1 " +
          s"boundary row, got $ids")
    }
  }

  test("eventsOnDate() pushes timestamp bounds to the parquet scan for " +
      "the NTZ encoding (100-TB date pruning)") {
    val df = SparkEntry.eventsOnDate(spark, fixture("ntz"), D)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(ts,") &&
      plan.contains("LessThan(ts,"),
      s"NTZ daily slice must push half-open ts bounds to the scan:\n$plan")
  }
}
