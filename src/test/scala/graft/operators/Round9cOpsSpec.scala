package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property pins for the round-9 late additions — each test asserts
  * the operator's defining guarantee on a fixture where the expected
  * answer is computable by hand or by an independent reference fold. */
class Round9cOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("winnowing guarantee: docs sharing >= w+k-1 words share a " +
      "fingerprint; disjoint docs share none") {
    // k=4, w=4: a shared run of 7 words guarantees >= 1 common
    // selected hash (Schleimer Thm. — every length-w window of the
    // shared run's grams selects inside the run at least once)
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"one two $shared three"),
      (2L, s"$shared nine ten eleven twelve"),
      (3L, "completely different words with no overlap at all here")
    ).toDF("doc_id", "text")
    // recompute the fingerprint SETS (operator returns stats; the
    // guarantee is about set intersection, so rebuild sets inline
    // with the same expressions)
    val fps = docs
      .withColumn("__toks", TextOps.tokens(col("text")))
      .withColumn("__hashes", expr(
        """transform(sequence(1, size(__toks) - 3),
          | i -> md5(cast(array_join(slice(__toks, i, 4), ' ') as binary)))"""
          .stripMargin))
      .withColumn("fp", expr(
        """array_distinct(transform(
          | sequence(1, greatest(1, size(__hashes) - 3)),
          | j -> array_min(slice(__hashes, j, 4))))""".stripMargin))
      .select(col("doc_id"), col("fp")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty,
      "7 shared words must yield a common fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty)
  }

  test("holtLinear equals the reference sequential fold") {
    val rows = Seq(
      ("a", "2024-01-01 00:00:00", 2.0), ("a", "2024-01-01 12:00:00", 1.0),
      ("a", "2024-01-02 00:00:00", 5.0), ("a", "2024-01-03 00:00:00", 4.0),
      ("a", "2024-01-04 00:00:00", 8.0))
      .toDF("event_type", "tss", "value")
      .withColumn("ts", col("tss").cast("timestamp"))
    val out = AnalyticsOps.holtLinear(rows, "event_type", "ts",
      "value", alpha = 0.5, beta = 0.3).collect().head
    // reference fold over the daily series [3, 5, 4, 8]
    var (l, b) = (3.0, 0.0)
    for (x <- Seq(5.0, 4.0, 8.0)) {
      val l2 = 0.5 * x + 0.5 * (l + b)
      b = 0.3 * (l2 - l) + 0.7 * b
      l = l2
    }
    assert(out.getAs[Long]("n_days") === 4L)
    assert(out.getAs[Double]("level") === l)
    assert(out.getAs[Double]("trend") === b)
    assert(out.getAs[Double]("forecast_1") === l + b)
  }

  test("linear attribution conserves credit per converting purchase") {
    val rows = Seq(
      // purchase 100 has 3 touches in-window -> 3 x (1e12 div 3)/1e12
      (1L, 10L, "view", "2024-01-01 00:00:00"),
      (2L, 10L, "click", "2024-01-02 00:00:00"),
      (3L, 10L, "view", "2024-01-03 00:00:00"),
      (100L, 10L, "purchase", "2024-01-03 12:00:00"),
      // purchase 101 has 1 touch -> exactly 1.0
      (4L, 20L, "click", "2024-01-05 00:00:00"),
      (101L, 20L, "purchase", "2024-01-05 06:00:00"),
      // purchase 102: touch outside the 3-day window -> no credit
      (5L, 30L, "view", "2024-01-01 00:00:00"),
      (102L, 30L, "purchase", "2024-01-09 00:00:00"))
      .toDF("event_id", "user_id", "event_type", "tss")
      .withColumn("ts", col("tss").cast("timestamp"))
    val credit = AnalyticsOps.linearAttribution(rows, "purchase",
        Seq("view", "click"), windowDays = 3)
      .agg(sum(col("credit"))).as[Double].head()
    // 2 purchases convert with touches; quantization loses < 1e-11
    assert(math.abs(credit - 2.0) < 1e-9,
      s"credit must sum to converting purchases, got $credit")
  }

  test("weighted median: heavier mass pulls the median") {
    // values 1..5 weight 1, value 9 weight 100 -> median 9
    val rows = (1 to 5).map(i => (i.toLong, 1L, i.toDouble)) :+
      ((9L, 100L, 9.0))
    val df = rows.toDF("event_id", "w", "value")
    import org.apache.spark.sql.expressions.Window
    val win = Window.orderBy(col("value"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = df.withColumn("cum", sum(col("w")).over(win))
      .crossJoin(df.agg(sum(col("w")).as("tot")))
      .where(col("cum") * 2 >= col("tot"))
      .agg(min(struct(col("value"), col("event_id"))))
      .collect().head.getStruct(0).getDouble(0)
    assert(m === 9.0)
  }

  test("lorenz deciles are monotone and end at full shares") {
    val spend = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "v")
    val rows = AnalyticsOps.lorenzDeciles(spend, "v")
      .orderBy("decile").collect()
    assert(rows.length === 10)
    val pop = rows.map(_.getAs[Double]("pop_share"))
    val value = rows.map(_.getAs[Double]("value_share"))
    assert(pop.zip(pop.tail).forall { case (a, b) => a < b })
    assert(value.zip(value.tail).forall { case (a, b) => a < b })
    assert(pop.last === 1.0 && value.last === 1.0)
    // Lorenz curve lies below the diagonal for unequal spend
    assert(rows.init.forall(r =>
      r.getAs[Double]("value_share") < r.getAs[Double]("pop_share")))
  }
}
