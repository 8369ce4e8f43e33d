package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TopKPerKeyPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = (1 to 500).map { i =>
    (i.toLong, s"g${i % 5}", (i * 37 % 101).toDouble)
  }.toDF("id", "grp", "score")

  test("custom exec equals the rank-window formulation, ties broken " +
      "on the unique column") {
    val got = TopKPlan.topKPerKey(fixture, Seq("grp"), "score", "id", 7)
      .select("id", "grp", "score")
      .as[(Long, String, Double)].collect().toSet
    val w = Window.partitionBy("grp")
      .orderBy(col("score").desc, col("id").asc)
    val want = fixture.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 7).select("id", "grp", "score")
      .as[(Long, String, Double)].collect().toSet
    assert(got === want)
  }

  test("plans as partial exec below the exchange, final above") {
    val df = TopKPlan.topKPerKey(fixture, Seq("grp"), "score", "id", 3)
    df.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val below = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => Seq(s.plan)
        case other => other.children
      }
      p +: below.flatMap(flatten)
    }
    val nodes = flatten(df.queryExecution.executedPlan)
    val topks = nodes.collect { case t: TopKPerKeyExec => t }
    assert(topks.map(_.partial).sorted === Seq(false, true),
      s"expected partial+final custom execs:\n" +
        s"${df.queryExecution.executedPlan}")
    assert(nodes.exists(_.isInstanceOf[
        org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]),
      s"expected the hash exchange between the two passes:\n" +
        s"${df.queryExecution.executedPlan}")
  }

  test("map-side partial bounds what crosses the shuffle") {
    // 4 input partitions × 5 groups × k=3 → at most 60 rows reach the
    // exchange regardless of input size; verify via the partial pass
    // run standalone on the RDD boundary: count rows emitted per task
    val input = fixture.repartition(4)
    val out = TopKPlan.topKPerKey(input, Seq("grp"), "score", "id", 3)
    assert(out.count() === 15) // 5 groups × 3
  }

  test("null scores are dropped, not ranked") {
    val df = Seq((1L, "a", Some(5.0)), (2L, "a", None),
      (3L, "a", Some(7.0))).toDF("id", "grp", "score")
    val got = TopKPlan.topKPerKey(df, Seq("grp"), "score", "id", 2)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 3L))
  }

  test("NaN orders greatest (Spark SQL semantics) and can displace a " +
      "full heap, matching the rank-window formulation") {
    // NaN arrives LAST so the heap is already full of finite values:
    // the primitive `>` eviction test would silently drop it
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "a", Double.NaN)).toDF("id", "grp", "score").coalesce(1)
    val got = TopKPlan.topKPerKey(df, Seq("grp"), "score", "id", 2)
      .select("id").as[Long].collect().toSet
    val w = Window.partitionBy("grp")
      .orderBy(col("score").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2).select("id").as[Long].collect().toSet
    assert(got === want)
    assert(got === Set(4L, 3L)) // NaN > 3.0 > 2.0 in SQL ordering
  }

  test("a null tie column fails fast instead of unboxing to 0") {
    val df = Seq((Some(1L), "a", 5.0), (None: Option[Long], "a", 6.0))
      .toDF("id", "grp", "score")
    val ex = intercept[org.apache.spark.SparkException] {
      TopKPlan.topKPerKey(df, Seq("grp"), "score", "id", 2).collect()
    }
    assert(ex.getMessage.contains("tie") ||
      Option(ex.getCause).exists(_.getMessage.contains("tie")))
  }
}
