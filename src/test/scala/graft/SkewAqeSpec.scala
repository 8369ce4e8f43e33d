package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join evidence: with one key carrying ~all rows, the
  * sort-merge join's skewed partition must be split at runtime
  * (`skew=true` in the final plan). This is the runtime half of the
  * skew story — SkewOps salting covers what AQE can't (e.g. broadcast
  * build sides too big to broadcast). Thresholds are tuned down so the
  * tiny test dataset trips the same code path a 100 TB hot key would. */
class SkewAqeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AQE splits the skewed partition of a sort-merge join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.shuffle.partitions"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.shuffle.partitions", "8")

      // 50k rows on ONE left key, a handful elsewhere: that partition
      // is orders of magnitude above the 8KB threshold. The right side
      // carries each key once so the join output stays left-sized.
      val left = spark.range(0, 50000).select(lit(7L).as("k"), $"id")
        .union(spark.range(0, 50).select(($"id" % 5).as("k"), $"id"))
      val right = Seq((7L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
        (3L, "d"), (4L, "e")).toDF("k", "v")

      val joined = left.join(right, "k")
      // execute THIS frame's plan (count() would plan a different
      // query execution and leave this one un-finalized)
      assert(joined.collect().nonEmpty)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark and split the skewed SMJ partition:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
