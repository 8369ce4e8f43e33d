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

  test("salted join equals the plain join and spreads the hot key") {
    import graft.operators.SkewOps
    // one key carries 90% of the left side
    val left = spark.range(0, 9000).select(lit(7L).as("k"), $"id")
      .union(spark.range(0, 1000).select(($"id" % 5).as("k"), $"id"))
    val right = Seq((7L, 70L), (0L, 0L), (1L, 10L), (2L, 20L),
      (3L, 30L), (4L, 40L)).toDF("k", "w")

    val salted = SkewOps.saltedJoin(left, right, "k", salt = 8)
    val plain = left.join(right, "k")
    assert(salted.count() === plain.count())
    assert(salted.select("k", "id", "w").except(plain.select("k", "id", "w"))
      .isEmpty && plain.select("k", "id", "w")
      .except(salted.select("k", "id", "w")).isEmpty,
      "salting must be invisible in the result set")

    // distribution property: the hot key's rows really do land in
    // every salt bucket, so no single reducer sees them all
    val buckets = left.where($"k" === 7L)
      .withColumn("__salt",
        pmod(xxhash64(left.columns.map(col): _*), lit(8L)))
      .select("__salt").distinct().count()
    assert(buckets === 8L,
      "9000 rows on one key must scatter across all 8 salt buckets")
  }
}
