package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BloomOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val fact =
    spark.range(0L, 10000L).select(col("id").as("fk"),
      (col("id") % 101).as("payload"))
  private lazy val dim = // every 13th key, i.e. ~7.7% selectivity
    spark.range(0L, 10000L, 13L).select(col("id").as("dk"))

  private def plainSemi = {
    val keys = dim.select(col("dk")).distinct()
    fact.join(keys, fact("fk") === keys("dk"), "left_semi")
  }

  test("bloomSemiJoin result is exactly the plain semi join") {
    val got = BloomOps.bloomSemiJoin(fact, dim, "fk", "dk",
        expectedItems = 1000L)
      .orderBy("fk").collect().map(_.getLong(0))
    val want = plainSemi.orderBy("fk").collect().map(_.getLong(0))
    assert(got === want)
    assert(got.length === 770) // ceil(10000/13)
  }

  test("an overfull bloom (expectedItems far too small) stays exact") {
    val got = BloomOps.bloomSemiJoin(fact, dim, "fk", "dk",
        expectedItems = 10L) // 77x overfull → high fpp, zero false negatives
      .orderBy("fk").collect().map(_.getLong(0))
    assert(got === plainSemi.orderBy("fk").collect().map(_.getLong(0)))
  }

  test("integer (non-long) fact keys probe through widening") {
    val intFact = spark.range(0L, 100L)
      .select(col("id").cast("int").as("fk"))
    val got = BloomOps.bloomSemiJoin(intFact, dim, "fk", "dk",
        expectedItems = 1000L)
      .orderBy("fk").collect().map(_.getInt(0))
    assert(got === (0 until 100 by 13).toArray)
  }
}
