package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CountInSetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("counts occurrences (duplicates included), empty and miss cases") {
    val df = Seq(
      (1L, Seq("the", "cat", "the", "dog")),
      (2L, Seq("xyz")),
      (3L, Seq.empty[String])
    ).toDF("id", "toks")
    val got = df.select(col("id"),
        StringSetFunctions.count_in_set(col("toks"), Seq("the", "dog"))
          .as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 0L, 3L -> 0L))
  }

  test("null array yields null, matching size(filter(...)) semantics") {
    val df = Seq(Tuple1(Option.empty[Seq[String]])).toDF("toks")
    val got = df.select(
      StringSetFunctions.count_in_set(col("toks"), Seq("a"))).head()
    assert(got.isNullAt(0))
  }

  test("count_in_set registered for SQL users") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT count_in_set(array('a', 'b', 'a', 'c'), array('a', 'c')) AS n")
      .as[Long].head()
    assert(got === 3L)
  }

  test("equals the filter+size formulation on generated data") {
    val words = Seq("alpha", "beta", "gamma")
    val df = spark.range(500).select(col("id"),
      split(concat_ws(" ",
        element_at(array(lit("alpha"), lit("x"), lit("beta")),
          (pmod(col("id"), lit(3)) + 1).cast("int")),
        lit("beta gamma filler")), " ").as("toks"))
    val cmp = df.select(
        StringSetFunctions.count_in_set(col("toks"), words).as("fast"),
        size(filter(col("toks"), t => t.isInCollection(words)))
          .cast("long").as("slow"))
      .where(col("fast") =!= col("slow"))
    assert(cmp.count() === 0)
  }
}
