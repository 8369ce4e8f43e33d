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

  test("all five native expressions answer from SQL after register()") {
    GraftFunctions.register(spark)
    val row = spark.sql("""
      SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
               array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dot,
             rolling_hash('abc') AS rh,
             distinct_wgram_count(array('a', 'b', 'a', 'b'), 2) AS wg,
             hex_bit_signs('f0', 8) AS hb
      """).head()
    assert(math.abs(row.getDouble(0) - 11.0) < 1e-9)
    assert(!row.isNullAt(1))
    // bigrams of [a b a b]: (a,b) (b,a) (a,b) → 2 distinct
    assert(row.getLong(2) === 2L)
    // 'f0' → bits 11110000 → signs +1×4 then -1×4
    assert(row.getSeq[Int](3).take(4).forall(_ == 1))
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
