package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.{EditDistanceFunctions, GraftFunctions, JaroWinkler}

class JaroWinklerLengthPruneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jwDf = Seq(
    ("martha", "marhta"),            // high JW, equal lengths
    ("prefix", "prefixxxxxxxxxxxx"), // 3x length gap — guard prunes
    ("same", "same"),
    ("abcdefgh", "abcd"))            // 2x gap, high prefix
    .toDF("a", "b")

  /** range-backed, so ConvertToLocalRelation can't fold the filter
    * away before the optimized plan is inspected */
  private def rangeDf = spark.range(8).select(
    concat(lit("name"), col("id")).as("a"),
    concat(lit("nam"), col("id"), lit("xx")).as("b"))

  test("injects the implied length guard ahead of a 0.9 filter") {
    GraftFunctions.register(spark)
    val f = rangeDf.where(
      EditDistanceFunctions.jaro_winkler(col("a"), col("b")) >= 0.9)
    val opt = f.queryExecution.optimizedPlan.toString
    assert(opt.contains("least(length(") || opt.contains("least(octet_length("),
      s"guard must appear in the optimized filter:\n$opt")
    // 5*0.9 - 4 = 0.5: the 2x-length-gap constant
    assert(opt.contains("0.5"),
      s"the (5t-4) ratio for t=0.9 must be folded in:\n$opt")
  }

  test("guard never changes results (bound soundness on the corpus " +
      "of length-straddling pairs)") {
    GraftFunctions.register(spark)
    val withRule = jwDf.where(
        EditDistanceFunctions.jaro_winkler(col("a"), col("b")) >= 0.9)
      .select("a").as[String].collect().sorted
    // reference: evaluate JW directly, no optimizer involved
    val expected = jwDf.collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filter { case (a, b) => JaroWinkler.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b)) >= 0.9 }
      .map(_._1).sorted
    assert(withRule === expected)
    // and the mathematical bound itself: jw >= t implies the guard
    for (a <- Seq("ab", "abcdef", "abcdefghij", "x");
         b <- Seq("ab", "abcde", "abcdefghijklm", "abcdefg")) {
      val jw = JaroWinkler.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
      if (jw >= 0.9)
        assert(math.min(a.length, b.length) >=
          0.5 * math.max(a.length, b.length),
          s"bound violated for ($a, $b): jw=$jw")
    }
  }

  test("thresholds at or below 0.8 are left untouched (vacuous bound)") {
    GraftFunctions.register(spark)
    val f = rangeDf.where(
      EditDistanceFunctions.jaro_winkler(col("a"), col("b")) >= 0.8)
    val opt = f.queryExecution.optimizedPlan.toString
    assert(!opt.contains("least("),
      s"no guard for t <= 0.8 (the implied ratio is <= 0):\n$opt")
  }
}
