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

  test("multi-byte strings: guard is computed over UTF-8 BYTES, so " +
      "pairs whose char ratio violates 5t-4 but byte ratio does not " +
      "are NOT pruned") {
    GraftFunctions.register(spark)
    // jw('ééééxxxxxx','ééééxxx') = 0.9571 >= 0.95, char ratio
    // 7/10 = 0.7 < 5*0.95-4 = 0.75 (a char guard would wrongly prune),
    // byte ratio 11/14 = 0.786 >= 0.75 (the byte guard keeps it).
    val pairs = Seq(
      ("ééééxxxxxx", "ééééxxx"),   // the straddling pair
      ("ééééxxxxxx", "ééééxxxxxx"),
      ("あいうえおかきくけこ", "あいうえおかきくけ"), // 3-byte cps
      ("éabc", "zqwx"))             // low-JW control
    for (t <- Seq(0.9, 0.95)) {
      val viaRule = pairs.toDF("a", "b")
        // range-join through an id so ConvertToLocalRelation can't
        // pre-fold the filter before the optimizer rule runs
        .crossJoin(spark.range(1))
        .where(EditDistanceFunctions.jaro_winkler(col("a"), col("b")) >= t)
        .select("a", "b").as[(String, String)].collect().toSet
      val direct = pairs.filter { case (a, b) =>
        JaroWinkler.similarity(
          UTF8String.fromString(a), UTF8String.fromString(b)) >= t
      }.toSet
      assert(viaRule === direct,
        s"rule-filtered result must equal direct kernel eval at t=$t")
    }
    // the straddling pair must actually survive at 0.95
    val jw = JaroWinkler.similarity(
      UTF8String.fromString("ééééxxxxxx"), UTF8String.fromString("ééééxxx"))
    assert(jw >= 0.95, s"fixture invariant: jw=$jw")
  }

  test("'t < jw' spelling (LessThan with literal on the left) also " +
      "gets the prune") {
    GraftFunctions.register(spark)
    val f = rangeDf.where(
      lit(0.9) < EditDistanceFunctions.jaro_winkler(col("a"), col("b")))
    val opt = f.queryExecution.optimizedPlan.toString
    assert(opt.contains("least(octet_length("),
      s"guard must appear for the t < jw spelling:\n$opt")
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
