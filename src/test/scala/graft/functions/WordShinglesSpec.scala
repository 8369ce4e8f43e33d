package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check => scCheck, Parameters}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.TextFunctions.word_shingles

/** The native [[WordShingles]] expression must be indistinguishable from
  * the compositional built-in chain it replaces — the chain IS the spec
  * (and the DuckDB oracle replicates the chain, so parity here is what
  * keeps every dedup oracle green). */
class WordShinglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The original formulation, verbatim (Dedup.shingles pre-native). */
  private def composed(text: Column, w: Int): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    array_distinct(
      when(size(toks) < w, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - w),
          i => concat_ws(" ", slice(toks, i + 1, lit(w))))))
  }

  private def check(texts: Seq[String], w: Int): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val rows = df
      .select(word_shingles(col("text"), w).as("native"),
        composed(col("text"), w).as("composed"))
      .as[(Seq[String], Seq[String])].collect()
    rows.zip(texts).foreach { case ((n, c), t) =>
      assert(n == c, s"w=$w text=${t.take(80).replace("\n", "\\n")}")
    }
  }

  test("edge cases match the compositional form exactly") {
    val edges = Seq(
      "", " ", "  ", "\t", "\n leading", "trailing\t", "one",
      "one two", "one two three", "one two three four",
      "A  Doubled   Spaces b", "MiXeD CaSe ToKeNs HERE yes",
      "a b a b a b a b", // repeated shingles -> distinct order
      "x\ny\tz w", "déjà vu naïve café again encore",
      "a b c d e f g h i j k l m n o p q r s t u v w x y z")
    for (w <- Seq(1, 2, 3, 5)) check(edges, w)
  }

  test("property: random whitespace-y texts match for w in 1..4") {
    val wordGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("the", "a", "of", "und", "déjà", ""))
    val sepGen = Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    val textGen = for {
      n <- Gen.choose(0, 12)
      words <- Gen.listOfN(n, wordGen)
      seps <- Gen.listOfN(math.max(n - 1, 0), sepGen)
      lead <- Gen.oneOf("", " ", "\t")
      trail <- Gen.oneOf("", " ", "\n")
    } yield lead + words.zipAll(seps, "", "")
      .map { case (a, b) => a + b }.mkString + trail
    val batch = Gen.listOfN(40, textGen)
    val params = Parameters.default.withMinSuccessfulTests(8)
    val r = scCheck(params, Prop.forAll(batch, Gen.choose(1, 4)) {
      (texts: List[String], w: Int) => check(texts, w); true
    })
    assert(r.passed, r.status.toString)
  }

  test("null in, null out") {
    val got = Seq(Tuple1(Option.empty[String])).toDF("text")
      .select(word_shingles(col("text"), 3)).head()
    assert(got.isNullAt(0))
  }

  test("SQL registration: word_shingles callable from SQL") {
    GraftFunctions.register(spark)
    val out = spark.sql(
      "SELECT word_shingles('a b c d', 3) AS sh").as[Seq[String]].head()
    assert(out == Seq("a b c", "b c d"))
  }
}
