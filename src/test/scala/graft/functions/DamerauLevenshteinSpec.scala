package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DamerauLevenshteinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def d(a: String, b: String): Int =
    DamerauLevenshtein.distance(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("full DL, not the OSA shortcut") {
    // the canonical discriminator: OSA says 3, true DL says 2
    assert(d("CA", "ABC") === 2)
    assert(d("ab", "ba") === 1) // one transposition, lev would say 2
    assert(d("abc", "acb") === 1)
    assert(d("abcdef", "abcdef") === 0)
    assert(d("", "abc") === 3 && d("abc", "") === 3 && d("", "") === 0)
    assert(d("kitten", "sitting") === 3) // degenerates to levenshtein
  }

  test("byte semantics match DuckDB (multi-byte code points per byte)") {
    assert(d("héllo", "hello") === 2) // é is two UTF-8 bytes
  }

  test("column API and SQL registration agree with eval") {
    GraftFunctions.register(spark)
    val rows = Seq(("ab", "ba"), ("CA", "ABC"), ("same", "same"))
      .toDF("a", "b")
    val viaCol = rows.select(EditDistanceFunctions
        .damerau_levenshtein(col("a"), col("b"))).as[Int].collect().toSeq
    rows.createOrReplaceTempView("dl_in")
    val viaSql = spark.sql(
        "SELECT damerau_levenshtein(a, b) FROM dl_in")
      .as[Int].collect().toSeq
    assert(viaCol === Seq(1, 2, 0) && viaSql === viaCol)
  }

  test("document-scale inputs fail fast instead of OOMing the executor") {
    val big = "x" * (DamerauLevenshtein.MaxInputBytes + 1)
    val ex = intercept[IllegalArgumentException] { d(big, "short") }
    assert(ex.getMessage.contains("capped"))
    // at the cap itself the DP still runs
    assert(d("x" * 100, "x" * 100) === 0)
  }

  test("transposition-aware blocking catches what levenshtein misses") {
    val names = Seq((1L, "acme corp"), (2L, "amce corp"), (3L, "zenith"))
      .toDF("id", "name")
    val out = names.as("a").join(names.as("b"),
        col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        EditDistanceFunctions.damerau_levenshtein(
          col("a.name"), col("b.name")).as("dl"),
        levenshtein(col("a.name"), col("b.name")).as("lev"))
      .where(col("dl") <= 1)
      .as[(Long, Long, Int, Int)].collect()
    assert(out.toSeq === Seq((1L, 2L, 1, 2))) // dl=1 admits, lev=2 would not
  }
}
