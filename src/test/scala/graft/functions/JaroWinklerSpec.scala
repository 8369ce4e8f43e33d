package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("pins the exact doubles DuckDB jaro_winkler_similarity returns") {
    // every expected value below was read off DuckDB 1.x — the oracle
    // engine — so a drift in formula or term order fails loudly here
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("CRATE", "TRACE") === 0.7333333333333334) // no common prefix
    assert(jw("shackleford", "shackelford") === 0.9818181818181818)
    assert(jw("abc", "abc") === 1.0)
  }

  test("edge semantics: empties, window-0, boost threshold") {
    assert(jw("", "") === 0.0) // DuckDB: both-empty scores 0, not 1
    assert(jw("", "abc") === 0.0 && jw("abc", "") === 0.0)
    assert(jw("a", "b") === 0.0)
    assert(jw("ab", "ba") === 0.0) // window = 0: positional match only
    // jaro = 2/3 <= 0.7 → five-byte common prefix earns NO boost
    assert(jw("prefixlong", "prefizzzzz") === 0.6666666666666666)
    // floor-halved transpositions: abc/bca inside abcdef scores with
    // t = 3/2 = 1, not 1.5 (DuckDB pins 0.944…, not 0.9166…)
    assert(jw("abcdef", "bcadef") === 0.9444444444444445)
  }

  test("byte semantics match DuckDB (multi-byte code points per byte)") {
    // 'héllo' is 6 UTF-8 bytes: m=4, jaro (4/6 + 4/5 + 1)/3 = 0.8222…,
    // then the 1-byte 'h' prefix boost — DuckDB pins 0.8400000000000001
    assert(jw("héllo", "hello") === 0.8400000000000001)
  }

  test("document-scale inputs fail fast instead of burning a core") {
    val big = "x" * (JaroWinkler.MaxInputBytes + 1)
    intercept[IllegalArgumentException](jw(big, "abc"))
  }

  test("column API and SQL registration agree with eval") {
    GraftFunctions.register(spark)
    val rows = Seq(("martha", "marhta"), ("DWAYNE", "DUANE"))
      .toDF("a", "b")
    val viaCol = rows.select(EditDistanceFunctions
        .jaro_winkler(col("a"), col("b"))).as[Double].collect().toSeq
    rows.createOrReplaceTempView("jw_in")
    val viaSql = spark.sql("SELECT jaro_winkler(a, b) FROM jw_in")
      .as[Double].collect().toSeq
    assert(viaCol === Seq(0.9611111111111111, 0.8400000000000001))
    assert(viaSql === viaCol)
  }
}
