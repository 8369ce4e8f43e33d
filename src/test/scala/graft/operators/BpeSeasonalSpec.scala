package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-checked semantics for bpeMerges, seasonalDecompose, and the
  * MAD anomaly composition. */
class BpeSeasonalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("bpeMerges learns frequency-ordered merges and stops when no " +
      "pairs remain") {
    // vocab: "aa" x2, "ab" x1 -> round 1 merges (a,a) count 2;
    // round 2 merges (a,b) count 1; round 3 has nothing left
    val docs = Seq((1L, "aa ab"), (2L, "aa")).toDF("doc_id", "text")
    val m = PipelineOps.bpeMerges(docs, rounds = 3)
      .orderBy("round")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(m == Seq((1, "a", "a", 2L), (2, "a", "b", 1L)), s"got $m")
  }

  test("bpeMerges merge is greedy left-to-right non-overlapping") {
    // "aaa": pairs (a,a) x2 -> merge round 1 gives [aa, a], so round 2's
    // top pair is (aa, a) with count 1
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val m = PipelineOps.bpeMerges(docs, rounds = 2)
      .orderBy("round")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(m == Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)), s"got $m")
  }

  test("bpeEncode counts post-merge symbols per document with the " +
      "trained table") {
    // corpus: "aa ab", "aa" -> merges: r1 (a,a), r2 (a,b), r3 none.
    // After both merges: "aa" -> [aa] (1 token), "ab" -> [ab] (1).
    // doc 1 = "aa ab": 2 words, 2 tokens; doc 2 = "aa": 1 word, 1.
    val docs = Seq((1L, "aa ab"), (2L, "aa")).toDF("doc_id", "text")
    val e = PipelineOps.bpeEncode(docs, rounds = 3).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(e == Seq((1L, 2L, 2L), (2L, 1L, 1L)), s"got $e")
    // fewer rounds -> partially merged: with only round 1 trained,
    // "ab" stays [a, b] (2 tokens)
    val e1 = PipelineOps.bpeEncode(docs, rounds = 1).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(e1 == Seq((1L, 2L, 3L), (2L, 1L, 1L)), s"got $e1")
  }

  test("olsNormalEquations recovers exact-fit coefficients with r2 = 1") {
    // y = 2 + 3*x1 + 5*x2 exactly, on integer-valued features: the
    // decimal moments are exact and Cramer's rule solves exactly
    val rows = for (a <- 1 to 12; b <- 1 to 5)
      yield (a.toDouble, b.toDouble, 2.0 + 3.0 * a + 5.0 * b)
    val df = rows.toDF("x1", "x2", "y")
    val r = AnalyticsOps.olsNormalEquations(df, "y", "x1", "x2")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 == 60L)
    assert(math.abs(r._2 - 2.0) < 1e-9, s"b0=${r._2}")
    assert(math.abs(r._3 - 3.0) < 1e-9, s"b1=${r._3}")
    assert(math.abs(r._4 - 5.0) < 1e-9, s"b2=${r._4}")
    assert(math.abs(r._5 - 1.0) < 1e-12, s"r2=${r._5}")
  }

  test("seasonalDecompose: y = trend + seasonal + resid on full " +
      "windows, null trend at series edges") {
    // 21 days of one event type, value 1.0/day: trend = 1 on full
    // windows, seasonal = 0, resid = 0
    val days = (1 to 21).map { d =>
      (1L, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 12:00:00"),
        1L, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = AnalyticsOps.seasonalDecompose(days).orderBy("day")
      .select(col("y"), col("trend"), col("seasonal"), col("resid"))
      .collect()
    assert(out.length == 21)
    // edges (first/last 3 rows) have null trend
    assert(out.take(3).forall(_.isNullAt(1)) &&
      out.takeRight(3).forall(_.isNullAt(1)))
    val full = out.drop(3).dropRight(3)
    assert(full.forall(r => r.getDouble(1) == 1.0 &&
      r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0),
      s"constant series must decompose to trend 1, seasonal 0, resid 0")
  }
}
