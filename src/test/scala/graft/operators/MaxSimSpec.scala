package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Late-interaction (multi-vector / MaxSim) retrieval: hand-computed
  * truth on a tiny corpus, bit-equality of the pruned arm against the
  * brute arm when the probe covers every cell (the fixed-order pivot
  * sum is what makes that equality exact under different
  * partitionings), sub-quadratic candidate evidence, and parameter
  * validation. */
class MaxSimSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Variable-token-count docs (2..4 tokens of dim 4), one dominant
    * axis per id so rankings are stable and no token is zero. */
  private def docsDf(n: Int) = {
    val rows = (0 until n).map { i =>
      val id = i.toLong
      val toks = Seq.tabulate(2 + (i % 3))(p =>
        Seq.tabulate(4)(d =>
          (((id * 7 + p * 3 + d * 5) % 11).toFloat - 5f) / 3f +
            (if (d == (id % 4).toInt) 4f else 0f)))
      (id, toks)
    }
    rows.toDF("vec_id", "tokens")
  }

  /** Fixed-budget queries: exactly `qTokens` tokens each, ids
    * disjoint from the docs. */
  private def queriesDf(n: Int, qTokens: Int, idOffset: Long) = {
    val rows = (0 until n).map { i =>
      val id = idOffset + i
      val toks = Seq.tabulate(qTokens)(p =>
        Seq.tabulate(4)(d =>
          (((id * 13 + p * 5 + d * 3) % 7).toFloat - 3f) / 2f +
            (if (d == ((id + p) % 4).toInt) 4f else 0f)))
      (id, toks)
    }
    rows.toDF("vec_id", "tokens")
  }

  test("maxSimTopK equals the hand-computed MaxSim on a tiny corpus " +
      "(score = sum over query tokens of the max cosine over doc " +
      "tokens; ranking ties broken by neighbor id)") {
    val docs = Seq(
      (10L, Seq(Seq(1f, 0f, 0f, 0f))),
      (11L, Seq(Seq(0f, 1f, 0f, 0f), Seq(1f, 1f, 0f, 0f))),
      (12L, Seq(Seq(0f, 0f, 1f, 0f)))
    ).toDF("vec_id", "tokens")
    val q = Seq(
      (0L, Seq(Seq(1f, 0f, 0f, 0f), Seq(0f, 1f, 0f, 0f)))
    ).toDF("vec_id", "tokens")
    val res = Similarity.maxSimTopK(docs, q, k = 3, qTokens = 2)
      .orderBy("rank")
      .select("query_id", "rank", "neighbor_id", "maxsim")
      .as[(Long, Int, Long, Double)].collect()
    // doc 11: max cos vs q0 = 1/sqrt2 (from (1,1)), vs q1 = 1  → 1.707
    // doc 10: 1 + 0 = 1;  doc 12: 0 + 0 = 0
    assert(res.map(r => (r._2, r._3)).toSeq ==
      Seq((1, 11L), (2, 10L), (3, 12L)))
    assert(math.abs(res(0)._4 - (1.0 + 1.0 / math.sqrt(2.0))) < 1e-12)
    assert(math.abs(res(1)._4 - 1.0) < 1e-12)
    assert(math.abs(res(2)._4 - 0.0) < 1e-12)
  }

  test("maxSimTopKPruned with the probe covering EVERY cell is " +
      "bit-identical to the brute arm (the fixed-order pivot sum " +
      "keeps the double score reproducible across the two different " +
      "plans), and a narrow probe is strictly sub-quadratic") {
    val docs = docsDf(48)
    val q = queriesDf(4, qTokens = 3, idOffset = 1000L)
    val brute = Similarity.maxSimTopK(docs, q, k = 5, qTokens = 3)
      .select("query_id", "rank", "neighbor_id", "maxsim")
      .as[(Long, Int, Long, Double)].collect().toSet
    val (allRes, allCand, full) = Similarity.maxSimTopKPruned(docs, q,
      k = 5, qTokens = 3, nCells = 8, nProbe = 8)
    val got = allRes.select("query_id", "rank", "neighbor_id", "maxsim")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(got == brute,
      s"full-probe pruned MaxSim must equal brute bit-for-bit " +
        s"(${got.size} vs ${brute.size})")
    assert(allCand == full - 0L,
      s"an all-cells probe reaches every (q, d) pair: $allCand vs $full")
    val (narrowRes, cand, full2) = Similarity.maxSimTopKPruned(docs, q,
      k = 5, qTokens = 3, nCells = 8, nProbe = 1)
    assert(cand < full2,
      s"a 1-cell probe must be sub-quadratic: $cand vs $full2")
    // the pruned ranking is drawn from candidates only, but every
    // returned neighbor is a real doc and ranks are dense per query
    val rows = narrowRes.select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect()
    assert(rows.nonEmpty && rows.forall(r => r._3 < 48L))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.sameElements(1 to rs.length)) }
  }

  test("parameter validation: nProbe >= 1; the deterministic token " +
      "codebook refuses a corpus with fewer tokens than nCells; a " +
      "query off the declared token budget refuses loudly (more " +
      "tokens would silently truncate the sum, fewer would null it)") {
    val docs = docsDf(4) // 2+3+4+2 = 11 tokens
    val q = queriesDf(1, qTokens = 3, idOffset = 1000L)
    val e1 = intercept[IllegalArgumentException] {
      Similarity.maxSimTopKPruned(docs, q, nProbe = 0)
    }
    assert(e1.getMessage.contains("nProbe"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.maxSimTopKPruned(docs, q, qTokens = 3, nCells = 64)
    }
    assert(e2.getMessage.contains("codebook"))
    val e3 = intercept[IllegalArgumentException] {
      Similarity.maxSimTopK(docs, q, qTokens = 4)
    }
    assert(e3.getMessage.contains("qTokens"))
    val e4 = intercept[IllegalArgumentException] {
      Similarity.maxSimTopKPruned(docs, q, qTokens = 2, nCells = 8)
    }
    assert(e4.getMessage.contains("qTokens"))
  }
}
