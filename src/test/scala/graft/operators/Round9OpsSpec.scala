package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-9 operators: A-ES weighted sampling, span-corruption
  * accounting, Kaplan–Meier survival, mean-shift change-point. */
class Round9OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("weightedReservoirSample: deterministic, k rows, heavier rows " +
      "overrepresented") {
    val df = (1L to 1000L).map(i => (i, if (i <= 100) 1000L else 1L))
      .toDF("doc_id", "w")
    val a = PipelineOps.weightedReservoirSample(df, "doc_id", "w", 50)
      .select("doc_id").as[Long].collect().sorted
    val b = PipelineOps.weightedReservoirSample(df, "doc_id", "w", 50)
      .select("doc_id").as[Long].collect().sorted
    assert(a.length == 50 && a.sameElements(b))
    // 100 rows carry 1000× the weight of the other 900: essentially the
    // whole sample should come from them (P[light row wins] ≈ w_l/w_h)
    assert(a.count(_ <= 100) >= 45)
  }

  test("weightedReservoirSample: zero/negative weights excluded") {
    val df = Seq((1L, 0L), (2L, -5L), (3L, 10L)).toDF("doc_id", "w")
    val out = PipelineOps.weightedReservoirSample(df, "doc_id", "w", 10)
      .select("doc_id").as[Long].collect()
    assert(out.toSeq == Seq(3L))
  }

  test("spanCorruptionPlan: span/mask accounting identities hold") {
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "solo"),
      (3L, "x y")).toDF("doc_id", "text")
    val out = PipelineOps.spanCorruptionPlan(docs, rate = 50)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    out.values.foreach { case (_, n, m, sp, in, tg) =>
      assert(m <= n && sp <= m)
      assert(in == n - m + sp && tg == m + sp)
    }
    assert(out(1L)._2 == 10L && out(2L)._2 == 1L && out(3L)._2 == 2L)
  }

  test("spanCorruptionPlan: rate 0 masks nothing") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val (n, m, sp) = PipelineOps.spanCorruptionPlan(docs, rate = 0)
      .select("n_tokens", "n_masked", "n_spans")
      .as[(Long, Long, Long)].head()
    assert((n, m, sp) == ((3L, 0L, 0L)))
  }

  test("kaplanMeier: hand-computed curve, censoring reduces risk set " +
      "without a death step") {
    // subjects: u1 converts at +10us, u2 censored at +5us (no purchase),
    // u3 converts at +10us, u4 censored at +20us
    val ev = Seq(
      (1L, "view", ts("2024-01-01 00:00:00.0")),
      (1L, "purchase", ts("2024-01-01 00:00:00.00001")),
      (2L, "view", ts("2024-01-01 00:00:00.0")),
      (2L, "click", ts("2024-01-01 00:00:00.000005")),
      (3L, "view", ts("2024-01-01 00:00:00.0")),
      (3L, "purchase", ts("2024-01-01 00:00:00.00001")),
      (4L, "view", ts("2024-01-01 00:00:00.0")),
      (4L, "click", ts("2024-01-01 00:00:00.00002"))
    ).toDF("user_id", "event_type", "ts")
    val out = AnalyticsOps.kaplanMeier(ev)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    // event times: dur=10 (d=2, n_risk=3 — u2 censored at 5 already
    // left the risk set) → ln S = ln(1/3) on the 1e-15 grid
    assert(out.length == 1)
    val (dur, d, c, n, lnS) = out(0)
    assert(dur == 10L && d == 2L && c == 0L && n == 3L)
    assert(math.abs(lnS - math.log(1.0 / 3.0)) < 1e-12)
  }

  test("kaplanMeier: total conversion at last event time pins the " +
      "-2000 log sentinel (S = 0)") {
    val ev = Seq(
      (1L, "view", ts("2024-01-01 00:00:00.0")),
      (1L, "purchase", ts("2024-01-01 00:00:00.00001"))
    ).toDF("user_id", "event_type", "ts")
    val lnS = AnalyticsOps.kaplanMeier(ev)
      .select("log_survival").as[Double].head()
    assert(lnS == -2000.0)
  }

  test("changepointMeanShift finds the exact mean-shift boundary") {
    // 30 points at 0.0 then 30 at 10.0: split must land after row 30
    val df = (1 to 60).map { i =>
      (7L, new Timestamp(1700000000000L + i * 1000L), i.toLong,
        if (i <= 30) 0.0 else 10.0)
    }.toDF("user_id", "ts", "event_id", "value")
    val (key, n, splitTs, gain) = RelationalOps
      .changepointMeanShift(df, "user_id", "ts", "event_id", "value",
        minN = 20)
      .as[(Long, Long, Timestamp, Double)].head()
    assert(key == 7L && n == 60L)
    assert(splitTs.getTime == 1700000000000L + 30 * 1000L)
    // gain = n/4 * shift² = 15 * 100
    assert(math.abs(gain - 1500.0) < 1e-9)
  }

  test("bigramLmScores: hand-computed add-k probabilities") {
    // corpus: doc1 "a b a b", doc2 "a b" → bigrams (a,b)×3, (b,a)×1
    // history counts c1(a)=3, c1(b)=1; V=2; k=0.5
    val docs = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextOps.bigramLmScores(docs)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toList
    val pAB = (3.0 + 0.5) / (3.0 + 0.5 * 2) // P(b|a) = 0.875
    val pBA = (1.0 + 0.5) / (1.0 + 0.5 * 2) // P(a|b) = 0.75
    val nll1 = -(math.log(pAB) * 2 + math.log(pBA))
    val nll2 = -math.log(pAB)
    assert(out.map(_._2) == List(3L, 1L))
    assert(math.abs(out(0)._3 - nll1) < 1e-9)
    assert(math.abs(out(1)._3 - nll2) < 1e-9)
    assert(math.abs(out(1)._4 - nll2) < 1e-9) // avg over 1 bigram
  }

  test("bigramLmScores: single-token and empty docs drop") {
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "x y"))
      .toDF("doc_id", "text")
    val ids = TextOps.bigramLmScores(docs)
      .select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(3L))
  }

  test("randomProjection: matches a hand dot product, preserves " +
      "linearity, deterministic signs") {
    val m = Similarity.jlSignMatrix(4, 4)
    val v = Array(1.0f, 2.0f, 3.0f, 4.0f)
    val df = Seq((1L, v.toSeq)).toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(df, outDims = 4, dims = 4)
      .as[(Long, Double, Double, Double, Double)].head()
    val exp = (0 until 4).map(j =>
      (0 until 4).map(i => m(j)(i) * v(i)).sum / 2.0)
    assert(math.abs(out._2 - exp(0)) < 1e-12 &&
      math.abs(out._5 - exp(3)) < 1e-12)
    // JL planes differ from the LSH planes (seed offset)
    assert(Similarity.jlSignMatrix(2, 8).flatten.toSeq !=
      Similarity.signMatrix(2, 8).flatten.toSeq)
  }

  test("kCore: clique survives, tree fringe peels, pendant into " +
      "clique does not survive") {
    // 4-clique {1,2,3,4} + path 5-6-7 hanging off node 1
    val edges = (for {
      a <- 1 to 4; b <- 1 to 4 if a < b
    } yield (a.toLong, b.toLong)) ++ Seq((1L, 5L), (5L, 6L), (6L, 7L))
    val df = edges.toDF("src", "dst")
    val out = GraphOps.kCore(df, k = 3, iters = 5)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.forall(_._2 == 3L))
  }

  test("kCore: k=2 keeps only the cycle part") {
    // triangle 1-2-3 + tail 3-4-5
    val df = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val nodes = GraphOps.kCore(df, k = 2, iters = 5)
      .select("node").as[Long].collect().sorted
    assert(nodes.toSeq == Seq(1L, 2L, 3L))
  }

  test("personalizedPageRank: mass restarts at seeds only; " +
      "non-reachable non-seeds get zero") {
    // 1→2→3, seed {1}: node 4 isolated via 4→1 edge (4 not a seed,
    // nothing points at it → pr(4) = 0)
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 1L)).toDF("src", "dst")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val pr = GraphOps.personalizedPageRank(edges, seeds, iters = 2)
      .as[(Long, Double)].collect().toMap
    assert(pr(4L) == 0.0)
    assert(pr(1L) > 0.0 && pr(2L) > 0.0)
    // restart mass: pr(1) has the (1-d) base term every iteration
    assert(math.abs(pr(1L) - 0.15) < 1e-12)
  }

  test("changepointMeanShift: keys below minN drop; constant series " +
      "has zero gain") {
    val df = ((1 to 25).map(i =>
        (1L, new Timestamp(1700000000000L + i * 1000L), i.toLong, 5.0))
      ++ (1 to 5).map(i =>
        (2L, new Timestamp(1700000000000L + i * 1000L), i.toLong, 1.0)))
      .toDF("user_id", "ts", "event_id", "value")
    val out = RelationalOps
      .changepointMeanShift(df, "user_id", "ts", "event_id", "value",
        minN = 20)
      .as[(Long, Long, Timestamp, Double)].collect()
    assert(out.length == 1 && out(0)._1 == 1L)
    assert(math.abs(out(0)._4) < 1e-9)
  }
}
