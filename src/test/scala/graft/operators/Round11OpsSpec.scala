package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-11 batch: the ε-budget composition ledger (accounting view +
  * refusing accountant) over the DP release family, and the
  * local-level Kalman filter. */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("psiDrift: identical slices read 0, a shifted bin mix reads " +
      "the hand-computed smoothed PSI, terms are symmetric-positive") {
    // identical distributions: every smoothed cross product cancels
    val same = Seq.tabulate(120)(i =>
      (s"b${i % 3}", i % 2 == 0)).toDF("bin", "is_ref")
    val sameOut = AnalyticsOps.psiDrift(same, "bin", "is_ref")
      .select("psi_total").as[Double].head()
    assert(sameOut == 0.0)

    // shifted: ref = (30, 10), cur = (10, 30) over two bins; add-one
    // smoothing with B=2 gives p = (31/42, 11/42), q = (11/42, 31/42)
    val shifted =
      Seq.fill(30)(("a", true)) ++ Seq.fill(10)(("b", true)) ++
        Seq.fill(10)(("a", false)) ++ Seq.fill(30)(("b", false))
    val out = AnalyticsOps.psiDrift(shifted.toDF("bin", "is_ref"),
        "bin", "is_ref")
      .select("bin", "psi_term", "psi_total")
      .as[(String, Double, Double)].collect().map(r => r._1 -> r).toMap
    def lnG(x: Long): Long = math.floor(math.log(x.toDouble) * 1e12).toLong
    // term_a: (31*42 - 11*42) * (lnG(31*42) - lnG(11*42)) / 42^2 / 1e12
    val expA = (31.0 * 42 - 11 * 42) / (42.0 * 42) *
      ((lnG(31 * 42) - lnG(11 * 42)).toDouble / 1e12)
    assert(math.abs(out("a")._2 - expA) < 1e-12)
    // the mirrored bin carries the same positive term (p-q and ln
    // ratio both flip sign)
    assert(out("a")._2 > 0 && out("b")._2 > 0)
    assert(math.abs(out("a")._3 - (out("a")._2 + out("b")._2)) < 1e-12)
    // a 3:1 swap is a major shift on the conventional >0.25 read
    assert(out("a")._3 > 0.25)
  }

  test("kendallTau: monotone series read +1/-1, the tied fixture " +
      "reads the hand tau-b of 0.5") {
    def series(xs: Seq[Int], ys: Seq[Int]) =
      xs.zipWithIndex.flatMap { case (x, d) =>
        val day = java.sql.Timestamp.valueOf(
          java.time.LocalDate.of(2024, 4, 1).plusDays(d).atTime(8, 0))
        Seq.fill(x)(("view", day)) ++ Seq.fill(ys(d))(("click", day))
      }.toDF("event_type", "ts")
    def tau(xs: Seq[Int], ys: Seq[Int]): (Long, Long, Long, Double) = {
      val r = AnalyticsOps.kendallTau(series(xs, ys), "event_type",
          "ts", "view", "click")
        .select("nc", "nd", "n0", "tau_b")
        .as[(Long, Long, Long, Double)].head()
      r
    }
    // sqrt(6)*sqrt(6) != 6 in IEEE — mirror the exact tree
    val perfect = 6.0 / (math.sqrt(6.0) * math.sqrt(6.0))
    assert(tau(Seq(1, 2, 3, 4), Seq(1, 2, 3, 4)) ==
      ((6L, 0L, 6L, perfect)))
    assert(tau(Seq(1, 2, 3, 4), Seq(4, 3, 2, 1))._4 == -perfect)
    // x=(1,1,2), y=(1,2,2): nc=1 nd=0 tx=1 ty=1 -> 1/(sqrt2*sqrt2)
    val t3 = tau(Seq(1, 1, 2), Seq(1, 2, 2))
    assert(t3._1 == 1 && t3._2 == 0 && t3._3 == 3)
    assert(t3._4 == 1.0 / (math.sqrt(2.0) * math.sqrt(2.0)))
  }

  test("doubleSweepDiameter: exact on a path, exact on a star, and " +
      "honestly capped by iters") {
    def run(edges: Seq[(Long, Long)], iters: Int) =
      GraphOps.doubleSweepDiameter(
        edges.toDF("src", "dst"), iters)
        .select("seed", "ecc1", "far1", "diameter_lb", "far2")
        .as[(Long, Long, Long, Long, Long)].head()
    // path 1-2-3-4-5: both sweeps span it
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val p = run(path, iters = 8)
    assert(p == ((1L, 4L, 5L, 4L, 1L)))
    // star 0-{1..5}: first sweep ecc 1, second finds the true 2
    val star = (1L to 5L).map(i => (0L, i))
    val s2 = run(star, iters = 8)
    assert(s2._1 == 0L && s2._2 == 1L && s2._4 == 2L)
    // the cap is honest: iters=2 on the path reports 2, not 4
    assert(run(path, iters = 2)._4 == 2L)
  }

  test("tostEquivalence: identical well-powered arms prove " +
      "equivalence, an underpowered identical pair does NOT, a real " +
      "difference fails one side") {
    def arms(nA: Int, xA: Int, nB: Int, xB: Int) =
      ((0 until nA).map(i => ("g", 0, if (i < xA) 1 else 0)) ++
        (0 until nB).map(i => ("g", 1, if (i < xB) 1 else 0)))
        .toDF("grp", "arm", "succ")
    val big = AnalyticsOps.tostEquivalence(
        arms(2000, 1000, 2000, 1000), "grp", "arm", "succ")
      .select("delta", "se", "z_low", "equivalent")
      .as[(Double, Double, Double, Boolean)].head()
    val seExp = math.sqrt(0.5 * (1.0 - 0.5) / 2000 +
      0.5 * (1.0 - 0.5) / 2000)
    assert(big._1 == 0.0 && big._2 == seExp)
    assert(big._3 == (0.0 + 1.0 / 20.0) / seExp)
    assert(big._4, "4000 identical subjects prove the 5% margin")
    // same truth, tiny n: TOST correctly refuses to call equivalence
    val small = AnalyticsOps.tostEquivalence(
        arms(10, 5, 10, 5), "grp", "arm", "succ")
      .select("equivalent").as[Boolean].head()
    assert(!small, "failing to reject is NOT equivalence")
    // a real 30-point gap: the upper one-sided test fails
    val gap = AnalyticsOps.tostEquivalence(
        arms(2000, 1300, 2000, 700), "grp", "arm", "succ")
      .select("delta", "equivalent").as[(Double, Boolean)].head()
    assert(gap._1 == 0.3 && !gap._2)
  }

  test("cmhTest: the hand-computed stratified sheet — grid-exact E/V " +
      "sums, CMH chi2, the Mantel-Haenszel pooled OR, and the n=1 " +
      "stratum carrying no variance") {
    def stratum(k: Long, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)(("g", k, 0, 1)) ++ Seq.fill(b)(("g", k, 0, 0)) ++
        Seq.fill(c)(("g", k, 1, 1)) ++ Seq.fill(d)(("g", k, 1, 0))
    val rows = stratum(0L, 16, 4, 8, 12) ++ stratum(1L, 2, 8, 1, 9)
    val out = AnalyticsOps.cmhTest(
        rows.toDF("grp", "k", "arm", "succ"), "grp", "k", "arm", "succ")
      .select("n_strata", "sum_a", "expected", "variance", "chi2",
        "assoc", "or_mh")
      .as[(Long, Long, Double, Double, Double, Boolean, Double)].head()
    def g(x: Double) = math.floor(x * 1e6)
    // stratum A: n=40 E=12 V=153600/62400 adn=4.8 bcn=0.8
    // stratum B: n=20 E=1.5 V=5100/7600   adn=0.9 bcn=0.4
    val sv = g(20.0 * 20 * 24 * 16 / (40.0 * 40 * 39)) +
      g(10.0 * 10 * 3 * 17 / (20.0 * 20 * 19))
    val se = g(20.0 * 24 / 40) + g(10.0 * 3 / 20)
    assert(out._1 == 2 && out._2 == 18)
    assert(out._3 == se / 1e6 && out._4 == sv / 1e6)
    val num = 18.0 - se / 1e6
    assert(out._5 == num * num / (sv / 1e6) && out._6,
      s"hand CMH chi2 ~6.46 trips: $out")
    assert(out._7 == (g(192.0 / 40) + g(18.0 / 20)) /
      (g(32.0 / 40) + g(8.0 / 20)))
    // a single-row stratum must contribute no variance and not crash
    val withTiny = rows ++ stratum(2L, 1, 0, 0, 0)
    val t2 = AnalyticsOps.cmhTest(
        withTiny.toDF("grp", "k", "arm", "succ"), "grp", "k", "arm",
        "succ")
      .select("n_strata", "variance")
      .as[(Long, Double)].head()
    assert(t2._1 == 3 && t2._2 == out._4)
  }

  test("mutualInformation: an exact product distribution reads MI " +
      "exactly 0, a bijection reads NMI ~1 with H = ln 2, a constant " +
      "column pins NMI NaN") {
    // perfectly independent: every cell n_ij*N == n_a*n_b, so the two
    // grid logs cancel EXACTLY
    val indep = (for (a <- Seq("x", "y"); b <- Seq(0L, 1L);
      _ <- 1 to 25) yield (a, b)).toDF("a", "b")
    val i = AnalyticsOps.mutualInformation(indep, "a", "b")
      .select("mi", "nmi").as[(Double, Double)].head()
    assert(i._1 == 0.0 && i._2 == 0.0)
    // bijection: MI = H_a = H_b = ln 2 (balanced two classes)
    val bij = (Seq.fill(30)(("x", 0L)) ++ Seq.fill(30)(("y", 1L)))
      .toDF("a", "b")
    val bb = AnalyticsOps.mutualInformation(bij, "a", "b")
      .select("mi", "h_a", "h_b", "nmi")
      .as[(Double, Double, Double, Double)].head()
    assert(math.abs(bb._2 - math.log(2.0)) < 1e-9)
    assert(math.abs(bb._1 - bb._2) < 1e-9)
    assert(math.abs(bb._4 - 1.0) < 1e-9)
    // constant column: zero entropy -> NaN NMI, MI 0
    val const = Seq.fill(20)(("x", 0L)).toDF("a", "b")
    val cc = AnalyticsOps.mutualInformation(const, "a", "b")
      .select("mi", "nmi").as[(Double, Double)].head()
    assert(cc._1 == 0.0 && cc._2.isNaN)
  }

  test("localBridges: triangle edges carry their support count, the " +
      "pendant and chain edges are the bridges, a shared edge " +
      "supports two triangles") {
    // triangle {1,2,3} + second triangle {2,3,4} sharing edge (2,3),
    // pendant (4,5), chain (5,6)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val out = GraphOps.localBridges(edges)
      .select("u", "v", "support", "is_bridge")
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out.size == 7)
    assert(out((2L, 3L))._3 == 2 && !out((2L, 3L))._4,
      "the shared edge supports both triangles")
    Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)).foreach { e =>
      assert(out(e)._3 == 1 && !out(e)._4, s"$e supports one triangle")
    }
    Seq((4L, 5L), (5L, 6L)).foreach { e =>
      assert(out(e)._3 == 0 && out(e)._4, s"$e is a local bridge")
    }
  }

  test("holmStepDown: the first failing rank blocks everything after " +
      "it, even later p-values that pass their own threshold") {
    // m = 4, pDen = 100, alpha = 1/20; thresholds by rank:
    // r1: p*20*4 <= 100 -> p <= 1.25 ; r2: p*20*3 <= 100 -> p <= 1.66
    // r3: p*20*2 <= 100 -> p <= 2.5  ; r4: p*20*1 <= 100 -> p <= 5
    val sheet = Seq(("m1", 1L), ("m2", 2L), ("m3", 2L), ("m4", 4L))
      .toDF("metric", "p_num")
    val out = AnalyticsOps.holmStepDown(sheet, "metric", "p_num",
        pDen = 100L)
      .select("metric", "holm_rank", "reject")
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // ranks: m1=1 (p=1 passes), m2=2 (p=2 FAILS 1.66), m3=3, m4=4 —
    // m4's p=4 would pass its own rank-4 threshold (5) but the
    // step-down stops at rank 2
    assert(out("m1")._2 == 1 && out("m1")._3)
    assert(out("m2")._2 == 2 && !out("m2")._3)
    assert(out("m3")._2 == 3 && !out("m3")._3)
    assert(out("m4")._2 == 4 && !out("m4")._3,
      "step-down must block m4 despite its own threshold passing")
    // all-pass sheet: everything rejects
    val all = AnalyticsOps.holmStepDown(
        Seq(("a", 1L), ("b", 1L)).toDF("metric", "p_num"),
        "metric", "p_num", pDen = 100L)
      .select("reject").as[Boolean].collect()
    assert(all.forall(identity))
  }

  test("heapsLaw: an all-unique corpus fits beta exactly 1, a " +
      "saturated vocabulary fits ~0, totals line up") {
    val unique = (0 until 5).map(d =>
      (d.toLong, (0 until 10).map(i => s"w${d}_$i").mkString(" ")))
      .toDF("doc_id", "text")
    val u = AnalyticsOps.heapsLaw(unique)
      .as[(Long, Double, Double, Long, Long)].head()
    assert(u._1 == 5L && u._4 == 50L && u._5 == 50L)
    assert(u._2 == 1.0, s"cum_types == cum_tokens forces beta 1: $u")
    assert(u._3 == 0.0)
    // the same 3 words forever: no growth after doc 0
    val sat = (0 until 10).map(d => (d.toLong, "a b c"))
      .toDF("doc_id", "text")
    val s2 = AnalyticsOps.heapsLaw(sat)
      .as[(Long, Double, Double, Long, Long)].head()
    assert(s2._4 == 3L && s2._5 == 30L)
    assert(math.abs(s2._2) < 1e-9, s"saturated vocab has ~0 slope: $s2")
  }

  test("classifierEval: hand-computed confusion sheet — per-class " +
      "P/R/F1, accuracy, multiclass MCC; a never-predicted class " +
      "reads NaN precision; a one-class pool pins MCC NaN") {
    val pairs = Seq.fill(3)(("a", "a")) ++ Seq(("a", "b")) ++
      Seq.fill(2)(("b", "b")) ++ Seq(("b", "a")) ++
      Seq(("c", "c"), ("c", "a"), ("d", "a"))
    val out = AnalyticsOps.classifierEval(
        pairs.toDF("t", "p"), "t", "p")
      .select("cls", "t_k", "p_k", "tp", "precision", "recall", "f1",
        "accuracy", "mcc")
      .as[(String, Long, Long, Long, Double, Double, Double, Double,
        Double)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set("a", "b", "c", "d"))
    val a = out("a")
    assert(a._2 == 4 && a._3 == 6 && a._4 == 3)
    assert(a._5 == 3.0 / 6.0 && a._6 == 3.0 / 4.0 && a._7 == 6.0 / 10.0)
    // never-predicted class: precision NaN, recall 0, f1 0
    val d = out("d")
    assert(d._3 == 0 && d._5.isNaN && d._6 == 0.0 && d._7 == 0.0)
    // s=10, corr=6; spt=35, sp2=46, st2=30 ->
    // mcc = 25 / (sqrt(54) * sqrt(70)); accuracy = 0.6
    assert(a._8 == 6.0 / 10.0)
    assert(a._9 == 25.0 / (math.sqrt(54.0) * math.sqrt(70.0)))
    // one-class pool: accuracy 1, MCC degenerate -> NaN
    val one = AnalyticsOps.classifierEval(
        Seq.fill(5)(("x", "x")).toDF("t", "p"), "t", "p")
      .select("accuracy", "mcc").as[(Double, Double)].head()
    assert(one._1 == 1.0 && one._2.isNaN)
  }

  test("retrievalMetricsAt10: perfect front-loading reads MRR/AP/" +
      "recall 1, overflow relevance caps recall at 10/R, a barren " +
      "corpus pins the NaN/zero split") {
    // 1 doc covers 3 terms, 3 docs cover 2 -> R = 4, all in the top 4
    val docs = Seq(
      (1L, "hash scan filter pad"),
      (2L, "hash scan pad pad"), (3L, "scan filter pad pad"),
      (4L, "hash filter pad pad"),
      (5L, "hash pad pad pad"), (6L, "scan pad pad pad"),
      (7L, "filter pad pad pad"),
      (8L, "pad pad pad pad")).toDF("doc_id", "text")
    val out = AnalyticsOps.retrievalMetricsAt10(docs,
        Seq("hash", "scan", "filter"))
      .as[(Long, Long, Double, Double, Double, Double)].head()
    // (n_relevant, hits_10, mrr, p_at_10, recall_at_10, ap_10)
    assert(out == ((4L, 4L, 1.0, 0.4, 1.0, 1.0)))

    // 13 relevant docs, only 10 slots: recall = 10/13, AP stays 1
    val many = (Seq((1L, "hash scan filter pad")) ++
      (2L to 13L).map(i => (i, "hash scan pad pad")) ++
      (14L to 20L).map(i => (i, "pad pad pad pad")))
      .toDF("doc_id", "text")
    val m = AnalyticsOps.retrievalMetricsAt10(many,
        Seq("hash", "scan", "filter"))
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(m._1 == 13L && m._2 == 10L && m._3 == 1.0 && m._4 == 1.0)
    assert(m._5 == 10.0 / 13.0 && m._6 == 1.0)

    // nothing covers two terms: hits 0, mrr 0, recall/AP NaN
    val barren = Seq((1L, "hash pad"), (2L, "scan pad"))
      .toDF("doc_id", "text")
    val b = AnalyticsOps.retrievalMetricsAt10(barren,
        Seq("hash", "scan", "filter"))
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(b._1 == 0L && b._2 == 0L && b._3 == 0.0 && b._4 == 0.0)
    assert(b._5.isNaN && b._6.isNaN)
  }

  test("pageHinkley: a level DROP raises the adaptive-mean drift " +
      "statistic past the threshold the day it happens; the stable " +
      "prefix stays at exactly 0") {
    val rows = (0 until 20).map { d =>
      val ts = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 2, 1).plusDays(d).atTime(9, 0))
      ("g", ts, if (d < 10) 100.0 else 0.0)
    }
    val out = AnalyticsOps.pageHinkley(rows.toDF("grp", "ts", "v"),
        "grp", "ts", "v", delta = 0.0, lambda = 50.0)
      .select("day", "ph", "alarm")
      .as[(java.sql.Date, Double, Boolean)].collect()
      .sortBy(_._1.toString)
    assert(out.length == 20)
    // stable prefix: running mean equals the value, every term 0
    out.take(10).foreach { case (_, ph, alarm) =>
      assert(ph == 0.0 && !alarm)
    }
    // day 11: term = 0 - 1000/11 ~ -90.909; PH jumps past lambda=50
    assert(out(10)._2 > 90.0 && out(10)._2 < 91.0 && out(10)._3)
    // PH only grows while the series stays below its history
    assert(out.drop(10).map(_._2).sliding(2).forall(p => p(1) > p(0)))
    assert(out.drop(10).forall(_._3))
  }

  test("ndcgAt10: a coverage-ordered corpus scores exactly 1, the " +
      "IDCG matches the hand-computed prefix-weight decomposition") {
    // symmetric term dfs (each of hash/scan/filter in exactly 4
    // docs), equal doc lengths -> BM25 score strictly orders by
    // coverage level, so DCG = IDCG exactly
    val docs = Seq(
      (1L, "hash scan filter pad"),
      (2L, "hash scan pad pad"), (3L, "scan filter pad pad"),
      (4L, "hash filter pad pad"),
      (5L, "hash pad pad pad"), (6L, "scan pad pad pad"),
      (7L, "filter pad pad pad"),
      (8L, "pad pad pad pad"), (9L, "pad pad pad pad"),
      (10L, "pad pad pad pad"), (11L, "pad pad pad pad"),
      (12L, "pad pad pad pad")).toDF("doc_id", "text")
    val out = AnalyticsOps.ndcgAt10(docs, Seq("hash", "scan", "filter"))
      .as[(Long, Double, Double, Double)].head()
    assert(out._1 == 7L, s"7 docs carry at least one term: $out")
    // IDCG = 7*W(1) + 3*(W(4)-W(1)) + 1*(W(7)-W(4)) on the 12-dp grid
    val expIdcg = 7.0 * 1.0 + 3.0 * (2.561606311644 - 1.0) +
      (3.637999639320 - 2.561606311644)
    assert(math.abs(out._3 - expIdcg) < 1e-9, s"idcg: $out vs $expIdcg")
    assert(out._4 == 1.0, s"coverage-ordered ranking is ideal: $out")

    // no relevant docs at all: idcg = 0 -> NaN pin
    val none = Seq((1L, "pad pad"), (2L, "pad")).toDF("doc_id", "text")
    val nOut = AnalyticsOps.ndcgAt10(none, Seq("hash", "scan", "filter"))
      .as[(Long, Double, Double, Double)].head()
    assert(nOut._1 == 0L && nOut._4.isNaN)
  }

  test("quantileTreatmentEffect: interpolated per-arm quantiles and " +
      "their differences; a pure tail move is invisible at q25/q50 " +
      "but visible at the mean (the readout's whole point, inverted)") {
    val ctrl = Seq(10.0, 20.0, 30.0, 40.0, 50.0).map(("g", 0, _))
    val treat = Seq(10.0, 25.0, 35.0, 45.0, 55.0).map(("g", 1, _))
    val out = AnalyticsOps.quantileTreatmentEffect(
        (ctrl ++ treat).toDF("grp", "arm", "v"), "grp", "arm", "v")
      .select("q25_control", "q25_treat", "qte_25", "q50_control",
        "q50_treat", "qte_50", "q75_control", "q75_treat", "qte_75")
      .as[(Double, Double, Double, Double, Double, Double, Double,
        Double, Double)].head()
    assert(out == ((20.0, 25.0, 5.0, 30.0, 35.0, 5.0, 40.0, 45.0, 5.0)))

    // tail-only move: quantiles at/below q75 identical, so every QTE
    // is 0 even though the mean moved by 20 — the complementary blind
    // spot that makes running BOTH readouts the standard practice
    val tail = Seq(10.0, 20.0, 30.0, 40.0, 150.0).map(("g", 1, _))
    val t2 = AnalyticsOps.quantileTreatmentEffect(
        (ctrl ++ tail).toDF("grp", "arm", "v"), "grp", "arm", "v")
      .select("qte_25", "qte_50", "qte_75")
      .as[(Double, Double, Double)].head()
    assert(t2 == ((0.0, 0.0, 0.0)))

    // interpolation: 4 control points 0,10,20,30 -> q25 = 7.5
    val interp = AnalyticsOps.quantileTreatmentEffect(
        (Seq(0.0, 10.0, 20.0, 30.0).map(("g", 0, _)) ++
          Seq(0.0, 10.0, 20.0, 30.0).map(("g", 1, _)))
          .toDF("grp", "arm", "v"), "grp", "arm", "v")
      .select("q25_control", "qte_25").as[(Double, Double)].head()
    assert(interp == ((7.5, 0.0)))
  }

  test("weeklySpectrum: a pure week-period sinusoid reads strength " +
      "~1, a period-2 alternation reads ~0, a constant series pins " +
      "NaN, and the statistic matches a direct recomputation") {
    val cosQ = Array(1.0, 0.623489801859, -0.222520933956,
      -0.900968867902, -0.900968867902, -0.222520933956,
      0.623489801859)
    def series(f: Int => Double) = (0 until 28).flatMap { d =>
      // one event per day; day 0 = 1970-01-05 (a Monday, k = d+5... k
      // is epoch-days mod 7 — the spec only needs consistency)
      val day = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(d).atTime(12, 0))
      Seq(("g", day, f(d)))
    }.toDF("grp", "ts", "v")
    def strengthOf(df: org.apache.spark.sql.DataFrame): Double =
      AnalyticsOps.weeklySpectrum(df, "grp", "ts", "v")
        .select("weekly_strength").as[Double].head()

    val epochK = (d: Int) => ((java.time.LocalDate.of(2024, 1, 1)
      .plusDays(d).toEpochDay % 7) + 7).toInt % 7
    val pure = series(d => 100.0 + 50.0 * cosQ(epochK(d)))
    assert(strengthOf(pure) > 0.999,
      s"a pure weekly cosine must be ~fully explained: ${strengthOf(pure)}")
    val alt = series(d => if (d % 2 == 0) 150.0 else 50.0)
    assert(strengthOf(alt) < 0.05,
      s"a period-2 alternation is not weekly: ${strengthOf(alt)}")
    assert(strengthOf(series(_ => 42.0)).isNaN,
      "a constant series has no variance to explain")
  }

  test("captureRecapture: hand-computed Lincoln/Chapman estimates, " +
      "duplicate sightings collapse, disjoint windows pin Lincoln " +
      "to NaN while Chapman stays finite") {
    // A sees units 1..60, B sees 41..100 -> n1=60, n2=60, m=20; unit
    // 50 sighted THREE times in A (multiplicity must not inflate n1)
    val rows = (1 to 60).map(u => ("g", u.toLong, true, false)) ++
      Seq(("g", 50L, true, false), ("g", 50L, true, false)) ++
      (41 to 100).map(u => ("g", u.toLong, false, true))
    val out = AnalyticsOps.captureRecapture(
        rows.toDF("grp", "unit", "in_a", "in_b"),
        "grp", "unit", "in_a", "in_b")
      .select("n1", "n2", "m", "lincoln", "chapman", "se")
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(out._1 == 60 && out._2 == 60 && out._3 == 20)
    assert(out._4 == 3600.0 / 20.0)
    assert(out._5 == 61.0 * 61.0 / 21.0 - 1.0)
    assert(out._6 ==
      math.sqrt(61.0 * 61 * 40 * 40 / (21.0 * 21 * 22)))
    // disjoint windows: m = 0 -> Lincoln undefined, Chapman finite
    val disjoint = ((1 to 10).map(u => ("g", u.toLong, true, false)) ++
      (11 to 30).map(u => ("g", u.toLong, false, true)))
      .toDF("grp", "unit", "in_a", "in_b")
    val d = AnalyticsOps.captureRecapture(disjoint,
        "grp", "unit", "in_a", "in_b")
      .select("lincoln", "chapman").as[(Double, Double)].head()
    assert(d._1.isNaN && d._2 == 11.0 * 21.0 / 1.0 - 1.0)
  }

  test("oddsRatio: hand-computed Haldane-Anscombe cells, a null " +
      "table reads OR = 1 / not significant, a zero cell stays finite") {
    def table(a: Int, b: Int, c: Int, d: Int) =
      (Seq.fill(a)(("g", 0, 1)) ++ Seq.fill(b)(("g", 0, 0)) ++
        Seq.fill(c)(("g", 1, 1)) ++ Seq.fill(d)(("g", 1, 0)))
        .toDF("grp", "arm", "succ")
    // a=30 b=10 c=10 d=30 -> A=61 B=21 C=21 D=61:
    // OR = 61*61/(21*21), RR = 61*82/(21*82) = 61/21
    val out = AnalyticsOps.oddsRatio(table(30, 10, 10, 30),
        "grp", "arm", "succ")
      .select("a", "b", "c", "d", "odds_ratio", "risk_ratio",
        "se_ln_or", "significant")
      .as[(Long, Long, Long, Long, Double, Double, Double, Boolean)]
      .head()
    assert(out._1 == 30 && out._2 == 10 && out._3 == 10 && out._4 == 30)
    assert(out._5 == 3721.0 / 441.0)
    assert(out._6 == (61.0 * 82) / (21.0 * 82))
    assert(out._7 == math.sqrt(2.0 / 61 + 2.0 / 21 + 2.0 / 21 + 2.0 / 61))
    assert(out._8, "a 3:1 flip on n=80 must be significant")
    // exact null: identical arms -> OR = 1, ln 0, interval straddles
    val nul = AnalyticsOps.oddsRatio(table(20, 20, 20, 20),
        "grp", "arm", "succ")
      .select("odds_ratio", "ln_or", "significant")
      .as[(Double, Double, Boolean)].head()
    assert(nul._1 == 1.0 && nul._2 == 0.0 && !nul._3)
    // zero cell: the correction keeps everything finite
    val zc = AnalyticsOps.oddsRatio(table(20, 0, 10, 10),
        "grp", "arm", "succ")
      .select("odds_ratio", "ln_lo", "ln_hi")
      .as[(Double, Double, Double)].head()
    assert(zc._1 == (41.0 * 21) / (1.0 * 21))
    assert(!zc._2.isNaN && !zc._3.isNaN && !zc._1.isInfinite)
  }

  test("vocabRichness: the frequency-of-frequencies profile yields " +
      "the hand-computed Chao1 and Good-Turing unseen mass") {
    // tokens: a a b b b c d e -> V=5, M=8, f1=3 (c,d,e), f2=1 (a)
    val docs = Seq((1L, "A a  B"), (2L, "b b c"), (3L, "d e"))
      .toDF("doc_id", "text")
    val out = TextOps.vocabRichness(docs)
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(out._1 == 5L && out._2 == 8L && out._3 == 3L && out._4 == 1L)
    // chao1 = 5 + 3*2/(2*(1+1)) = 6.5; unseen = 3/8
    assert(out._5 == 5.0 + 6.0 / 4.0)
    assert(out._6 == 3.0 / 8.0)
    // a saturated corpus (no singletons): chao1 = V, unseen mass 0
    val sat = Seq((1L, "x x y y")).toDF("doc_id", "text")
    val satOut = TextOps.vocabRichness(sat)
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(satOut._5 == 2.0 && satOut._6 == 0.0)
  }

  test("cochranArmitage: a climbing rate trips the trend test with " +
      "the hand-cleared chi2, a flat rate reads exactly 0, a " +
      "degenerate pool pins 0") {
    // w = 0,1,2 with 10 subjects each, successes 1 -> 5 -> 9:
    // T' = 30*23 - 15*30 = 240; denom = 15*15*(30*50 - 30^2) = 135000;
    // chi2 = 240^2*30/135000 = 12.8
    def pool(xs: (Int, Int, Int)) =
      (Seq.tabulate(10)(i => ("g", 0L, if (i < xs._1) 1 else 0)) ++
        Seq.tabulate(10)(i => ("g", 1L, if (i < xs._2) 1 else 0)) ++
        Seq.tabulate(10)(i => ("g", 2L, if (i < xs._3) 1 else 0)))
        .toDF("grp", "w", "succ")
    val up = AnalyticsOps.cochranArmitage(pool((1, 5, 9)), "grp", "w", "succ")
      .select("n", "x", "chi2", "trend", "direction")
      .as[(Long, Long, Double, Boolean, Int)].head()
    assert(up._1 == 30L && up._2 == 15L)
    assert(up._3 == 240.0 * 240.0 * 30.0 / 135000.0 && up._4)
    assert(up._5 == 1)
    // mirrored fall: same chi2, direction flips
    val down = AnalyticsOps.cochranArmitage(pool((9, 5, 1)), "grp", "w", "succ")
      .select("chi2", "trend", "direction")
      .as[(Double, Boolean, Int)].head()
    assert(down._1 == up._3 && down._2 && down._3 == -1)
    // flat: numerator exactly 0
    val flat = AnalyticsOps.cochranArmitage(pool((5, 5, 5)), "grp", "w", "succ")
      .select("chi2", "trend", "direction")
      .as[(Double, Boolean, Int)].head()
    assert(flat._1 == 0.0 && !flat._2 && flat._3 == 0)
    // degenerate (every subject converts): zero variance pins 0
    val degen = AnalyticsOps.cochranArmitage(pool((10, 10, 10)), "grp", "w", "succ")
      .select("chi2", "trend").as[(Double, Boolean)].head()
    assert(degen._1 == 0.0 && !degen._2)
  }

  test("kruskalWallis: hand-computed H on a no-tie fixture, h = z^2 " +
      "against Mann-Whitney on two groups, all-tied pool pins NaN") {
    // no ties: A = {1,4}, B = {2,5}, C = {3,6} -> ranks 1..6,
    // R = (5, 7, 9); H = 12/(6*7) * (25+49+81)/2 - 3*7 = 1.142857...
    val abc = Seq(("A", 1.0), ("A", 4.0), ("B", 2.0), ("B", 5.0),
      ("C", 3.0), ("C", 6.0)).toDF("grp", "v")
    val out = AnalyticsOps.kruskalWallis(abc, "grp", "v")
      .select("grp", "n_j", "rank_sum", "h", "dof")
      .as[(String, Long, Double, Double, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("A")._3 == 5.0 && out("B")._3 == 7.0 && out("C")._3 == 9.0)
    assert(out.values.forall(_._5 == 2L))
    assert(math.abs(out("A")._4 - (12.0 / 42 * 77.5 - 21.0)) < 1e-5)

    // two groups with ties: tie-corrected H equals the square of the
    // tie-corrected Mann-Whitney z (the classical k=2 identity)
    val two = Seq(("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 5.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0), ("b", 6.0), ("b", 6.0))
      .toDF("arm", "v")
    val h2 = AnalyticsOps.kruskalWallis(two, "arm", "v")
      .select("h").as[Double].head()
    val z = AnalyticsOps.mannWhitneyU(two, "arm", "a", "b", "v")
      .select("z").as[Double].head()
    assert(math.abs(h2 - z * z) < 1e-5,
      s"k=2 KW must square the MW z: h=$h2 z^2=${z * z}")

    // fully tied: C = 0 -> NaN pin (the MW degenerate discipline)
    val tied = Seq.fill(8)(("g", 7.0)).toDF("grp", "v") union
      Seq.fill(4)(("h", 7.0)).toDF("grp", "v")
    val hTied = AnalyticsOps.kruskalWallis(tied, "grp", "v")
      .select("h").as[Double].head()
    assert(hTied.isNaN)
  }

  test("jsdDrift: identical slices read 0, the shifted mix reads the " +
      "hand-computed grid JSD, bounded by ln 2, KLs mirror") {
    val same = Seq.tabulate(120)(i =>
      (s"b${i % 3}", i % 2 == 0)).toDF("bin", "is_ref")
    val sameOut = AnalyticsOps.jsdDrift(same, "bin", "is_ref")
      .select("kl_pq", "kl_qp", "jsd_total")
      .as[(Double, Double, Double)].head()
    assert(sameOut == ((0.0, 0.0, 0.0)))

    // ref = (30, 10), cur = (10, 30): a = (31, 11), b = (11, 31),
    // N1 = N2 = 42 — a perfectly mirrored shift
    val shifted =
      Seq.fill(30)(("a", true)) ++ Seq.fill(10)(("b", true)) ++
        Seq.fill(10)(("a", false)) ++ Seq.fill(30)(("b", false))
    val out = AnalyticsOps.jsdDrift(shifted.toDF("bin", "is_ref"),
        "bin", "is_ref")
      .select("bin", "jsd_term", "kl_pq", "kl_qp", "jsd_total")
      .as[(String, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    def lnG(x: Long): Long = math.floor(math.log(x.toDouble) * 1e12).toLong
    val lnpmA = lnG(2L * 31 * 42) - lnG(31L * 42 + 11L * 42)
    val lnqmA = lnG(2L * 11 * 42) - lnG(31L * 42 + 11L * 42)
    val expTermA = (31.0 / 42 * (lnpmA.toDouble / 1e12) +
      11.0 / 42 * (lnqmA.toDouble / 1e12)) / 2
    assert(math.abs(out("a")._2 - expTermA) < 1e-12)
    // the mirrored fixture: both bins carry the same term, the two KL
    // directions agree, and the total is the term sum
    assert(out("a")._2 == out("b")._2)
    assert(out("a")._3 == out("a")._4)
    assert(math.abs(out("a")._5 - (out("a")._2 + out("b")._2)) < 1e-12)
    // JSD is bounded by ln 2 no matter the shift; this one is a real
    // but sub-maximal drift
    assert(out("a")._5 > 0.0 && out("a")._5 < 0.6931471805599453)
    // KL exceeds JSD (the unbounded vs bounded divergence ordering)
    assert(out("a")._3 > out("a")._5)
  }

  test("msprtSequential: a real effect's always-valid log_p only " +
      "falls and crosses ln(0.05); a null effect never rejects") {
    // 10 days x 40 users/day; "lift": arm 0 converts 90%, arm 1 10% —
    // overwhelming; "null": both arms convert 50% exactly
    val rows = for {
      d <- 0 until 10; u <- 0L until 40L
      arm = (u % 2).toInt
      grp <- Seq("lift", "null")
    } yield {
      val succ = if (grp == "lift") {
        if (arm == 0) (u / 2) % 10 != 0 else (u / 2) % 10 == 0
      } else (u / 2) % 2 == 0
      (grp, java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00"),
        arm, if (succ) 1 else 0)
    }
    val out = AnalyticsOps.msprtSequential(
        rows.toDF("grp", "ts", "arm", "succ"),
        "grp", "ts", "arm", "succ")
      .select("grp", "day", "log_p", "significant")
      .as[(String, java.sql.Date, Double, Boolean)].collect()
    val lift = out.filter(_._1 == "lift").sortBy(_._2.toString)
    val nul = out.filter(_._1 == "null").sortBy(_._2.toString)
    assert(lift.size == 10 && nul.size == 10)
    // always-valid: log_p is non-increasing day over day
    assert(lift.map(_._3).sliding(2).forall(p => p(1) <= p(0)))
    assert(nul.map(_._3).sliding(2).forall(p => p(1) <= p(0)))
    // the 80-point lift rejects by day 10; the exact null never does
    assert(lift.last._4, s"overwhelming effect must reject: ${lift.last}")
    assert(nul.forall(!_._4), s"exact null must never reject")
    // null keeps log_p at 0: delta = 0 makes the quadratic term 0 and
    // the ln ratio negative, so lambda never exceeds 1
    assert(nul.forall(_._3 == 0.0))
  }

  test("srmCheck: a balanced split passes, a 60/40 break on the same " +
      "n trips the guardrail with the cleared chi-square value") {
    val df = (Seq.fill(500)(("ok", 0)) ++ Seq.fill(500)(("ok", 1)) ++
      Seq.fill(600)(("broken", 0)) ++ Seq.fill(400)(("broken", 1)))
      .toDF("grp", "arm")
    val out = AnalyticsOps.srmCheck(df, "grp", "arm")
      .select("grp", "n_a", "n_b", "chi2", "srm")
      .as[(String, Long, Long, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("ok")._4 == 0.0 && !out("ok")._5)
    // d = 600*2 - 1000 = 200; chi2 = 200^2/1000 = 40 >> 3.84
    assert(out("broken")._4 == 40.0 && out("broken")._5)
  }

  test("randomizationFdr: a perfect-separation metric earns p_num=1 " +
      "and the BH rejection, a null metric earns p_num=B+1 and none") {
    // strong: success ⟺ arm A (T_obs = 1, the maximum — no random
    // reassignment can exceed it, only tie with probability ~0)
    val strong = (0L until 200L).map(u =>
      ("strong", u, if (u % 2 == 0) 1 else 0))
    // noise: success = u%4 ∈ {0,1} — half of each parity arm, so
    // T_obs = 0 and EVERY replicate exceeds (p = 65/65)
    val noise = (0L until 200L).map(u =>
      ("noise", u, if (u % 4 < 2) 1 else 0))
    val df = (strong ++ noise).toDF("event_type", "user_id", "succ")
      .withColumn("arm", pmod(col("user_id"), lit(2)).cast("int"))
    val out = AnalyticsOps.randomizationFdr(
        df, "event_type", "user_id", "arm", "succ")
      .select("grp", "n_a", "x_a", "n_b", "x_b", "p_num", "p_value",
        "bh_rank", "reject")
      .as[(String, Long, Long, Long, Long, Long, Double, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap

    val s = out("strong")
    assert((s._2, s._3, s._4, s._5) == ((100L, 100L, 100L, 0L)))
    assert(s._6 == 1L, s"perfect separation must be unmatched: $s")
    assert(s._7 == 1.0 / 65.0 && s._8 == 1L && s._9)
    val z = out("noise")
    assert((z._2, z._3, z._4, z._5) == ((100L, 50L, 100L, 50L)))
    assert(z._6 == 65L, s"T_obs=0 means every replicate exceeds: $z")
    assert(z._7 == 1.0 && z._8 == 2L && !z._9,
      // BH at q=1/20, m=2: rank 2 needs p_num·40 ≤ 130 — p_num=65 fails
      s"null metric must not be rejected: $z")
  }

  test("randomizationFdr: p_num is invariant under row duplication " +
      "(unit-level reassignment, not row-level)") {
    // duplicating every row ×3 scales all counts by 3 — T and the
    // whole p-value are ratios of those counts, so a UNIT-coin draw
    // leaves p_num fixed (a row-level coin would re-randomize)
    val base = (0L until 120L).map(u =>
      ("m", u, if ((u * 7 + 3) % 5 < 2) 1 else 0))
    def run(rows: Seq[(String, Long, Int)]): Long =
      AnalyticsOps.randomizationFdr(
          rows.toDF("event_type", "user_id", "succ")
            .withColumn("arm", pmod(col("user_id"), lit(2)).cast("int")),
          "event_type", "user_id", "arm", "succ")
        .select("p_num").as[Long].head()
    assert(run(base) == run(base ++ base ++ base))
  }

  test("kalmanLevel: matches the scalar predict/gain/update recursion, " +
      "gain converges to the steady state, variance is monotone there") {
    // one key, six days (one out of order in the input — the sort is
    // the operator's job), values chosen to move the level visibly
    val rows = Seq(
      ("k", "2024-01-02 00:00:00", 4.0),
      ("k", "2024-01-01 00:00:00", 2.0),
      ("k", "2024-01-03 00:00:00", 6.0),
      ("k", "2024-01-04 00:00:00", 5.0),
      ("k", "2024-01-05 00:00:00", 7.0),
      ("k", "2024-01-06 00:00:00", 6.5)
    ).toDF("event_type", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = AnalyticsOps.kalmanLevel(rows, "event_type", "ts", "value",
        q = 0.1, r = 1.0, p0 = 1.0)
      .select("n_days", "level", "p_var", "gain_next")
      .as[(Long, Double, Double, Double)].head()

    // scalar reference: the textbook recursion, day-sorted values
    var l = 2.0; var p = 1.0
    Seq(4.0, 6.0, 5.0, 7.0, 6.5).foreach { x =>
      val pp = p + 0.1
      val k = pp / (pp + 1.0)
      l = l + k * (x - l)
      p = (1.0 - k) * pp
    }
    assert(out._1 == 6L)
    assert(out._2 == l, s"level ${out._2} != reference $l")
    assert(out._3 == p, s"p_var ${out._3} != reference $p")
    assert(out._4 == (p + 0.1) / ((p + 0.1) + 1.0))

    // steady state of the Riccati recursion for (q=0.1, r=1):
    // P* = (−q + sqrt(q² + 4qr))/2, K* = (P*+q)/(P*+q+r); after a long
    // series the tracked gain must sit at K* (the whole point of the
    // filter: the gain is derived, not a tuned constant like EWMA's α)
    val long = (1 to 200).map(i =>
      ("k", f"2024-01-01 00:00:00", i.toDouble)).zipWithIndex
      .map { case ((t, _, v), i) =>
        (t, java.time.LocalDate.of(2024, 1, 1).plusDays(i)
          .toString + " 00:00:00", v) }
      .toDF("event_type", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val g = AnalyticsOps.kalmanLevel(long, "event_type", "ts", "value")
      .select("gain_next").as[Double].head()
    val pStar = (-0.1 + math.sqrt(0.01 + 0.4)) / 2
    val kStar = (pStar + 0.1) / (pStar + 0.1 + 1.0)
    assert(math.abs(g - kStar) < 1e-12,
      f"gain $g%.15f must converge to the Riccati fixed point $kStar%.15f")
  }

  test("jamesSteinMeans: matches the hand-computed positive-part " +
      "estimator; bigger groups shrink less; order toward grand mean") {
    // 4 groups in exact cents: means 2, 10, 6, 6; pooled within-var
    // s² = 60000/6 = 10000 cents²; grand = 6.00; S = 2·400² = 320000
    val rows = Seq(
      ("a", 1.00), ("a", 3.00),
      ("b", 9.00), ("b", 11.00),
      ("c", 5.00), ("c", 7.00),
      ("d", 6.00), ("d", 6.00), ("d", 6.00), ("d", 6.00)
    ).toDF("g", "v")
    val out = AnalyticsOps.jamesSteinMeans(rows, "g", "v")
      .select("grp", "n", "mean", "shrink", "shrunk_mean")
      .as[(String, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    // c_g = 1 − (k−3)·(s²/n_g)/S, k−3 = 1
    val cA = 1.0 - (10000.0 / 2) / 320000.0 // 63/64 = 0.984375
    val cD = 1.0 - (10000.0 / 4) / 320000.0
    assert(out("a")._3 == 2.0 && out("b")._3 == 10.0)
    assert(out("a")._4 == cA && out("b")._4 == cA)
    assert(out("d")._4 == cD)
    assert(out("d")._4 > out("a")._4, "n=4 must shrink less than n=2")
    assert(math.abs(out("a")._5 - (6.0 + cA * (2.0 - 6.0))) < 1e-12)
    assert(math.abs(out("b")._5 - (6.0 + cA * (10.0 - 6.0))) < 1e-12)
    // shrinkage is TOWARD the grand mean, never past it
    assert(out("a")._5 > 2.0 && out("a")._5 < 6.0)
    assert(out("b")._5 < 10.0 && out("b")._5 > 6.0)
    // a group already at the grand mean does not move
    assert(out("c")._5 == 6.0 && out("d")._5 == 6.0)
  }

  test("ebBetaRates: posterior means match the moment-fitted Beta " +
      "prior; high-n groups resist shrinkage; degenerate prior = raw") {
    val rows =
      (Seq.fill(1)(("a", 1)) ++ Seq.fill(9)(("a", 0)) ++   // 1/10
        Seq.fill(5)(("b", 1)) ++ Seq.fill(5)(("b", 0)) ++  // 5/10
        Seq.fill(9)(("c", 1)) ++ Seq.fill(1)(("c", 0)) ++  // 9/10
        Seq.fill(50)(("d", 1)) ++ Seq.fill(50)(("d", 0)))  // 50/100
        .toDF("g", "s")
    val out = AnalyticsOps.ebBetaRates(rows, "g", "s")
      .select("grp", "n", "x", "rate", "shrunk_rate")
      .as[(String, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    // scalar reference with the same formulas
    val ps = Seq(0.1, 0.5, 0.9, 0.5)
    val k = 4.0
    val m = ps.sum / k
    val v = (ps.map(p => p * p).sum - ps.sum * ps.sum / k) / (k - 1)
    val s0 = math.max(0.0, m * (1 - m) / v - 1)
    def shrunk(x: Long, n: Long) = (m * s0 + x) / (s0 + n)
    assert(out("a")._4 == 0.1 && out("c")._4 == 0.9)
    assert(math.abs(out("a")._5 - shrunk(1, 10)) < 1e-12)
    assert(math.abs(out("d")._5 - shrunk(50, 100)) < 1e-12)
    // extremes pull toward the ensemble mean m = 0.5
    assert(out("a")._5 > 0.1 && out("a")._5 < m)
    assert(out("c")._5 < 0.9 && out("c")._5 > m)
    // same raw rate, 10× the trials → d moves less than b
    assert(math.abs(out("d")._5 - 0.5) < math.abs(out("b")._5 - 0.5) ||
      (out("b")._5 == 0.5 && out("d")._5 == 0.5))
  }

  test("mannKendall: monotone series maxes S with the textbook " +
      "variance; an all-ties series zeroes S, variance and z") {
    def day(i: Int) =
      java.time.LocalDate.of(2024, 3, 1).plusDays(i).toString +
        " 00:00:00"
    val rows = ((0 until 5).map(i => ("up", day(i), (i + 1).toDouble)) ++
      (0 until 4).map(i => ("flat", day(i), 2.5)))
      .toDF("event_type", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val out = AnalyticsOps.mannKendall(rows)
      .select("event_type", "n_days", "s_stat", "var_s", "z")
      .as[(String, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap

    // strictly increasing, n=5: S = n(n−1)/2 = 10, no ties →
    // Var = 5·4·15/18, z = (10−1)/√Var
    val varUp = 5.0 * 4 * 15 / 18.0
    assert(out("up")._3 == 10L && out("up")._4 == varUp)
    assert(out("up")._5 == 9.0 / math.sqrt(varUp))
    // constant series: every pair ties → S = 0, and the tie term
    // t(t−1)(2t+5) with t = n cancels the variance exactly
    assert(out("flat")._3 == 0L && out("flat")._4 == 0.0 &&
      out("flat")._5 == 0.0)
  }

  test("abProportions: hand-computed pooled z; null arms and null " +
      "successes drop from counts without failing") {
    val rows = Seq(
      (0, Some(1), "g"), (0, Some(1), "g"), (0, Some(1), "g"),
      (0, Some(0), "g"),                       // arm a: 3/4
      (1, Some(1), "g"), (1, Some(0), "g"),
      (1, Some(0), "g"), (1, Some(0), "g"),    // arm b: 1/4
      (1, None, "g")                           // null success: n, not x
    ).toDF("arm", "succ", "grp")
    val out = AnalyticsOps.abProportions(rows, "grp", "arm", "succ")
      .select("n_a", "x_a", "n_b", "x_b", "p_a", "p_b", "z")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    assert(out._1 == 4 && out._2 == 3 && out._3 == 5 && out._4 == 1)
    val (pa, pb) = (3.0 / 4, 1.0 / 5)
    val pp = 4.0 / 9
    assert(out._5 == pa && out._6 == pb)
    assert(out._7 ==
      (pa - pb) / math.sqrt(pp * (1 - pp) * (1.0 / 4 + 1.0 / 5)))
    assert(out._7 > 0, "a converts better than b")
  }

  test("privacyBudget: per-salt cumulative spend in release order, " +
      "with the over-budget row flagged — never the whole ledger") {
    val ledger = Seq(
      ("a_counts", "geometric", 0.5, "dp"),
      ("b_mean", "geometric_ratio", 1.2, "dp"),
      ("a_counts", "geometric", 0.5, "other")
    ).toDF("release", "mechanism", "epsilon", "salt")
    val out = AnalyticsOps.privacyBudget(ledger, budget = 1.0)
      .select("salt", "release", "cum_epsilon", "within_budget")
      .as[(String, String, Double, Int)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq(
      ("dp", "a_counts", 0.5, 1),
      ("dp", "b_mean", 1.7, 0), // composition: 0.5 + 1.2 over budget
      ("other", "a_counts", 0.5, 1))) // independent salt: own budget
  }

  test("PrivacyAccountant refuses the release that would exceed the " +
      "budget, BEFORE it observes the data") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0)).toDF("g", "v")
    val ln2 = math.log(2.0)
    val acct = new AnalyticsOps.PrivacyAccountant(budget = 1.5)
    // ln 2 ≈ 0.693 fits; the mean's 2·ln 2 ≈ 1.386 would compose to
    // 2.079 > 1.5 on the same salt — refused loudly
    val counts = acct.noisyCounts(df, "g")
    assert(counts.count() == 2)
    assert(math.abs(acct.spent("dp") - ln2) < 1e-12)
    val e = intercept[IllegalStateException] {
      acct.noisyMean(df, "g", "v")
    }
    assert(e.getMessage.contains("over") &&
      e.getMessage.contains("budget"), e.getMessage)
    // the refused charge spent nothing and logged nothing
    assert(math.abs(acct.spent("dp") - ln2) < 1e-12)
    assert(acct.ledger(spark).count() == 1)
    // a different salt is a different budget: the same release passes
    assert(acct.noisyMean(df, "g", "v", salt = "dp2").count() == 2)
    assert(math.abs(acct.spent("dp2") - 2 * ln2) < 1e-12)
    // and its ledger view agrees with the accounting operator
    val view = AnalyticsOps.privacyBudget(acct.ledger(spark), 1.5)
      .select("salt", "within_budget").as[(String, Int)]
      .collect().toMap
    assert(view == Map("dp" -> 1, "dp2" -> 1))
  }
}
