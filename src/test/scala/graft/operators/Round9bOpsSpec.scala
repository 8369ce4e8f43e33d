package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-9 batch 2: HITS, multi-source BFS, ACF/CCF, Benford,
  * t-closeness, Mann–Whitney U, RFM segmentation. */
class Round9bOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hits: star graph — center is the sole authority, leaves the " +
      "hubs; L1 norms hold") {
    // 1→0, 2→0, 3→0: node 0 has all authority, leaves share hub mass
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val out = GraphOps.hits(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(math.abs(out(0L)._2 - 1.0) < 1e-12) // all authority
    assert(out(0L)._1 == 0.0)                  // no hub score
    Seq(1L, 2L, 3L).foreach { n =>
      assert(math.abs(out(n)._1 - 1.0 / 3) < 1e-12)
      assert(out(n)._2 == 0.0)
    }
    assert(math.abs(out.values.map(_._1).sum - 1.0) < 1e-9)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-9)
  }

  test("shortestHops: exact hop distances on a path, unreached absent") {
    // path 0-1-2-3-4, isolated edge 10-11; seed = 0
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("node")
    val out = GraphOps.shortestHops(edges, seeds, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("shortestHops: multi-source takes the nearer seed") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val out = GraphOps.shortestHops(edges, Seq(0L, 4L).toDF("node"),
        iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(2L) == 2L && out(3L) == 1L && out(1L) == 1L)
  }

  test("autocorrelation: alternating daily series has ACF(1) ≈ -1, " +
      "ACF(2) ≈ +1 shape") {
    // 8 days alternating 10,20 → strong negative lag-1, positive lag-2
    val rows = (0 until 8).flatMap { d =>
      val n = if (d % 2 == 0) 1 else 3
      (0 until n).map(i => ("a", ts(f"2024-01-${d + 1}%02d 00:00:0$i")))
    }
    val df = rows.toDF("event_type", "ts")
    val acf = AnalyticsOps.autocorrelation(df, maxLag = 2)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(acf(1L) < -0.8 && acf(2L) > 0.7)
  }

  test("crossCorrelation: y = x shifted by 1 day peaks at lag 1") {
    val xDays = Seq(1, 3, 1, 5, 1, 4, 1, 2) // view counts per day
    val rows = xDays.zipWithIndex.flatMap { case (n, d) =>
      (0 until n).map(i =>
        ("view", ts(f"2024-01-${d + 1}%02d 00:00:${i}%02d"))) ++
        // purchases replay the view counts one day later
        (if (d + 1 < 8) (0 until n).map(i =>
          ("purchase", ts(f"2024-01-${d + 2}%02d 01:00:${i}%02d")))
         else Nil)
    }
    val ccf = AnalyticsOps.crossCorrelation(rows.toDF("event_type", "ts"),
        "view", "purchase", maxLag = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ccf(1L) > 0.85, s"lag-1 should dominate: $ccf")
    assert(ccf(1L) > ccf(0L) && ccf(1L) > ccf(2L))
  }

  test("benfordDeviation: leading digit parsed from the decimal " +
      "rendering; probabilities sum to 1") {
    val df = Seq(123.45, 0.042, 987.0, 19999.99, 2.5, 3.14159)
      .toDF("v")
    val out = AnalyticsOps.benfordDeviation(df, "v").collect()
    val byDigit = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    // 0.042 → "0.04" → leading digit 4; 3.14159 → "3.14" → 3
    assert(byDigit == Map("1" -> 2L, "2" -> 1L, "3" -> 1L, "4" -> 1L,
      "9" -> 1L))
    assert(math.abs(out.map(_.getDouble(2)).sum - 1.0) < 1e-12)
    out.foreach(r => assert(r.getDouble(4) >= 0.0)) // chi2 terms
  }

  test("tCloseness: a class mirroring the global distribution scores " +
      "0; a degenerate class scores its TVD exactly") {
    // global sensitive distribution: a:2, b:2 → p = (1/2, 1/2)
    // class g1 mirrors it → t = 0; class g2 = all 'a' → TVD = 1/2
    val df = Seq(("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "a"))
      .toDF("qi", "s")
    // careful: the global marginal here is a:3, b:1 → p=(3/4, 1/4);
    // g1=(1/2,1/2): TVD = 1/2·(|1/2−3/4|+|1/2−1/4|) = 1/4
    // g2=(1,0):     TVD = 1/2·(|1−3/4|+|0−1/4|)     = 1/4
    val out = AnalyticsOps.tCloseness(df, Seq("qi"), "s")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(out("g1") - 0.25) < 1e-12)
    assert(math.abs(out("g2") - 0.25) < 1e-12)
  }

  test("mannWhitneyU: disjoint arms give the extreme U; ties handled " +
      "by midranks") {
    // arm A values all below arm B: U1 = 0
    val df = (Seq.fill(5)("view").zip(Seq(1.0, 2.0, 3.0, 4.0, 5.0)) ++
        Seq.fill(5)("click").zip(Seq(6.0, 7.0, 8.0, 9.0, 10.0)))
      .toDF("event_type", "value")
    val r = AnalyticsOps.mannWhitneyU(df, "event_type", "view", "click",
      "value").collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 0.0) // U1 = R1 − n1(n1+1)/2 = 15 − 15
    assert(r.getDouble(4) < -2.0) // strongly negative z
    // all-tied arms: U1 = n1·n2/2, z = NaN (zero variance)
    val tied = Seq(("view", 1.0), ("view", 1.0), ("click", 1.0),
      ("click", 1.0)).toDF("event_type", "value")
    val rt = AnalyticsOps.mannWhitneyU(tied, "event_type", "view",
      "click", "value").collect().head
    assert(rt.getDouble(2) == 2.0) // midranks: R1 = 2·2.5 = 5; U1 = 5−3
  }

  test("kmvDistinct: exact below k, estimate within the KMV error " +
      "band above; sketch merge-order-independent") {
    val small = (1 to 40).map(i => ("a", i.toLong)).toDF("grp", "v")
    val rs = Sketches.kmvDistinct(small, "grp", "v", k = 64)
      .collect().head
    assert(rs.getLong(1) == 40L)            // n_kept = all 40
    assert(rs.getDouble(3) == 40.0)         // est = exact
    assert(rs.getLong(4) == 40L)
    val big = (1 to 20000).map(i => ("a", i.toLong)).toDF("grp", "v")
    val rb = Sketches.kmvDistinct(big, "grp", "v", k = 64)
      .collect().head
    // KMV relative error ~ 1/sqrt(k-1) ≈ 12.6%; allow 4σ
    assert(math.abs(rb.getDouble(3) - 20000.0) / 20000.0 < 0.5,
      s"estimate ${rb.getDouble(3)} too far from 20000")
    assert(rb.getLong(4) == 20000L)
  }

  test("KmvAggregator: reduce/merge keep the k smallest distinct, " +
      "any merge tree") {
    val agg = new graft.operators.KmvAggregator(4)
    val a = Seq(5L, 1L, 9L, 1L, 7L).foldLeft(agg.zero)(agg.reduce)
    assert(a == Seq(1L, 5L, 7L, 9L))
    val b = Seq(2L, 8L, 3L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(a, b) == Seq(1L, 2L, 3L, 5L))
    assert(agg.merge(b, a) == agg.merge(a, b)) // commutative
  }

  test("kmvSetOps: disjoint small arms — union adds, intersection 0; " +
      "identical arms intersect fully") {
    val df = ((1 to 30).map(i => ("view", i.toLong)) ++
      (101 to 130).map(i => ("click", i.toLong))).toDF("arm", "v")
    val r = Sketches.kmvSetOps(df, "arm", "v", "view", "click", k = 64)
      .collect().head
    assert(r.getDouble(4) == 60.0)  // est_union exact below k
    assert(r.getLong(5) == 0L)      // n_common
    assert(r.getDouble(7) == 0.0)   // est_inter
    val same = ((1 to 30) ++ (1 to 30)).zipWithIndex.map { case (v, i) =>
      (if (i < 30) "view" else "click", v.toLong)
    }.toDF("arm", "v")
    val r2 = Sketches.kmvSetOps(same, "arm", "v", "view", "click", 64)
      .collect().head
    assert(r2.getDouble(4) == 30.0 && r2.getDouble(7) == 30.0)
  }

  test("chiSquare: independent uniform grid has zero statistic; " +
      "zero cells carry expected mass") {
    val ind = (for { a <- Seq("x", "y"); b <- Seq(0L, 1L); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val out = AnalyticsOps.chiSquare(ind, "a", "b").collect()
    assert(out.length == 4)
    out.foreach(r => assert(r.getDouble(6) == 0.0)) // perfect fit
    // degenerate association: (x,0) and (y,1) only → zero cells appear
    val dep = (Seq.fill(5)(("x", 0L)) ++ Seq.fill(5)(("y", 1L)))
      .toDF("a", "b")
    val grid = AnalyticsOps.chiSquare(dep, "a", "b").collect()
    assert(grid.length == 4)
    val zeroCell = grid.find(r => r.getString(0) == "x" &&
      r.getLong(1) == 1L).get
    assert(zeroCell.getLong(2) == 0L && zeroCell.getDouble(5) == 2.5)
  }

  test("modularity: two cliques joined by one edge score high; the " +
      "everything-in-one-community partition scores ~0") {
    val clique = (g: Seq[Long]) =>
      for { a <- g; b <- g if a < b } yield (a, b)
    val edges = (clique(Seq(0L, 1L, 2L, 3L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ (3L, 10L)).toDF("src", "dst")
    val goodLabels = (0L to 3L).map(n => (n, 0L))
      .++((10L to 13L).map(n => (n, 1L))).toDF("node", "label")
    val q = GraphOps.modularity(edges, goodLabels)
      .agg(sum("contribution")).collect().head.getDouble(0)
    assert(q > 0.3, s"two-clique partition should score high: $q")
    val oneLabels = (Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L, 13L))
      .map(n => (n, 0L)).toDF("node", "label")
    val q1 = GraphOps.modularity(edges, oneLabels)
      .agg(sum("contribution")).collect().head.getDouble(0)
    assert(math.abs(q1) < 1e-12, s"trivial partition: $q1")
  }

  test("silhouetteScores: tight well-separated clusters score near 1") {
    // two tight clusters far apart in 4-d; k=2, enough vectors that the
    // first-2 init seeds one point in each... (ids 0,1 are both cluster
    // A, so let ids alternate clusters to seed both)
    val vecs = (0 until 40).map { i =>
      val base = if (i % 2 == 0) 0.0f else 10.0f
      val eps = (i % 5) * 0.01f
      (i.toLong, Array(base + eps, base, base, base))
    }.toDF("vec_id", "embedding")
    val out = Similarity.silhouetteScores(vecs, k = 2, iters = 2)
      .collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getLong(1) == 20L)
      assert(r.getDouble(2) > 0.99,
        s"tight separated clusters should score ~1: ${r.getDouble(2)}")
    }
  }

  test("anovaF: identical group means give F ≈ 0; separated means " +
      "give a large F") {
    val same = (Seq.fill(10)("a") ++ Seq.fill(10)("b")).zipWithIndex
      .map { case (g, i) => (g, (i % 10).toDouble) }
      .toDF("grp", "v")
    val f0 = AnalyticsOps.anovaF(same, "grp", "v").collect().head
    assert(f0.getLong(0) == 2L && f0.getLong(1) == 20L)
    assert(math.abs(f0.getDouble(2)) < 1e-9)
    val sep = (Seq.fill(10)(("a", 1.0)) ++ Seq.fill(10)(("b", 100.0)) ++
      Seq(("a", 2.0), ("b", 99.0))).toDF("grp", "v")
    val f1 = AnalyticsOps.anovaF(sep, "grp", "v").collect().head
    assert(f1.getDouble(2) > 1000.0, s"separated means: ${f1.getDouble(2)}")
  }

  test("ksTest: identical samples give D = 0, disjoint supports D = 1") {
    val same = ((1 to 20).map(i => ("view", i.toDouble)) ++
      (1 to 20).map(i => ("click", i.toDouble)))
      .toDF("event_type", "value")
    val d0 = AnalyticsOps.ksTest(same, "event_type", "view", "click",
      "value").collect().head
    assert(d0.getLong(0) == 20L && d0.getLong(1) == 20L)
    assert(d0.getDouble(3) == 0.0)
    val disj = ((1 to 10).map(i => ("view", i.toDouble)) ++
      (100 to 109).map(i => ("click", i.toDouble)))
      .toDF("event_type", "value")
    val d1 = AnalyticsOps.ksTest(disj, "event_type", "view", "click",
      "value").collect().head
    assert(d1.getDouble(3) == 1.0) // view fully below click
  }

  test("rfmSegments: quartile buckets follow the rows-below rank; " +
      "ties share a bucket") {
    val orders = (1 to 8).map { k =>
      (k.toLong, java.sql.Date.valueOf(f"1998-01-0${k}%d"),
        k * 100.0)
    }.flatMap { case (c, d, p) =>
      // customer k places k orders of p total on day d
      (1 to c.toInt).map(_ => (c, d, p))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = AnalyticsOps.rfmSegments(orders, "1998-12-01")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // frequency ascending 1..8 → buckets 0,0,1,1,2,2,3,3
    assert(out(1L)._2 == 0L && out(8L)._2 == 3L)
    assert(out(4L)._2 == 1L && out(5L)._2 == 2L)
    // recency: later order date = smaller recency_days; customer 8
    // (latest) lands in bucket 0 of recency, customer 1 in bucket 3
    assert(out(8L)._1 == 0L && out(1L)._1 == 3L)
  }
}
