package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AnalyticsOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("orderedFunnel counts strictly-ordered first touches only") {
    val events = Seq(
      // u1 converts fully: view < click < purchase
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // u2 clicked BEFORE first view → stops at stage 1
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 11:00:00"), "purchase"),
      // u3 views and clicks, never purchases → stage 2
      (3L, ts("2024-01-02 08:00:00"), "view"),
      (3L, ts("2024-01-02 09:00:00"), "click"),
      // u4 only purchases → stage 0, appears nowhere
      (4L, ts("2024-01-03 12:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = AnalyticsOps
      .orderedFunnel(events, Seq("view", "click", "purchase"))
      .select("stage", "stage_name", "n_users")
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(out === Array((1, "view", 3L), (2, "click", 2L),
      (3, "purchase", 1L)))
  }

  test("orderedFunnel: u2's purchase does not count (click out of order)") {
    // regression pin: stage k requires ALL earlier stages in order, not
    // just the immediately preceding one
    val events = Seq(
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 11:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = AnalyticsOps
      .orderedFunnel(events, Seq("view", "click", "purchase"))
      .select("stage", "n_users").as[(Int, Long)].collect().toMap
    assert(out === Map(1 -> 1L))
  }

  test("cohortRetention: cohort is first activity date, offsets count " +
      "distinct users once per day") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-01 23:00:00")), (2L, ts("2024-01-03 01:00:00")),
      (3L, ts("2024-01-02 09:00:00"))
    ).toDF("user_id", "ts")
    val out = AnalyticsOps.cohortRetention(events)
      .select(col("cohort_date").cast("string"), col("day_offset"),
        col("n_users"))
      .as[(String, Int, Long)].collect().toSet
    assert(out === Set(
      ("2024-01-01", 0, 2L), // u1, u2 on their first day (u1 counted once)
      ("2024-01-01", 2, 2L), // both return on day 3
      ("2024-01-02", 0, 1L)  // u3's own cohort
    ))
  }

  test("equiDepthHistogram: buckets cover all rows, sizes near-equal, " +
      "bounds ordered and value-atomic") {
    val df = (1 to 1000).map(i => i % 97).toDF("value") // ties galore
    val out = AnalyticsOps.equiDepthHistogram(df, "value", 4)
      .orderBy("bucket")
      .select("bucket", "n_values", "n_rows", "lo", "hi")
      .as[(Long, Long, Long, Int, Int)].collect()
    assert(out.map(_._3).sum === 1000L)
    assert(out.length === 4)
    // each bucket within one max-value-multiplicity of the ideal 250
    out.foreach(b => assert(math.abs(b._3 - 250L) <= 11,
      s"bucket sizes should be near-equal: $b"))
    // bounds ordered, buckets disjoint
    out.sliding(2).foreach {
      case Array(a, b) => assert(a._5 < b._4,
        s"buckets must not overlap: $a, $b")
      case _ => ()
    }
  }

  test("equiDepthHistogram rejects nRangeBuckets < 2 up front") {
    // nRangeBuckets = 1 used to build an empty percentile_approx
    // probability array and fail analysis deep inside the plan
    val df = (1 to 10).toDF("value")
    val e = intercept[IllegalArgumentException] {
      AnalyticsOps.equiDepthHistogram(df, "value", 4, nRangeBuckets = 1)
    }
    assert(e.getMessage.contains("nRangeBuckets"))
  }

  test("equiDepthHistogram: continuous doubles (distinct ~ rowcount) " +
      "equal the single-window reference exactly, any nRangeBuckets") {
    // the case the bucket decomposition exists for: every value
    // distinct, so the old formulation's ordering window carried the
    // whole relation through one task. Deterministic LCG doubles; the
    // reference is the naive global-window cumulative computed inline.
    import org.apache.spark.sql.expressions.Window
    var x = 42L
    val vals = (1 to 20000).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 11).toDouble / (1L << 53).toDouble
    }
    val df = vals.toDF("value")
    assert(df.select(col("value")).distinct().count() === 20000L)
    def reference(nBuckets: Int) = {
      val counts = df.groupBy(col("value").as("v"))
        .agg(count(lit(1)).as("n"))
      val ord = Window.orderBy(col("v"))
      counts
        .withColumn("cum_before", coalesce(sum(col("n")).over(
          ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("total", sum(col("n")).over(ord.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(expr(s"cum_before * $nBuckets div total").as("bucket"),
          col("v"), col("n"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_values"), sum(col("n")).as("n_rows"),
          min(col("v")).as("lo"), max(col("v")).as("hi"))
        .orderBy("bucket")
        .as[(Long, Long, Long, Double, Double)].collect().toSeq
    }
    // nRangeBuckets both below and above nBuckets, including a prime
    // that misaligns every splitter with the output bucket edges
    for ((nb, nrb) <- Seq((8, 3), (8, 64), (5, 7), (16, 101))) {
      val got = AnalyticsOps.equiDepthHistogram(df, "value", nb,
          nRangeBuckets = nrb)
        .orderBy("bucket")
        .as[(Long, Long, Long, Double, Double)].collect().toSeq
      assert(got === reference(nb),
        s"decomposed != single-window for nBuckets=$nb nRangeBuckets=$nrb")
    }
  }

  test("bivariateStats: exact fit on a perfect line, symmetry on noise") {
    val line = (1 to 100).map(i => ("g", i.toDouble, 3.0 * i + 7.0))
      .toDF("grp", "x", "y")
    val st = AnalyticsOps.bivariateStats(line, "grp", "x", "y")
      .select("n_rows", "corr", "slope", "intercept")
      .as[(Long, Double, Double, Double)].head()
    assert(st._1 === 100L)
    assert(math.abs(st._2 - 1.0) < 1e-12, "perfect line correlates 1")
    assert(math.abs(st._3 - 3.0) < 1e-9)
    assert(math.abs(st._4 - 7.0) < 1e-7)
    // anti-correlated line → corr -1, negative slope
    val anti = (1 to 50).map(i => ("g", i.toDouble, -2.0 * i))
      .toDF("grp", "x", "y")
    val st2 = AnalyticsOps.bivariateStats(anti, "grp", "x", "y")
      .select("corr", "slope").as[(Double, Double)].head()
    assert(math.abs(st2._1 + 1.0) < 1e-12)
    assert(math.abs(st2._2 + 2.0) < 1e-9)
  }

  test("profileNumeric: one row per column with exact counts and bounds") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, null), (2.0, 5.0), (2.0, 6.0), (3.0, null)
    ).toDF("a", "b")
    val out = AnalyticsOps.profileNumeric(df, Seq("a", "b"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect()
    assert(out === Array(
      ("a", 4L, 0L, 3L, Some(1.0), Some(3.0)),
      ("b", 4L, 2L, 2L, Some(5.0), Some(6.0))))
  }

  test("bm25: multi-term matches outrank single-term, tf saturates, " +
      "length normalization penalizes padded docs") {
    val docs = Seq(
      (0L, "spark query engine"),               // both terms, short
      (1L, "spark " + ("filler " * 40).trim),   // one term, long
      (2L, "query only here"),                  // one term
      (3L, "nothing relevant at all"),          // no match → absent
      (4L, "spark spark spark spark query")     // tf-heavy, both terms
    ).toDF("doc_id", "text")
    val out = AnalyticsOps.bm25TopDocs(docs, Seq("spark", "query"), k = 10)
      .as[(Int, Long, Int, Double)].collect()
    val byDoc = out.map(r => r._2 -> r).toMap
    assert(!byDoc.contains(3L), "no query term -> not retrieved")
    assert(byDoc(0L)._3 == 2 && byDoc(4L)._3 == 2 && byDoc(1L)._3 == 1)
    // both two-term docs above both one-term docs
    assert(Set(byDoc(0L)._1, byDoc(4L)._1) == Set(1, 2))
    // saturation: 4x tf must not give ~4x score for the spark term
    assert(byDoc(4L)._4 < byDoc(0L)._4 * 2.5)
    // length normalization: the padded doc scores below the short
    // one-term doc
    assert(byDoc(1L)._4 < byDoc(2L)._4)
  }

  test("skyline2D equals brute-force dominance filtering, any bucketing") {
    // deterministic scatter incl. equal-x and equal-y collisions
    val pts = (0 until 200).map { i =>
      (((i * 37) % 53).toDouble, ((i * 91) % 47).toDouble)
    }.toDF("px", "py")
    val brute = {
      val p = pts.distinct().as[(Double, Double)].collect()
      p.filter { case (x, y) => !p.exists { case (a, b) =>
        a <= x && b <= y && (a < x || b < y) } }.toSet
    }
    for (width <- Seq(1.0, 7.0, 1000.0)) {
      val sky = AnalyticsOps.skyline2D(pts, "px", "py", width)
        .as[(Double, Double)].collect().toSet
      assert(sky == brute, s"bucket width $width changed the frontier")
    }
  }

  test("noveltyScores: duplicates score 0, originals 1, partial between") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"), // exact dup → 0
      (2L, "totally fresh words appearing nowhere else"),
      // half old (shares 0's prefix), half new
      (3L, "alpha beta gamma delta brand new ending here")
    ).toDF("doc_id", "text")
    val out = TextOps.noveltyScores(docs)
      .select("doc_id", "novelty").as[(Long, Double)].collect().toMap
    assert(out(0L) == 1.0 && out(2L) == 1.0)
    assert(out(1L) == 0.0, "exact duplicate of an earlier doc")
    assert(out(3L) > 0.3 && out(3L) < 0.8)
  }

  test("lmFamiliarity: repeated phrasing scores 1, one-off phrasing 0, " +
      "short docs drop out") {
    val docs = Seq(
      (0L, "the quick brown fox"),
      (1L, "the quick brown fox"), // same bigrams → both fully familiar
      (2L, "completely singular phrasing here"), // every bigram unique
      (3L, "fox")                  // 1 token → no bigrams → absent
    ).toDF("doc_id", "text")
    val out = TextOps.lmFamiliarity(docs)
      .select("doc_id", "familiarity").as[(Long, Double)].collect().toMap
    assert(out.keySet === Set(0L, 1L, 2L))
    assert(out(0L) == 1.0 && out(1L) == 1.0,
      "bigrams occurring twice corpus-wide are familiar")
    assert(out(2L) == 0.0, "bigrams seen once corpus-wide are not")
  }

  test("markovTransitions: rows are P(next|current), each source state " +
      "sums to 1, counts match the raw bigram mining") {
    val ts0 = Timestamp.valueOf("2024-01-01 00:00:00")
    def t(m: Int) = new Timestamp(ts0.getTime + m * 60000L)
    val ev = Seq(
      // u1: a→b→a→c   u2: a→b
      (1L, t(0), 10L, "a"), (1L, t(1), 11L, "b"),
      (1L, t(2), 12L, "a"), (1L, t(3), 13L, "c"),
      (2L, t(0), 20L, "a"), (2L, t(1), 21L, "b")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = AnalyticsOps.markovTransitions(ev)
      .as[(String, String, Long, Double)].collect()
    val byPair = out.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // transitions: a→b ×2, b→a ×1, a→c ×1
    assert(byPair(("a", "b")) == (2L, 2.0 / 3.0))
    assert(byPair(("a", "c")) == (1L, 1.0 / 3.0))
    assert(byPair(("b", "a")) == (1L, 1.0))
    // row-stochastic: per-source probabilities sum to 1 exactly on
    // these dyadic fractions... (2/3 + 1/3 == 1.0 in IEEE here)
    val sums = out.groupBy(_._1).view.mapValues(_.map(_._4).sum)
    sums.foreach { case (_, s) => assert(math.abs(s - 1.0) < 1e-12) }
    // last event of each user contributes no transition
    assert(out.map(_._3).sum == 4L)
  }

  test("abWelch: hand-computed two-arm t statistic, n<2 arm nulls out") {
    val df = Seq(
      // group g: arm 0 = {2, 4} (mean 3, var 2), arm 1 = {1, 1, 4}
      // (mean 2, var 3) → t = 1 / sqrt(2/2 + 3/3) = 1/sqrt(2)
      ("g", 0, 2.0), ("g", 0, 4.0),
      ("g", 1, 1.0), ("g", 1, 1.0), ("g", 1, 4.0),
      // group h: arm 1 has a single row → var_b and t are null
      ("h", 0, 1.0), ("h", 0, 3.0), ("h", 1, 9.0)
    ).toDF("grp", "arm", "v")
    val out = AnalyticsOps.abWelch(df, "grp", "arm", "v")
      .select("grp", "n_a", "mean_a", "var_a", "n_b", "mean_b", "var_b",
        "t")
      .as[(String, Long, Double, Option[Double], Long, Double,
        Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    val g = out("g")
    assert(g._2 == 2L && g._3 == 3.0 && g._4.contains(2.0))
    assert(g._5 == 3L && g._6 == 2.0 && g._7.contains(3.0))
    assert(math.abs(g._8.get - 1.0 / math.sqrt(2.0)) < 1e-15)
    val h = out("h")
    assert(h._7.isEmpty && h._8.isEmpty, "single-row arm: no variance, no t")
  }

  test("gopherFilters: each rule trips on exactly its designed violation") {
    val docs = Seq(
      (0L, "the cat sat on mat"),            // passes every rule
      (1L, "xx yy"),                          // too few words
      (2L, "the the the the"),                // repetition rule
      (3L, "supercalifragilistic is he now"), // mean word length high
      (4L, "zz qq ww ee rr"),                 // no stopwords
      (5L, "   ")                             // tokenless → absent
    ).toDF("doc_id", "text")
    val out = TextOps.gopherFilters(docs, minWords = 3, maxWords = 6,
        minMeanLen = 2.0, maxMeanLen = 5.0, minStopRatio = 0.1,
        maxTopTokenRatio = 0.5)
      .select("doc_id", "ok_words", "ok_word_len", "ok_stop", "ok_rep",
        "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.keySet === Set(0L, 1L, 2L, 3L, 4L))
    assert(out(0L) === ((0L, true, true, true, true, true)))
    assert(!out(1L)._2 && !out(1L)._6, "word-count rule")
    assert(!out(2L)._5 && !out(2L)._6, "repetition rule")
    assert(!out(3L)._3 && !out(3L)._6, "mean-word-length rule")
    assert(!out(4L)._4 && !out(4L)._6, "stopword rule")
  }

  test("concentrationIndex: monopoly group scores 1, uniform two-user " +
      "group scores 1/2") {
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 1L), // one user owns type a
      ("b", 2L), ("b", 3L)             // type b split evenly
    ).toDF("event_type", "user_id")
    val out = AnalyticsOps.concentrationIndex(df, "event_type", "user_id")
      .select("event_type", "n_units", "total", "sum_sq", "hhi")
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") === (("a", 1L, 3L, 9L, 1.0)))
    assert(out("b") === (("b", 2L, 2L, 2L, 0.5)))
  }

  test("seasonalityProfile: dow is 1=Sunday and shares sum to 1 per type") {
    val ev = Seq(
      // 2024-01-07 is a Sunday, 2024-01-08 a Monday
      ("x", ts("2024-01-07 10:00:00")), ("x", ts("2024-01-07 11:00:00")),
      ("x", ts("2024-01-08 10:00:00")),
      ("y", ts("2024-01-08 09:00:00"))
    ).toDF("event_type", "ts")
    val out = AnalyticsOps.seasonalityProfile(ev)
      .as[(String, Long, Long, Double)].collect()
    val byCell = out.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(byCell(("x", 1L)) === ((2L, 2.0 / 3.0)))
    assert(byCell(("x", 2L)) === ((1L, 1.0 / 3.0)))
    assert(byCell(("y", 2L)) === ((1L, 1.0)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-12) }
  }

  test("topTermsPerDoc ranks rare-but-frequent terms above ubiquitous ones") {
    val docs = Seq(
      (0L, "alpha alpha alpha the the common"),
      (1L, "the common beta beta"),
      (2L, "the common gamma")
    ).toDF("doc_id", "text")
    val top1 = AnalyticsOps.topTermsPerDoc(docs, k = 1)
      .select("doc_id", "token").as[(Long, String)].collect().toMap
    // "the"/"common" appear in every doc (df=3) → crushed by idf;
    // each doc's unique term wins
    assert(top1 === Map(0L -> "alpha", 1L -> "beta", 2L -> "gamma"))
  }
}
