package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mgOf(k: Int, xs: Seq[Long]): Map[Long, Long] = {
    val agg = new MisraGriesAggregator(k)
    xs.foldLeft(agg.zero)(agg.reduce)
  }

  test("MG sketch never holds more than k entries") {
    val xs = (1L to 1000L).flatMap(i => Seq.fill((i % 7).toInt + 1)(i % 40))
    assert(mgOf(5, xs).size <= 5)
  }

  test("MG estimates are within n/(k+1) of true counts (stream + merges)") {
    // skewed stream: item 0 is ~1/3 of all arrivals
    val xs = (0 until 3000).map(i => if (i % 3 == 0) 0L else (i % 50).toLong)
    val n = xs.size.toLong
    for (k <- Seq(4, 8, 16)) {
      val agg = new MisraGriesAggregator(k)
      // simulate Spark's partial aggregation: per-partition reduce, then
      // an uneven merge tree
      val parts = xs.grouped(101).toSeq
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
      val sk = parts.reduce(agg.merge)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
      assert(sk.size <= k)
      val bound = n / (k + 1)
      exact.foreach { case (item, cnt) =>
        val est = sk.getOrElse(item, 0L)
        assert(est <= cnt, s"overestimate for $item")
        assert(cnt - est <= bound, s"k=$k item=$item cnt=$cnt est=$est")
      }
      // capture guarantee: anything above the bound is present
      exact.filter(_._2 > bound).foreach { case (item, _) =>
        assert(sk.contains(item), s"k=$k heavy item $item missing")
      }
    }
  }

  test("countMin: one-sided error, exact on collision-free keys, " +
      "mergeable by counter addition") {
    import org.apache.spark.sql.functions._
    val df = ((1 to 500).map(_ => "alpha") ++ (1 to 90).map(_ => "beta")
      ++ (1 to 7).map(_ => "gamma")).toDF("k")
    val counters = Sketches.countMin(df, col("k"))
    // sketch size is bounded: at most d distinct buckets per key
    assert(counters.count() <= 12)
    val keys = Seq("alpha", "beta", "gamma").toDF("key")
    val est = Sketches.countMinEstimate(counters, keys)
      .as[(String, Long)].collect().toMap
    val exact = Map("alpha" -> 500L, "beta" -> 90L, "gamma" -> 7L)
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"CM must never underestimate ($k)")
    }
    // 3 keys in 256 buckets × 4 rows: some row is collision-free for
    // each key, so the min recovers the exact count
    assert(est === exact)

    // mergeability: sketch(A ∪ B) = counter-wise sum of the partials
    val (h1, h2) = (df.limit(300), df.exceptAll(df.limit(300)))
    val merged = Sketches.countMin(h1, col("k"))
      .unionByName(Sketches.countMin(h2, col("k")))
      .groupBy("r", "bucket").agg(sum("cnt").as("cnt"))
    val mergedRows = merged.orderBy("r", "bucket")
      .as[(Int, Long, Long)].collect().toSeq
    val directRows = counters.orderBy("r", "bucket")
      .as[(Int, Long, Long)].collect().toSeq
    assert(mergedRows === directRows)
  }

  test("blockedFuzzyMatches: near-identical names match within a " +
      "block, never across blocks") {
    val people = Seq(
      (1L, "jon smith", "NY"), (2L, "john smith", "NY"),   // dist 1
      (3L, "jon smith", "CA"),                             // other block
      (4L, "completely different", "NY")
    ).toDF("pid", "name", "state")
    val m = RelationalOps.blockedFuzzyMatches(people, "pid", "name",
        "state", maxDist = 1)
      .as[(Long, Long, Int)].collect()
    assert(m.toSeq === Seq((1L, 2L, 1)),
      "only the same-block near-duplicate pair matches")
  }

  test("blockedFuzzyMatchesD1 ≡ brute per-block scan at maxDist 1 " +
      "(substitution, insertion, deletion, no transposition leak)") {
    val people = Seq(
      (1L, "jon smith", "NY"), (2L, "john smith", "NY"),  // insertion
      (3L, "jon smitx", "NY"),                            // substitution
      (4L, "jon smit", "NY"),                             // deletion
      (5L, "njo smith", "NY"),  // transposed pair of 1: dist 2, excluded
      (6L, "jon smith", "CA"),                            // other block
      (7L, "completely different", "NY"),
      (8L, "jon smith", "NY")                             // exact dup of 1
    ).toDF("pid", "name", "state")
    val brute = RelationalOps.blockedFuzzyMatches(people, "pid", "name",
        "state", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    val fast = RelationalOps.blockedFuzzyMatchesD1(people, "pid", "name",
        "state")
      .as[(Long, Long, Int)].collect().toSet
    assert(fast === brute)
    assert(fast.contains((1L, 2L, 1)) && fast.contains((1L, 8L, 0)))
    assert(!fast.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("KLL: rank error within the 2·L·n/cap band for any merge tree") {
    // deterministic pseudo-random stream, three merge shapes: straight
    // stream, balanced two-way, and 16-chunk left fold — the bound
    // must hold for every shape (mergeable-summary contract)
    val n = 20000
    val xs: Seq[Double] = {
      var s = 12345L
      (0 until n).map { _ =>
        s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 20) % 1000000L).toDouble
      }
    }
    val sortedXs = xs.sorted
    val cap = 256
    val agg = new KllQuantileAggregator(cap, Seq(0.1, 0.5, 0.9))
    def rankOf(v: Double): Long = sortedXs.count(_ <= v).toLong
    val levels = (math.log(n.toDouble / cap) / math.log(2)).ceil + 2
    val bound = (2.0 * levels * n / cap).ceil.toLong
    val straight = xs.foldLeft(agg.zero)(agg.reduce)
    val halves = agg.merge(
      xs.take(n / 2).foldLeft(agg.zero)(agg.reduce),
      xs.drop(n / 2).foldLeft(agg.zero)(agg.reduce))
    val chunked = xs.grouped(n / 16)
      .map(_.foldLeft(agg.zero)(agg.reduce))
      .reduce(agg.merge)
    for ((state, shape) <- Seq(straight -> "straight", halves -> "2way",
        chunked -> "16chunk")) {
      assert(state.count == n)
      val ests = agg.finish(state)
      for ((q, est) <- Seq(0.1, 0.5, 0.9).zip(ests)) {
        val target = math.ceil(q * n).toLong
        val err = math.abs(rankOf(est) - target)
        assert(err <= bound,
          s"$shape q=$q: rank error $err > bound $bound")
      }
    }
  }

  test("KLL: weight is preserved by compaction and memory stays " +
      "bounded at O(cap · levels)") {
    val cap = 64
    val agg = new KllQuantileAggregator(cap, Seq(0.5))
    val state = (1 to 100000).map(_.toDouble)
      .foldLeft(agg.zero)(agg.reduce)
    val weight = state.levels.zipWithIndex
      .map { case (xs, i) => xs.size.toLong * (1L << i) }.sum
    assert(weight == state.count)
    assert(state.levels.forall(_.size <= cap + 1))
    assert(state.levels.size <=
      (math.log(100000.0 / cap) / math.log(2)).ceil.toInt + 2)
  }

  test("KLL: empty input yields NaN estimates; kllQuantiles emits " +
      "all-true bound flags on real data") {
    val agg = new KllQuantileAggregator(64, Seq(0.5))
    assert(agg.finish(agg.zero).head.isNaN)
    val df = (1 to 5000).map(i => (s"g${i % 3}", i.toDouble))
      .toDF("grp", "value")
    val out = Sketches.kllQuantiles(df, "grp", "value",
        qs = Seq(0.25, 0.75), capacity = 256)
      .collect()
    assert(out.length == 6)
    assert(out.forall(_.getAs[Boolean]("bound_ok")))
  }

  test("KLL: null and uncastable values are dropped, not a poison pill") {
    // a null in the value column used to throw inside the
    // primitive-Double typed aggregation; it must be filtered out and
    // the estimates computed over the non-null rows only
    val rows: Seq[(String, String)] =
      (1 to 200).map(i => ("g", i.toString)) ++
        Seq(("g", null), ("g", "not-a-number"))
    val df = rows.toDF("grp", "value")
    val out = Sketches.kllQuantiles(df, "grp", "value",
        qs = Seq(0.5), capacity = 64)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n") == 200L)
    assert(out.head.getAs[Boolean]("bound_ok"))
  }

  test("mgHeavyHitters emits exact counts with all-true bound flags") {
    val df = (0 until 2000)
      .map(i => if (i % 4 == 0) -1L else (i % 300).toLong)
      .toDF("item")
    val out = Sketches.mgHeavyHitters(df, org.apache.spark.sql.functions
        .col("item"), k = 8)
      .orderBy("item").collect()
    // only the planted hot key crosses n/(k+1) = 222
    assert(out.map(_.getLong(0)).toSeq === Seq(-1L))
    assert(out.head.getLong(1) === 500L)
    assert(out.forall(_.getBoolean(2)))
  }
}
