package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Maximal repeated substring spans (exact substring dedup): the
  * gram-run reduction checked against a direct O(n²·len) brute force
  * that enumerates every maximal equality run per doc pair. */
class MaximalSpanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute force: for a doc pair, walk every diagonal and emit each
    * maximal run of equal chars with length >= minLen. */
  private def bruteSpans(docs: Seq[(Long, String)], minLen: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    val out = scala.collection.mutable.Set
      .empty[(Long, Long, Long, Long, Long)]
    for {
      (ida, a) <- docs; (idb, b) <- docs if ida < idb
      diag <- -(b.length - 1) to (a.length - 1)
    } {
      var i = math.max(0, diag)
      val iEnd = math.min(a.length, b.length + diag)
      while (i < iEnd) {
        if (a(i) == b(i - diag)) {
          val start = i
          while (i < iEnd && a(i) == b(i - diag)) i += 1
          val len = i - start
          if (len >= minLen)
            out += ((ida, idb, start.toLong, (start - diag).toLong,
              len.toLong))
        } else i += 1
      }
    }
    out.toSet
  }

  private def run(docs: Seq[(Long, String)], minLen: Int)
      : Set[(Long, Long, Long, Long, Long)] =
    Dedup.maximalSubstringSpans(docs.toDF("doc_id", "text"), minLen)
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("equivalence to brute force on handcrafted overlap structures") {
    val boiler = "All rights reserved under the License."
    val docs = Seq[(Long, String)](
      // identical docs -> one full-length span
      (1L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (2L, "the quick brown fox jumps over the lazy dog repeatedly"),
      // shared prefix, divergent tail
      (3L, "the quick brown fox jumps over the lazy dog but stops"),
      // internal boilerplate shared at different offsets
      (4L, "XX " + boiler + " unique tail content here 4444444"),
      (5L, "completely different head. " + boiler + " tail 5"),
      // two separate spans between the same pair (split by a 1-char
      // edit) — must emit TWO maximal spans, not one merged; the halves
      // are self-dissimilar (all-distinct chars) so no off-diagonal
      // matches muddy the expectation
      (6L, "ABCDEFGHIJKLMNOPQRSTZ0123456789!@#$%^&*()"),
      (7L, "ABCDEFGHIJKLMNOPQRSTY0123456789!@#$%^&*()"),
      // repeated motif -> multiple diagonals between one pair
      (8L, "abcabcabcabcabcabcabcabc"),
      (9L, "abcabcabcabcabcabcabc"),
      // short doc below minLen: contributes nothing
      (10L, "tiny"))
    for (minLen <- Seq(8, 12, 20)) {
      val expected = bruteSpans(docs, minLen)
      val got = run(docs, minLen)
      assert(got === expected, s"minLen=$minLen")
      assert(expected.nonEmpty, s"fixture must exercise minLen=$minLen")
    }
    // the split pair produced exactly two spans of 20 at minLen=8
    val spans67 = run(docs, 8).filter(t => t._1 == 6L && t._2 == 7L)
    assert(spans67 === Set((6L, 7L, 0L, 0L, 20L),
      (6L, 7L, 21L, 21L, 20L)))
  }

  test("spans are maximal: never extendable, never sub-minLen") {
    val docs = Seq[(Long, String)](
      (1L, "prefix SHARED-MIDDLE-SECTION-HERE suffix one"),
      (2L, "other SHARED-MIDDLE-SECTION-HERE ending two"),
      (3L, "no overlap at all in this one zzzzzzzzzzzz"))
    val byId = docs.toMap
    val got = run(docs, 10)
    assert(got.nonEmpty)
    got.foreach { case (ia, ib, sa, sb, len) =>
      val (a, b) = (byId(ia), byId(ib))
      assert(len >= 10)
      assert(a.substring(sa.toInt, (sa + len).toInt) ==
        b.substring(sb.toInt, (sb + len).toInt), "span text equal")
      val leftBlocked = sa == 0 || sb == 0 ||
        a(sa.toInt - 1) != b(sb.toInt - 1)
      val rightBlocked = sa + len == a.length || sb + len == b.length ||
        a((sa + len).toInt) != b((sb + len).toInt)
      assert(leftBlocked && rightBlocked, s"($ia,$ib,$sa,$sb,$len)")
    }
  }

  test("spanCoverage: per-doc covered chars equal the brute interval " +
      "union of lower-id-shared spans (keep-first convention)") {
    val boiler = "All rights reserved under the License."
    val docs = Seq[(Long, String)](
      (1L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (2L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (3L, "the quick brown fox jumps over the lazy dog but stops"),
      (4L, "XX " + boiler + " unique tail content here 4444444"),
      (5L, "completely different head. " + boiler + " tail 5"),
      (6L, "no overlap whatsoever zzzzz 666666 qqqq"))
    val minLen = 10
    // brute: union of [start_b, start_b+len) intervals per doc
    val byDoc = bruteSpans(docs, minLen).toSeq
      .map(t => (t._2, (t._4, t._4 + t._5)))
      .groupBy(_._1).view.mapValues { ivs =>
        val sorted = ivs.map(_._2).sortBy(identity)
        var covered = 0L
        var curS = Long.MinValue; var curE = Long.MinValue
        for ((s, e) <- sorted) {
          if (curE == Long.MinValue) { curS = s; curE = e }
          else if (s > curE) { covered += curE - curS; curS = s; curE = e }
          else curE = math.max(curE, e)
        }
        if (curE != Long.MinValue) covered += curE - curS
        covered
      }.toMap
    val got = Dedup.spanCoverage(docs.toDF("doc_id", "text"), minLen)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == docs.length, "one row per document")
    got.foreach { case (id, nChars, cov, frac) =>
      val expected = byDoc.getOrElse(id, 0L)
      assert(cov == expected, s"doc $id")
      assert(nChars == docs.find(_._1 == id).get._2.length)
      assert(math.abs(frac - cov.toDouble / nChars) < 1e-15)
    }
    // doc 2 is fully covered by doc 1; doc 1 is covered by NOTHING
    // (no lower id); doc 6 overlaps nothing
    val m = got.map(t => t._1 -> t._3).toMap
    assert(m(1L) == 0L && m(2L) == docs(1)._2.length && m(6L) == 0L)
  }

  test("maxGramDf cap drops corpus-frequent grams before the join") {
    val boiler = "this boilerplate line appears in every single document"
    // heads/tails are per-doc unique char runs, so the ONLY cross-doc
    // grams are boilerplate-internal (df = 20) — straddling grams
    // contain the unique char and have df = 1
    val docs = (1L to 20L).map { i =>
      val u = ('a' + i).toChar.toString * 15
      (i, s"$u " + boiler + s" $u")
    } ++
      Seq((100L, "rare shared span only here AAAABBBBCCCCDDDD x"),
        (101L, "different text but rare AAAABBBBCCCCDDDD y"))
    val uncapped = run(docs, 12)
    assert(uncapped.count(t => t._1 < 100) >= 190,
      "boilerplate pairs present uncapped")
    val capped = Dedup.maximalSubstringSpans(
        docs.toDF("doc_id", "text"), 12, maxGramDf = Some(5L))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(!capped.exists(t => t._1 < 100),
      "grams in >5 docs are dropped, killing the boilerplate pairs")
    assert(capped.exists(t => t._1 == 100L && t._2 == 101L),
      "the df<=5 rare span survives the cap")
  }
}
