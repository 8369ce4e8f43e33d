package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Unit semantics for the round-8 additions: PCA power iteration,
  * DSIR importance weights, CCNet buckets, common-neighbor Jaccard.
  * (Oracle hash-parity is the Verify/check gate; these pin the MATH
  * on fixtures small enough to reason about by hand.)
  */
class PcaDsirSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("pcaPowerIteration recovers the dominant axis of an " +
      "axis-aligned cloud") {
    // 40 vectors stretched 10x along dim 2 (plus small dim-5 noise):
    // the first principal direction must be ±e2
    val rows = (0 until 40).map { i =>
      val v = Array.fill(8)(0.0f)
      v(2) = (if (i % 2 == 0) 1.0f else -1.0f) * (10.0f + i % 3)
      v(5) = (i % 5 - 2).toFloat * 0.1f
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val (v, lambda) = Similarity.pcaPowerIteration(df, dims = 8,
      iters = 12)
    val imax = v.indices.maxBy(i => math.abs(v(i)))
    assert(imax == 2, s"dominant component must be dim 2, got $imax " +
      s"(v=${v.toSeq})")
    assert(math.abs(v(2)) == 1.0,
      "max-abs normalization must pin the dominant entry to ±1")
    assert(lambda > 0.0)
    val proj = Similarity.pcaProjection(df, dims = 8, iters = 12)
    assert(proj.count() == 40)
    // projection of an e2-aligned vector is (up to sign) its dim-2 load
    val p0 = proj.where(col("vec_id") === 0L)
      .select(col("pc1")).as[Double].head()
    assert(math.abs(math.abs(p0) - 10.0) < 0.2,
      s"|pc1| of a 10*e2 vector must be ~10, got $p0")
  }

  test("dsirWeights scores target-like documents above off-target ones") {
    // the target slice (doc_id % 5 == 0) is all apple-docs; the rest
    // of the pool mixes apple-docs (i % 5 == 1) with zebra-docs.
    // Non-target apple docs must still outweigh every zebra doc —
    // that's the whole point of importance resampling.
    val docs = (0 until 50).map { i =>
      val text = if (i % 5 <= 1) "apple pie with apple sauce and apple tart"
      else "zebra stripes under zebra shade by zebra rock"
      (i.toLong, text)
    }.toDF("doc_id", "text")
    val w = TextOps.dsirWeights(docs).orderBy("doc_id")
      .select(col("doc_id"), col("dsir_logweight"))
      .as[(Long, Double)].collect().toSeq
    val apple = w.filter(t => t._1 % 5 == 1).map(_._2)
    val zebra = w.filter(t => t._1 % 5 >= 2).map(_._2)
    assert(apple.min > zebra.max,
      s"every apple doc must outweigh every zebra doc " +
        s"(apple min ${apple.min}, zebra max ${zebra.max})")
  }

  test("ccnetBuckets is a per-language value-threshold tercile split") {
    val docs = ((0 until 30).map { i =>
      // en docs share a familiar base and add i unique filler words, so
      // familiarity = 9/(9+i) is DISTINCT per doc — terciles then cut
      // strictly inside the value range (no empty head bucket)
      val base = "the cat sat on the mat and the dog"
      val text = if (i < 20)
        (base +: (0 until i).map(j => s"u${i}x$j")).mkString(" ")
      else s"one$i two$i three$i four$i five$i six$i"
      (i.toLong, text)
    }).toDF("doc_id", "text")
    val b = TextOps.ccnetBuckets(docs)
    val byBucket = b.groupBy(col("lang"), col("bucket")).count()
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
    // value-threshold bucketing: every head familiarity > every tail
    val en = b.where(col("lang") === "en")
    val headMin = en.where(col("bucket") === "head")
      .agg(min("familiarity")).as[Double].head()
    val tailMax = en.where(col("bucket") === "tail")
      .agg(max("familiarity")).as[Double].head()
    assert(headMin > tailMax)
  }

  test("commonNeighborJaccard counts shared neighbors exactly on a " +
      "hand-checked graph") {
    // star: 1-2, 1-3, 2-3, 3-4 →
    //   pair (2,3) shares {1}; (1,3) shares {2}; (1,2) shares {3};
    //   (1,4) shares {3}; (2,4) shares {3}
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val cap = GraphOps.suggestedDegreeCap(edges)
    assert(cap >= 64L, s"derived cap must respect the floor, got $cap")
    val out = GraphOps.commonNeighborJaccard(edges, maxDegree = cap)
      .orderBy("id_a", "id_b")
      .select(col("id_a"), col("id_b"), col("n_common"), col("jaccard"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 1L, 1.0 / 3.0), // deg 2+2, common {3}
      (1L, 3L, 1L, 1.0 / 4.0), // deg 2+3, common {2}
      (1L, 4L, 1L, 1.0 / 2.0), // deg 2+1, common {3}
      (2L, 3L, 1L, 1.0 / 4.0), // deg 2+3, common {1}
      (2L, 4L, 1L, 1.0 / 2.0)  // deg 2+1, common {3}
    ), s"got $out")
    // hub cut: cap 2 excludes node 3 (deg 3) as a wedge APEX — pairs
    // whose only shared neighbor is the hub drop; endpoint degrees
    // stay true
    val cut = GraphOps.commonNeighborJaccard(edges, maxDegree = 2L)
      .orderBy("id_a", "id_b")
      .select(col("id_a"), col("id_b"), col("n_common"), col("jaccard"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(cut == Seq(
      (1L, 3L, 1L, 1.0 / 4.0), // apex 2
      (2L, 3L, 1L, 1.0 / 4.0)  // apex 1
    ), s"got $cut")
  }
}
