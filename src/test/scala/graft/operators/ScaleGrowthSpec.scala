package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{ScaleStress, TestSpark}

/** Candidate-growth bounds at a 10× corpus step — the scale claim
  * plan shapes cannot prove. For each banded/bucketed candidate
  * generator, the pre-verify candidate-pair count is measured on the
  * synthetic corpus (ScaleStress generators: family/cluster near-dup
  * structure, vocabulary and cluster count scaling with n — the
  * bounded-occupancy regime real corpora live in) at n and 10n.
  * All-pairs would grow 100×; these must stay near-linear. The bound
  * of 30× leaves room for density noise while sitting 3× below even
  * n^1.5 growth (≈31.6×) — any quadratic regression trips it loudly.
  *
  * Sizes are kept test-small (the POINT is the growth ratio, not the
  * absolute size); the committed SCALE.md records the same ratios at
  * sf0.1 × {1, 10, 100} from the full harness run. */
class ScaleGrowthSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val n1 = 800L
  private val n10 = 8000L

  private def ratio(small: Long, big: Long): Double =
    if (small == 0) 0.0 else big.toDouble / small.toDouble

  test("prefix-filter candidate pairs grow sub-quadratically " +
      "(10x docs -> <30x candidates)") {
    val d1 = ScaleStress.synthDocuments(spark, n1).localCheckpoint(true)
    val d10 = ScaleStress.synthDocuments(spark, n10).localCheckpoint(true)
    val c1 = Dedup.prefixCandidateCount(d1, 3, 0.5)
    val c10 = Dedup.prefixCandidateCount(d10, 3, 0.5)
    info(s"prefix candidates: $c1 @ $n1 docs, $c10 @ $n10 docs " +
      f"(${ratio(c1, c10)}%.1fx)")
    assert(c1 > 0, "the fixture must produce candidates at 1x")
    assert(ratio(c1, c10) < 30.0)
  }

  test("minhash-LSH band-bucket pairs grow sub-quadratically " +
      "(10x docs -> <30x candidates)") {
    val d1 = ScaleStress.synthDocuments(spark, n1).localCheckpoint(true)
    val d10 = ScaleStress.synthDocuments(spark, n10).localCheckpoint(true)
    val c1 = ScaleStress.minhashCandidateCount(d1)
    val c10 = ScaleStress.minhashCandidateCount(d10)
    info(s"minhash candidates: $c1 @ $n1 docs, $c10 @ $n10 docs " +
      f"(${ratio(c1, c10)}%.1fx)")
    assert(c1 > 0, "the fixture must produce candidates at 1x")
    assert(ratio(c1, c10) < 30.0)
  }

  test("simhash band-bucket pairs grow sub-quadratically under the " +
      "documented width recipe (10x docs -> <30x candidates)") {
    // fixed 32-bit signatures are a scale CEILING (256 buckets/band
    // saturate: measured 96x at this very step — the SCALE.md control
    // row); the production recipe widens the signature +16 bits per
    // decade, exactly like sign-LSH's rowsPerBand
    val d1 = ScaleStress.synthDocuments(spark, n1).localCheckpoint(true)
    val d10 = ScaleStress.synthDocuments(spark, n10).localCheckpoint(true)
    val c1 = ScaleStress.simhashCandidateCount(d1, bits = 32)
    val c10 = ScaleStress.simhashCandidateCount(d10, bits = 48)
    info(s"simhash candidates: $c1 @ $n1 docs (32-bit), $c10 @ $n10 " +
      f"docs (48-bit) (${ratio(c1, c10)}%.1fx)")
    assert(c1 > 0, "the fixture must produce candidates at 1x")
    assert(ratio(c1, c10) < 30.0)
  }

  test("sorted-neighborhood candidate pairs grow LINEARLY by " +
      "construction (10x rows -> ~10x candidates, <12x)") {
    import org.apache.spark.sql.functions.{col, substring}
    def nmDocs(n: Long) = ScaleStress.synthDocuments(spark, n)
      .withColumn("nm", substring(col("text"), 1, 24))
      .localCheckpoint(true)
    val c1 = RelationalOps.sortedNeighborhoodCandidates(
      nmDocs(n1), "doc_id", "nm", window = 4).count()
    val c10 = RelationalOps.sortedNeighborhoodCandidates(
      nmDocs(n10), "doc_id", "nm", window = 4).count()
    info(s"sorted-neighborhood candidates: $c1 @ $n1, $c10 @ $n10 " +
      f"(${ratio(c1, c10)}%.1fx)")
    // |rows|·w minus the rank tail: exactly linear, no density noise —
    // a tighter bound than the banded generators
    assert(c1 > 0, "the fixture must produce candidates at 1x")
    assert(ratio(c1, c10) < 12.0)
  }

  test("sign-LSH band-bucket pairs grow sub-quadratically under the " +
      "documented rowsPerBand scaling (10x vectors -> <30x candidates)") {
    // fixed bucket count is a scale CEILING (2^rowsPerBand buckets per
    // band fill up quadratically); the operator's scaladoc prescribes
    // growing rowsPerBand with the corpus — this pins that the recipe
    // actually delivers sub-quadratic candidates
    val e1 = ScaleStress.synthEmbeddings(spark, n1).localCheckpoint(true)
    val e10 = ScaleStress.synthEmbeddings(spark, n10).localCheckpoint(true)
    val c1 = ScaleStress.embLshCandidateCount(e1, bands = 8,
      rowsPerBand = 6)
    // 10× corpus → +log2(10)≈4 rows per band (16× more buckets)
    val c10 = ScaleStress.embLshCandidateCount(e10, bands = 8,
      rowsPerBand = 10)
    info(s"sign-LSH candidates: $c1 @ $n1 vecs (r=6), $c10 @ $n10 " +
      f"vecs (r=10) (${ratio(c1, c10)}%.1fx)")
    assert(c1 > 0, "the fixture must produce candidates at 1x")
    assert(ratio(c1, c10) < 30.0)
  }
}
