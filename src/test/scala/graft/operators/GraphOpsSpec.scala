package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageRank on a star graph: hub absorbs rank, leaves stay at base") {
    // 4 leaves all pointing at node 0
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L))
      .toDF("src", "dst")
    val pr = GraphOps.pageRank(edges, iters = 2, checkpoint = false)
      .as[(Long, Double)].collect().toMap
    val n = 5.0
    val base = (1.0 - 0.85) / n
    // leaves receive nothing, ever
    (1L to 4L).foreach(l => assert(pr(l) === base))
    // hub after iter1: base + d*4*(1/n); leaves drop to base, so
    // iter2: base + d*4*base — hand-computed fixpoint of the recurrence
    assert(math.abs(pr(0L) - (base + 0.85 * 4 * base)) < 1e-12)
    // dangling hub mass is dropped, not redistributed → total < 1
    assert(pr.values.sum < 1.0)
  }

  test("triangleCount: K4 has 4, reverse/duplicate/self edges " +
      "normalize away, hub wedges bounded by orientation") {
    // K4 = 4 triangles; add noise: self loop, duplicate, reversed edge
    val k4 = for { i <- 0L to 3L; j <- 0L to 3L if i < j } yield (i, j)
    val noisy = (k4 ++ Seq((2L, 1L), (3L, 3L), (0L, 1L))).toDF("src", "dst")
    val r = GraphOps.triangleCount(noisy)
      .as[(Long, Long)].collect().head
    assert(r._2 == 4L, s"K4 has 4 triangles, got $r")
    // K4 oriented by (deg, id): every node deg 3 → id order; wedge
    // count = sum over apexes of C(outdeg, 2) = C(3,2)+C(2,2) = 4
    assert(r._1 == 4L)

    // star graph: hub 0 with 5 leaves — no triangles, and orientation
    // (leaves point AT the hub) leaves ZERO wedges, not C(5,2)=10
    val star = (1L to 5L).map(i => (0L, i)).toDF("src", "dst")
    val s = GraphOps.triangleCount(star).as[(Long, Long)].collect().head
    assert(s == ((0L, 0L)), "degree orientation kills the hub blowup")

    // triangle + pendant: exactly one triangle survives
    val tri = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 9L))
      .toDF("src", "dst")
    assert(GraphOps.triangleCount(tri).as[(Long, Long)]
      .collect().head._2 == 1L)
  }

  test("resourceAllocation: each common neighbor contributes exactly " +
      "1/deg, hub witnesses count less than leaf witnesses") {
    // triangle 1-2-3 plus pendant 3-4: degrees 1:2, 2:2, 3:3, 4:1
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val ra = GraphOps.resourceAllocation(edges, maxDegree = 100)
      .select("id_a", "id_b", "n_common", "ra")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    val third = 333333333333L.toDouble / 1e12 // 10¹² div 3, floated
    assert(ra == Map(
      (2L, 3L) -> (1L, 0.5),   // witness 1 (deg 2)
      (1L, 3L) -> (1L, 0.5),   // witness 2 (deg 2)
      (1L, 2L) -> (1L, third), // witness 3 (deg 3) — the hub discount
      (1L, 4L) -> (1L, third),
      (2L, 4L) -> (1L, third)))
    // the RA ordering flips Jaccard-blind common-neighbor counts:
    // (2,3)'s single low-degree witness outranks (1,2)'s hub witness
    assert(ra((2L, 3L))._2 > ra((1L, 2L))._2)
  }

  test("adamicAdar: each common neighbor contributes the quantized " +
      "1/ln(deg), damping hubs less aggressively than RA") {
    // triangle 1-2-3 plus pendant 3-4: degrees 1:2, 2:2, 3:3, 4:1
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val aa = GraphOps.adamicAdar(edges, maxDegree = 100)
      .select("id_a", "id_b", "n_common", "aa")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    // the operator's quantization: 1/ln(deg) rounded to 12 decimals
    def credit(deg: Int): Double =
      BigDecimal(1.0 / math.log(deg.toDouble))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(aa == Map(
      (2L, 3L) -> (1L, credit(2)), // witness 1 (deg 2)
      (1L, 3L) -> (1L, credit(2)), // witness 2 (deg 2)
      (1L, 2L) -> (1L, credit(3)), // witness 3 (deg 3)
      (1L, 4L) -> (1L, credit(3)),
      (2L, 4L) -> (1L, credit(3))))
    // AA sits between raw counts (no damping) and RA (1/deg): the
    // deg-3 witness keeps MORE credit under AA (1/ln3 ≈ .91) than
    // under RA (1/3), and less than a deg-2 witness under AA
    assert(aa((1L, 2L))._2 > 1.0 / 3.0 + 0.5)
    assert(aa((2L, 3L))._2 > aa((1L, 2L))._2)
  }

  test("localClusteringCoefficient: K4 is all-1, a triangle+pendant " +
      "gives the textbook 1/3 at the hub, degree<2 reads 0") {
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("src", "dst")
    val lccK4 = GraphOps.localClusteringCoefficient(k4)
      .select("node", "lcc").as[(Long, Double)].collect().toMap
    assert(lccK4.values.forall(_ == 1.0), s"complete graph: $lccK4")

    val tp = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = GraphOps.localClusteringCoefficient(tp)
      .select("node", "deg", "n_tri", "lcc")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 1L, 1.0)))
    assert(out(2L) == ((2L, 2L, 1L, 1.0)))
    assert(out(3L) == ((3L, 3L, 1L, 1.0 / 3.0)),
      "hub: one triangle over C(3,2)=3 possible")
    assert(out(4L) == ((4L, 1L, 0L, 0.0)), "pendant: degree < 2 → 0")
  }

  test("pageRank on a cycle is uniform and conserves total mass") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val pr = GraphOps.pageRank(edges, iters = 4, checkpoint = false)
      .as[(Long, Double)].collect().toMap
    // a cycle has no dangling nodes: uniform is the exact fixpoint
    pr.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12))
  }

  test("pageRank splits rank across out-edges by degree") {
    // 0 -> {1, 2}: each successor gets half of 0's rank
    val edges = Seq((0L, 1L), (0L, 2L)).toDF("src", "dst")
    val pr = GraphOps.pageRank(edges, iters = 1, checkpoint = false)
      .as[(Long, Double)].collect().toMap
    assert(pr(1L) === pr(2L))
    assert(math.abs(pr(1L) - ((1.0 - 0.85) / 3 + 0.85 * (1.0 / 3) / 2))
      < 1e-12)
    assert(math.abs(pr(0L) - (1.0 - 0.85) / 3) < 1e-12)
  }

  test("shortestHops fixpoint early exit ≡ the capped full run when " +
      "the eccentricity is far below the cap; the cap still binds " +
      "when it is not") {
    import graft.operators.GraphOps
    // a 5-path plus a disconnected pair: eccentricity from node 1 is
    // 4, so a 1000-round cap MUST exit at the fixpoint (a non-exiting
    // loop would run a thousand supersteps here — unmissable)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("node"), col("dist")).as[(Long, Long)]
        .collect().toMap
    val full = toMap(GraphOps.shortestHops(edges, seeds, iters = 1000))
    assert(full == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L,
      5L -> 4L), "exact hops, unreached component absent")
    assert(full == toMap(GraphOps.shortestHops(edges, seeds, iters = 4)),
      "early exit must equal the exactly-sized run")
    // the cap is still a cap: 2 rounds reach 2 hops
    assert(toMap(GraphOps.shortestHops(edges, seeds, iters = 2)) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // the same exit in the multi-source per-source family
    val h = GraphOps.harmonicCloseness(edges,
      Seq(1L, 10L).toDF("node"), iters = 1000)
      .select(col("source"), col("n_reached"))
      .as[(Long, Long)].collect().toMap
    assert(h == Map(1L -> 4L, 10L -> 1L))
  }
}
