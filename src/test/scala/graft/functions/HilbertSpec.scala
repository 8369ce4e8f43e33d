package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.LayoutOps

/** The Hilbert expression's defining property and its codegen path. */
class HilbertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference JVM xy2d — the spec's independent replay of the loop. */
  private def ref(x0: Long, y0: Long, order: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("the Hilbert walk visits every cell of the grid exactly once, " +
      "one Manhattan-adjacent step at a time (Morton fails this)") {
    val order = 4 // 16x16 grid, 256 cells
    val cells = for { x <- 0 until 16; y <- 0 until 16 }
      yield (x.toLong, y.toLong)
    val out = cells.toDF("x", "y")
      .select(col("x"), col("y"),
        LayoutOps.hilbertValue(col("x"), col("y"), order).as("h"))
      .as[(Long, Long, Long)].collect()
    val byIndex = out.map(r => r._3 -> (r._1, r._2)).toMap
    assert(byIndex.keySet == (0L until 256L).toSet,
      "the curve must be a bijection onto [0, 256)")
    (0L until 255L).foreach { d =>
      val (x1, y1) = byIndex(d)
      val (x2, y2) = byIndex(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"step $d -> ${d + 1} jumps from ($x1,$y1) to ($x2,$y2)")
    }
    // contrast: the Morton curve's quadrant seam breaks adjacency
    val zByIndex = out.map { case (x, y, _) =>
      val z = (0 until 4).map(j => (((x >> j) & 1) << (2 * j + 1)) |
        (((y >> j) & 1) << (2 * j))).reduce(_ | _)
      z -> (x, y)
    }.toMap
    val mortonAdjacent = (0L until 255L).forall { d =>
      val (x1, y1) = zByIndex(d)
      val (x2, y2) = zByIndex(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) == 1
    }
    assert(!mortonAdjacent,
      "if Morton were also always-adjacent the Hilbert curve would " +
        "buy nothing — this pins the property gap")
  }

  test("codegen evaluation matches the reference loop across orders") {
    val probes = Seq((0L, 0L), (1L, 0L), (31L, 17L), (65535L, 1L),
      (32768L, 32767L), (12345L, 54321L))
    val out = probes.toDF("x", "y")
      .select(col("x"), col("y"),
        LayoutOps.hilbertValue(col("x"), col("y"), 16).as("h"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (x, y, h) =>
      assert(h == ref(x, y, 16), s"($x, $y): $h != ${ref(x, y, 16)}")
    }
  }

  test("out-of-range coordinates fail loudly, null propagates") {
    intercept[Exception] {
      Seq((70000L, 1L)).toDF("x", "y")
        .select(LayoutOps.hilbertValue(col("x"), col("y"), 16))
        .collect()
    }
    val r = Seq((Some(1L), Option.empty[Long])).toDF("x", "y")
      .select(LayoutOps.hilbertValue(col("x"), col("y"), 16).as("h"))
      .collect()
    assert(r.head.isNullAt(0))
  }
}
