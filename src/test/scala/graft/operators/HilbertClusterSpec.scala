package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.LogStore

/** Physical curve-clustered storage through the LogStore: data sorted
  * by curve index, written as equal-count segments whose index min/max
  * land in the log's stats column, and rectangle queries pruned by
  * [[LayoutOps.rectIndexRanges]] interval covers — the full
  * write-side + query-side loop the HilbertExpressions Scaladoc
  * argues for, measured instead of asserted. */
class HilbertClusterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val order = 6
  private val side = 1 << order
  private val nChunks = 12 // deliberately not a power of 4: aligned
  // chunk counts cut both curves into perfect subtree squares and
  // hide the seams; real range-partitioned writes don't align

  /** The full 64×64 grid, clustered into 12 equal-count segments by
    * the given curve, each segment carrying its index min/max stats. */
  private def writeClustered(hilbert: Boolean): LogStore = {
    val cells = (for { x <- 0 until side; y <- 0 until side } yield {
      val v =
        if (hilbert) LayoutOps.hilbertScalar(x.toLong, y.toLong, order)
        else LayoutOps.mortonScalar(x.toLong, y.toLong, order)
      (x.toLong, y.toLong, v)
    }).sortBy(_._3)
    val dir = Files.createTempDirectory("graft-curve").toString + "/tbl"
    val store = new LogStore(spark, dir, statsCol = Some("v"))
    val n = cells.size
    (0 until nChunks).foreach { k =>
      val slice = cells.slice(k * n / nChunks, (k + 1) * n / nChunks)
      store.append(slice.toDF("x", "y", "v"))
    }
    store
  }

  private lazy val hilStore = writeClustered(hilbert = true)
  private lazy val morStore = writeClustered(hilbert = false)

  private def scan(store: LogStore, hilbert: Boolean,
      r: (Long, Long, Long, Long)): (Set[(Long, Long)], Int, Int) = {
    val (df, scanned, live) = LayoutOps.rectScanClustered(store,
      "x", "y", r._1, r._2, r._3, r._4, order, hilbert)
    (df.select("x", "y").as[(Long, Long)].collect().toSet, scanned, live)
  }

  test("pruned rect scans return exactly the brute-force rows on " +
      "both curves, across aligned and unaligned rects") {
    val rects = Seq[(Long, Long, Long, Long)](
      (0L, 0L, 7L, 7L), (20L, 36L, 27L, 43L), (13L, 5L, 50L, 11L),
      (31L, 31L, 33L, 33L), (0L, 0L, 63L, 63L))
    var totalH = 0; var totalM = 0
    rects.foreach { r =>
      val expect = (for {
        x <- r._1 to r._3; y <- r._2 to r._4
      } yield (x, y)).toSet
      val (hRows, hScan, hLive) = scan(hilStore, hilbert = true, r)
      val (mRows, mScan, mLive) = scan(morStore, hilbert = false, r)
      assert(hRows == expect && mRows == expect,
        s"pruning must never change semantics: $r")
      assert(hLive == nChunks && mLive == nChunks)
      totalH += hScan; totalM += mScan
    }
    assert(totalH <= totalM,
      s"hilbert must not lose the sample rects: $totalH vs $totalM")
    // locality is an AGGREGATE property: a single rect can go either
    // way (the all-quadrants center rect costs hilbert one more), a
    // workload must not. Sweep a 225-rect lattice of 8×8 windows
    // against the segment stats alone — pruning decisions are log
    // metadata, no data read needed (src_cluster_skiprate pins the
    // same inequality on real data at 48 slices × 256 rects).
    def statsOf(store: LogStore): Seq[(Long, Long)] =
      store.liveSegmentInfos().map(s => (s.min.get.toLong, s.max.get.toLong))
    def latticeTotal(stats: Seq[(Long, Long)], hilbert: Boolean): Int = {
      var tot = 0
      for (x0 <- 0L until 57L by 4L; y0 <- 0L until 57L by 4L) {
        val ranges = LayoutOps.rectIndexRanges(x0, y0, x0 + 7, y0 + 7,
          order, hilbert)
        tot += stats.count { case (smin, smax) =>
          ranges.exists { case (lo, hi) => lo <= smax && hi >= smin } }
      }
      tot
    }
    val lh = latticeTotal(statsOf(hilStore), hilbert = true)
    val lm = latticeTotal(statsOf(morStore), hilbert = false)
    assert(lh < lm,
      s"hilbert must win the 225-rect lattice: $lh vs $lm")
  }

  test("the Morton seam, forced: rect (20,36)-(27,43) sits inside " +
      "one Hilbert segment but Morton's quadrant jump splits its " +
      "index image across two") {
    val r = (20L, 36L, 27L, 43L)
    val (hRows, hScan, _) = scan(hilStore, hilbert = true, r)
    val (mRows, mScan, _) = scan(morStore, hilbert = false, r)
    assert(hRows.size == 64 && mRows.size == 64)
    assert(hScan == 1, s"hilbert walk keeps the rect contiguous: $hScan")
    assert(mScan == 2,
      s"morton's seam forces the second segment scan: $mScan")
  }

  test("rectIndexRanges: the interval cover contains every rect " +
      "cell's index on both curves, and the budget only ever " +
      "over-approximates") {
    val r = (13L, 5L, 50L, 11L)
    Seq(true, false).foreach { hilbert =>
      def idx(x: Long, y: Long) =
        if (hilbert) LayoutOps.hilbertScalar(x, y, order)
        else LayoutOps.mortonScalar(x, y, order)
      val exact = LayoutOps.rectIndexRanges(r._1, r._2, r._3, r._4,
        order, hilbert, maxSquares = 4096)
      val coarse = LayoutOps.rectIndexRanges(r._1, r._2, r._3, r._4,
        order, hilbert, maxSquares = 8)
      assert(coarse.size <= 8)
      for (x <- r._1 to r._3; y <- r._2 to r._4) {
        val d = idx(x, y)
        assert(exact.exists(iv => iv._1 <= d && d <= iv._2),
          s"exact cover missed ($x,$y) on hilbert=$hilbert")
        assert(coarse.exists(iv => iv._1 <= d && d <= iv._2),
          s"coarse cover missed ($x,$y) on hilbert=$hilbert")
      }
      // intervals are disjoint and sorted after the merge
      exact.sliding(2).foreach {
        case Seq((_, aHi), (bLo, _)) => assert(bLo > aHi + 1)
        case _ => ()
      }
    }
  }

  test("scalar curve twins agree with the column expressions") {
    val pts = Seq((0L, 0L), (5L, 9L), (31L, 32L), (63L, 63L), (20L, 43L))
    val df = pts.toDF("x", "y")
    val fromCols = df.select(
        LayoutOps.hilbertValue(org.apache.spark.sql.functions.col("x"),
          org.apache.spark.sql.functions.col("y"), order).as("h"),
        LayoutOps.zValue(Seq(org.apache.spark.sql.functions.col("x"),
          org.apache.spark.sql.functions.col("y")), order).as("z"))
      .as[(Long, Long)].collect()
    pts.zip(fromCols).foreach { case ((x, y), (h, z)) =>
      assert(LayoutOps.hilbertScalar(x, y, order) == h)
      assert(LayoutOps.mortonScalar(x, y, order) == z)
    }
  }
}
