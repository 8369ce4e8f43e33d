package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Differential pin for the bit_or-word Bloom build in segmentsMeta:
  * the recorded hex of every segment × bloom column must be
  * BIT-IDENTICAL to an independent driver-side rebuild over the
  * segment's distinct key strings through [[LogStore.bloomPositions]]
  * — the same positions the point-lookup probe computes, so equality
  * here IS the zero-false-negative contract. Covers multi-segment
  * publishes, a numeric bloom column (cast-to-string spelling), an
  * all-null segment (must record the all-zero filter), and the
  * clustered multi-segment ingest path. */
class BloomWordsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-bwords").toString

  /** Recompute a segment-column hex from the raw parquet through the
    * driver-side probe hashing and compare with the recorded one. */
  private def checkHexes(store: LogStore, root: String,
      cols: Seq[String]): Unit = {
    val segs = store.liveSegmentInfos(blooms = true)
    assert(segs.nonEmpty)
    segs.foreach { s =>
      val df = spark.read.parquet(s"$root/${s.name}")
      cols.foreach { c =>
        val keys = df.where(col(c).isNotNull)
          .select(col(c).cast("string")).distinct()
          .collect().map(_.getString(0))
        val bits = new Array[Boolean](4096)
        keys.foreach(k =>
          store.bloomPositions(k).foreach(bits(_) = true))
        val expected = LogStore.bloomHexOf(bits)
        val got = if (c == "k") s.bloom else s.bxs.get(c)
        assert(got.contains(expected),
          s"segment ${s.name} column $c: recorded hex != driver rebuild")
      }
    }
  }

  test("string + numeric bloom hexes are identical to the driver " +
      "probe rebuild across multi-append segments") {
    val root = tmp() + "/t"
    val store = new LogStore(spark, root, statsCol = Some("id"),
      bloomCol = Some("k"), bloomCols = Seq("n"))
    def seg(lo: Int) = (lo until lo + 300)
      .map(i => (i.toLong, s"key-$i", (i % 37).toLong))
      .toDF("id", "k", "n")
    store.append(seg(0))
    store.append(seg(300))
    checkHexes(store, root, Seq("k", "n"))
    // and the probe really skips: a key only segment 0 holds
    val (_, opened, live) = store.pointLookup("key-5")
    assert(live == 2 && opened == 1)
  }

  test("an all-null bloom column records the all-zero filter (which " +
      "skips every probe) and nulls never set bits") {
    val root = tmp() + "/t"
    val store = new LogStore(spark, root, bloomCol = Some("k"))
    store.append(Seq((1L, None: Option[String]), (2L, None))
      .toDF("id", "k"))
    store.append(Seq((3L, Some("present")), (4L, None)).toDF("id", "k"))
    checkHexes(store, root, Seq("k"))
    val (df, opened, live) = store.pointLookup("present")
    assert(live == 2 && opened == 1 && df.count() == 1)
  }

  test("a clustered multi-segment publish records per-segment hexes " +
      "identical to the driver rebuild") {
    val root = tmp() + "/t"
    val store = new LogStore(spark, root, statsCol = Some("id"),
      bloomCol = Some("k"))
    store.appendClustered((0 until 400)
      .map(i => (i.toLong, s"ck-$i")).toDF("id", "k"), col("id"), 4)
    assert(store.liveSegmentInfos().size == 4)
    checkHexes(store, root, Seq("k"))
  }
}
