package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Differential pin for the footer-derived segment bounds (the
  * zero-job stats path in segmentsMeta): for every type the footer
  * path claims, the recorded add-action bounds must be BYTE-IDENTICAL
  * to an independent Spark min/max-cast-to-string recomputation of the
  * same segment — the exact values the aggregation-job fallback would
  * have recorded. Types the footer path does not claim (double here)
  * must still produce correct bounds through the fallback. */
class FooterStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-fstats").toString

  /** The recorded bounds of every live segment vs a per-segment
    * recompute over its parquet directory. */
  private def checkBounds(store: LogStore, root: String,
      c: String): Unit = {
    store.liveSegmentInfos().foreach { s =>
      val df = spark.read.parquet(s"$root/${s.name}")
      val r = df.agg(min(col(c)).cast("string"),
        max(col(c)).cast("string")).head()
      val expected =
        if (r.isNullAt(0)) None else Some((r.getString(0), r.getString(1)))
      val got = s.boundsOf(c).map(b => (b._1, b._2))
      assert(got == expected,
        s"segment ${s.name} column $c: recorded $got != agg $expected")
      // and the row count stamp, while we are here
      assert(s.rows.contains(df.count()),
        s"segment ${s.name}: recorded rows ${s.rows} != ${df.count()}")
    }
  }

  test("long bounds (negatives, extremes) match the aggregation's") {
    val root = tmp() + "/t"
    val store = new LogStore(spark, root, statsCol = Some("k"))
    store.append(Seq(-9223372036854775808L, -1L, 0L, 42L,
      9223372036854775807L).toDF("k"))
    store.append(Seq(7L, -7L).toDF("k"))
    checkBounds(store, root, "k")
  }

  test("int and short bounds match the aggregation's") {
    val rootI = tmp() + "/i"
    val si = new LogStore(spark, rootI, statsCol = Some("k"))
    si.append(Seq(Int.MinValue, -5, 0, Int.MaxValue).toDF("k"))
    checkBounds(si, rootI, "k")
    val rootS = tmp() + "/s"
    val ss = new LogStore(spark, rootS, statsCol = Some("k"))
    ss.append(Seq(Short.MinValue, 9.toShort, Short.MaxValue).toDF("k"))
    checkBounds(ss, rootS, "k")
  }

  test("string bounds match the aggregation's, incl. nulls") {
    val root = tmp() + "/str"
    val store = new LogStore(spark, root, statsCol = Some("k"))
    store.append(Seq(Some("00000123"), Some("zzz"), None,
      Some("emile"), Some("a~plain")).toDF("k"))
    checkBounds(store, root, "k")
  }

  test("non-ASCII string bounds stay gated like the aggregation's") {
    val root = tmp() + "/uni"
    val store = new LogStore(spark, root, statsCol = Some("k"))
    // the max ("é中") fails safeStringBound — the footer path must
    // record nothing for the column, exactly as the aggregation path
    store.append(Seq("00000123", "émile", "é中").toDF("k"))
    assert(store.liveSegmentInfos().forall(_.min.isEmpty))
    val (df, scanned, live) = store.readRange("0", "1")
    assert(scanned == live && df.count() == 1)
  }

  test("unsafe string bounds are still gated (no bounds recorded)") {
    val root = tmp() + "/unsafe"
    val store = new LogStore(spark, root, statsCol = Some("k"))
    // a quote is grammar-unsafe — safeStringBound must reject it on
    // the footer path exactly as on the aggregation path
    store.append(Seq("\"quoted\"", "plain").toDF("k"))
    assert(store.liveSegmentInfos().forall(_.min.isEmpty))
    // and the read stays exact: no bounds = always scanned
    val (df, scanned, live) = store.readRange("a", "q")
    assert(scanned == live && df.count() == 1)
  }

  test("all-null stats column records no bounds; mixed ignores nulls") {
    val root = tmp() + "/nulls"
    val store = new LogStore(spark, root, statsCol = Some("k"))
    store.append(Seq[Option[Long]](None, None).toDF("k"))
    store.append(Seq[Option[Long]](Some(3L), None, Some(-2L)).toDF("k"))
    checkBounds(store, root, "k")
    val infos = store.liveSegmentInfos()
    assert(infos.exists(_.min.isEmpty) && infos.exists(
      _.boundsOf("k").exists(b => b._1 == "-2" && b._2 == "3")))
  }

  test("multi-column stats (long + string) match the aggregation's") {
    val root = tmp() + "/multi"
    val store = new LogStore(spark, root, statsCol = Some("k"),
      statsCols = Seq("name"))
    store.append(Seq((5L, "beta"), (2L, "alpha"), (9L, "omega"))
      .toDF("k", "name"))
    checkBounds(store, root, "k")
    checkBounds(store, root, "name")
  }

  test("double stats fall back to the aggregation and stay correct") {
    val root = tmp() + "/dbl"
    val store = new LogStore(spark, root, statsCol = Some("k"))
    store.append(Seq(1.5, -0.25, 1e300).toDF("k"))
    checkBounds(store, root, "k")
  }

  test("clustered multi-segment publish: every segment's bounds match") {
    val root = tmp() + "/clu"
    val store = new LogStore(spark, root, statsCol = Some("k"))
    store.appendClustered(
      spark.range(0, 1000).select(col("id").as("k"),
        (col("id") % 7).as("v")), col("k"), 4)
    assert(store.liveSegmentInfos().size == 4)
    checkBounds(store, root, "k")
    // the clustered ranges must still prune
    val (_, scanned, live) = store.readRange("0", "10")
    assert(live == 4 && scanned == 1)
  }
}
