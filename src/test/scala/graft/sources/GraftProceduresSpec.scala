package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.LogStore

/** SQL CALL maintenance: optimize (full / subset / bin-pack),
  * maintain's hands-off policy, vacuum with its age guard, and
  * checkpoint — all runnable with zero Scala, results visible both in
  * the CALL output row and `t$history`. */
class GraftProceduresSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val root = {
    val dir = Files.createTempDirectory("graft-proc").toString
    spark.conf.set("spark.sql.catalog.gproc",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.gproc.root", dir)
    dir
  }

  test("CALL optimize: full re-cluster via SQL — segments land with " +
      "tight disjoint bounds and a range probe prunes") {
    root
    spark.sql("CREATE TABLE gproc.t1 (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('statsCol' = 'id')")
    // curve-oblivious ingest: every insert spans the whole domain
    (0 until 4).foreach { i =>
      spark.sql("INSERT INTO gproc.t1 SELECT id * 4 + " + i +
        ", CAST(id AS STRING) FROM range(0, 1000)")
    }
    val r = spark.sql("CALL gproc.system.optimize(`table` => 't1', " +
      "target_segments => 4, cluster_by => 'id')")
      .as[(Long, Int, Int, Int)].head()
    assert(r == ((5L, 4, 4, 0)),
      s"4 segments re-clustered into 4 at version 5, got $r")
    val store = LogStore.configured(spark, s"$root/t1")
    val (_, scanned, live) = store.readRange("100", "200")
    assert(live == 4 && scanned == 1,
      "the SQL-driven recluster must make a 2.5% probe open 1 of 4")
    assert(spark.sql("SELECT count(*) FROM gproc.t1").head().getLong(0)
      == 4000L, "same rows, new layout")
  }

  test("CALL optimize with a WHERE range: subset economics — only " +
      "overlapping segments rewritten, the rest carried") {
    root
    spark.sql("CREATE TABLE gproc.t2 (id BIGINT) " +
      "TBLPROPERTIES ('statsCol' = 'id')")
    spark.sql("INSERT INTO gproc.t2 SELECT id FROM range(0, 100)")
    spark.sql("INSERT INTO gproc.t2 SELECT id FROM range(1000, 1100)")
    spark.sql("INSERT INTO gproc.t2 SELECT id FROM range(2000, 2100)")
    val r = spark.sql("CALL gproc.system.optimize(`table` => 't2', " +
      "target_segments => 1, where_col => 'id', " +
      "where_lo => '1000', where_hi => '1099')")
      .as[(Long, Int, Int, Int)].head()
    assert(r._2 == 1 && r._4 == 2,
      s"one segment selected, two carried, got $r")
  }

  test("CALL maintain: below the small-segment threshold it is a " +
      "commit-free no-op; above, it bin-packs just the small ones") {
    root
    spark.sql("CREATE TABLE gproc.t3 (id BIGINT)")
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO gproc.t3 VALUES ($i)")
    }
    val store = LogStore.configured(spark, s"$root/t3")
    val v0 = store.latestVersion()
    val noop = spark.sql("CALL gproc.system.maintain(" +
      "`table` => 't3', min_segment_bytes => 1048576, " +
      "small_limit => 100)").head()
    assert(!noop.getBoolean(0) && store.latestVersion() == v0,
      "below the limit: no commit")
    val packed = spark.sql("CALL gproc.system.maintain(" +
      "`table` => 't3', min_segment_bytes => 1048576, " +
      "small_limit => 2)").head()
    assert(packed.getBoolean(0) && packed.getInt(1) == 4)
    assert(store.liveSegmentInfos().size == 1, "bin-packed to one")
    assert(spark.sql("SELECT count(*) FROM gproc.t3").head().getLong(0)
      == 4L)
  }

  test("CALL maintain folds VECTOR PRESSURE: dv_fraction selects " +
      "mostly-deleted segments for rewrite, light ones stay put") {
    root
    spark.sql("CREATE TABLE gproc.t3dv (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('statsCol' = 'id', 'dvDeletes' = 'true')")
    spark.sql("INSERT INTO gproc.t3dv SELECT id, 'a' FROM range(0, 100)")
    spark.sql("INSERT INTO gproc.t3dv SELECT id, 'a' " +
      "FROM range(1000, 1100)")
    val store = LogStore.configured(spark, s"$root/t3dv")
    store.deleteRangeDV("id", "1000", "1059") // 60% of segment B
    val r = spark.sql("CALL gproc.system.maintain(" +
      "`table` => 't3dv', min_segment_bytes => 1, " +
      "dv_fraction => CAST(0.5 AS DOUBLE))").head()
    assert(r.getBoolean(0) && r.getInt(2) == 1,
      s"one pressured segment must trigger, got $r")
    assert(store.liveSegmentInfos().forall(_.dv.isEmpty),
      "the rewrite consumes the vector")
    assert(spark.sql("SELECT count(*) FROM gproc.t3dv")
      .head().getLong(0) == 140L)
  }

  test("CALL vacuum + checkpoint: the horizon lands, history shows " +
      "it, and the age guard holds by default (opt-out explicit)") {
    root
    spark.sql("CREATE TABLE gproc.t4 (id BIGINT)")
    spark.sql("INSERT INTO gproc.t4 VALUES (1)")
    spark.sql("INSERT INTO gproc.t4 VALUES (2)")
    val store = LogStore.configured(spark, s"$root/t4")
    store.compact() // leaves two dead segments
    // default guard: young dead segments are spared
    val spared = spark.sql("CALL gproc.system.vacuum(" +
      "`table` => 't4', retain_last => 1)")
      .as[(Long, Int, Int)].head()
    assert(spared._2 == 0, "the 1h age guard must spare young orphans")
    // explicit opt-out reclaims them
    val gone = spark.sql("CALL gproc.system.vacuum(" +
      "`table` => 't4', retain_last => 1, orphan_min_age_ms => 0)")
      .as[(Long, Int, Int)].head()
    assert(gone._2 == 2, s"both dead segments reclaimed, got $gone")
    val ck = spark.sql("CALL gproc.system.checkpoint(`table` => 't4')")
      .head().getLong(0)
    assert(ck == store.latestVersion())
    // the ops audit shows the vacuums
    val hist = spark.sql("SELECT operation FROM gproc.`t4$history`")
      .as[String].collect()
    assert(hist.count(_ == "VACUUM") == 2)
    assert(spark.sql("SELECT count(*) FROM gproc.t4").head().getLong(0)
      == 2L, "vacuum never touches live rows")
  }

  test("CALL optimize(with_deletes): SQL-driven DV compaction — only " +
      "the vector-carrying segment rewritten, debt folded away") {
    root
    spark.sql("CREATE TABLE gproc.t5 (id BIGINT) " +
      "TBLPROPERTIES ('statsCol' = 'id', 'dvDeletes' = 'true')")
    spark.sql("INSERT INTO gproc.t5 SELECT id FROM range(0, 100)")
    spark.sql("INSERT INTO gproc.t5 SELECT id FROM range(1000, 1100)")
    spark.sql("DELETE FROM gproc.t5 WHERE id >= 10 AND id <= 19")
    val store = LogStore.configured(spark, s"$root/t5")
    assert(store.liveSegmentInfos().count(_.dv.nonEmpty) == 1,
      "the SQL DELETE must have attached a vector, not rewritten")
    val r = spark.sql("CALL gproc.system.optimize(`table` => 't5', " +
      "target_segments => 1, with_deletes => true)")
      .as[(Long, Int, Int, Int)].head()
    assert(r._2 == 1 && r._4 == 1,
      s"only the dv segment selected, the clean one carried: $r")
    assert(store.liveSegmentInfos().count(_.dv.nonEmpty) == 0)
    assert(spark.sql("SELECT count(*) FROM gproc.t5").head().getLong(0)
      == 190L, "compaction must not resurrect the deleted rows")
  }

  test("unknown procedures and non-table arguments refuse loudly") {
    root
    val e = intercept[Exception] {
      spark.sql("CALL gproc.system.explode(`table` => 't1')")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("not found") ||
      m.contains("FAILED_TO_LOAD_ROUTINE")))
    val n = intercept[Exception] {
      spark.sql("CALL gproc.system.checkpoint(`table` => 'nope')")
        .collect()
    }
    assert(n.getMessage.toLowerCase.contains("table"))
  }
}
