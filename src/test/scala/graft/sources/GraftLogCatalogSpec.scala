package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.catalog.LogStore

/** The SQL catalog's contract: CREATE/INSERT/SELECT round trips with
  * TBLPROPERTIES becoming the recorded skipping config, SQL time
  * travel through the in-log commit stamps, pushdown surviving the
  * SQL path, DDL safety (drop/rename/refusals), and full
  * interoperability with the programmatic API on the same paths. */
class GraftLogCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // one catalog instance per suite, rooted in a temp dir
  private lazy val root = {
    val dir = Files.createTempDirectory("graft-cat").toString
    spark.conf.set("spark.sql.catalog.gtest",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.gtest.root", dir)
    dir
  }

  test("CREATE TABLE + INSERT + SELECT round trip, TBLPROPERTIES " +
      "become the recorded skipping config, and the programmatic API " +
      "reads the same path") {
    root // force catalog registration
    spark.sql("CREATE NAMESPACE gtest.sales")
    spark.sql("""CREATE TABLE gtest.sales.orders
      | (id BIGINT, region STRING, amount DOUBLE)
      | TBLPROPERTIES ('statsCol' = 'id', 'bloomCol' = 'region')
      |""".stripMargin)
    // a created-but-empty table reads as zero rows of its shape
    assert(spark.sql("SELECT * FROM gtest.sales.orders").count() == 0)
    spark.sql("""INSERT INTO gtest.sales.orders VALUES
      | (1, 'emea', 10.5), (2, 'apac', 20.0), (3, 'emea', 7.25)
      |""".stripMargin)
    spark.sql("""INSERT INTO gtest.sales.orders VALUES
      | (100, 'amer', 1.0), (200, 'amer', 2.0)""".stripMargin)
    val got = spark.sql(
      """SELECT region, CAST(count(*) AS BIGINT) AS n,
        | sum(amount) AS s
        |FROM gtest.sales.orders GROUP BY region ORDER BY region"""
        .stripMargin).as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("amer", 2L, 3.0), ("apac", 1L, 20.0),
      ("emea", 2L, 17.75)))
    // the TBLPROPERTIES landed as the props action: a path-only
    // reader prunes on them
    val store = LogStore.configured(spark, s"$root/sales/orders")
    assert(store.recordedProps() ==
      Some("statsCol=id;bloomCol=region;bloomBits=4096"))
    val (_, scanned, live) = store.readRange("100", "200")
    assert(live == 2 && scanned == 1,
      "the SQL-inserted segments must carry usable stats")
    val (lk, s2, _) = store.pointLookup("apac")
    assert(s2 == 1 && lk.count() == 1)
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF resolve " +
      "through the log") {
    root
    spark.sql("CREATE TABLE gtest.tt (id BIGINT)")
    spark.sql("INSERT INTO gtest.tt VALUES (1), (2)")   // version 1
    spark.sql("INSERT INTO gtest.tt VALUES (3)")        // version 2
    assert(spark.sql("SELECT * FROM gtest.tt").count() == 3)
    assert(spark.sql("SELECT * FROM gtest.tt VERSION AS OF 1")
      .as[Long].collect().toSet == Set(1L, 2L))
    // timestamp travel: the instant of version 1's commit stamp
    val ts1 = new LogStore(spark, s"$root/tt").describeHistory()
      .where(col("version") === 1).select(col("commit_time_ms"))
      .as[Long].head()
    val lit = new java.sql.Timestamp(ts1).toString
    assert(spark.sql(
      s"SELECT * FROM gtest.tt TIMESTAMP AS OF '$lit'")
      .as[Long].collect().toSet == Set(1L, 2L))
  }

  test("pushdown survives the SQL path: the plan advertises " +
      "PushedFilters on the stats column") {
    root
    spark.sql("CREATE TABLE gtest.pd (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('statsCol' = 'id')")
    spark.sql("INSERT INTO gtest.pd SELECT id, CAST(id AS STRING) " +
      "FROM range(1000)")
    val df = spark.sql("SELECT * FROM gtest.pd WHERE id >= 990")
    assert(df.count() == 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"expected pushdown in:\n$plan")
  }

  test("DDL safety: duplicate create refuses, drop removes, rename " +
      "moves, ALTER refuses loudly, missing table refuses") {
    root
    spark.sql("CREATE TABLE gtest.ddl (id BIGINT)")
    intercept[Exception] {
      spark.sql("CREATE TABLE gtest.ddl (id BIGINT)")
    }
    intercept[Exception] { // type mutation / drops stay refused
      spark.sql("ALTER TABLE gtest.ddl DROP COLUMN id")
    }
    spark.sql("INSERT INTO gtest.ddl VALUES (7)")
    spark.sql("ALTER TABLE gtest.ddl RENAME TO ddl2")
    assert(spark.sql("SELECT * FROM gtest.ddl2").as[Long].head() == 7L)
    intercept[Exception] {
      spark.sql("SELECT * FROM gtest.ddl").collect()
    }
    spark.sql("DROP TABLE gtest.ddl2")
    intercept[Exception] {
      spark.sql("SELECT * FROM gtest.ddl2").collect()
    }
    // SHOW TABLES sees only directories with a _log
    spark.sql("CREATE TABLE gtest.visible (id BIGINT)")
    val names = spark.sql("SHOW TABLES IN gtest")
      .select(col("tableName")).as[String].collect().toSet
    assert(names.contains("visible") && !names.contains("ddl2"))
  }

  test("schema evolution through SQL INSERT BY NAME: added columns " +
      "union in, type mutations refuse — the table's own gate, not " +
      "Spark's") {
    root
    spark.sql("CREATE TABLE gtest.evo (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gtest.evo VALUES (1, 'a')")
    // a wider write evolves the schema (ACCEPT_ANY_SCHEMA defers to
    // the log's gate, which allows added columns)
    Seq((2L, "b", 9.5)).toDF("id", "v", "score")
      .write.format("graft-log")
      .option("path", s"$root/evo").mode("append").save()
    val rows = spark.sql("SELECT id, score FROM gtest.evo")
      .as[(Long, Option[Double])].collect().toMap
    assert(rows == Map(1L -> None, 2L -> Some(9.5)))
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gtest.evo VALUES ('oops', 'c', 1.0)")
    }
    assert(e.getMessage != null)
  }

  test("metadata tables: t$changes is the SQL change feed (batch AND " +
      "streamable), t$history the per-version audit, t$detail the ops " +
      "snapshot") {
    root
    spark.sql("CREATE TABLE gtest.meta (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gtest.meta VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gtest.meta VALUES (3, 'c')")
    new LogStore(spark, s"$root/meta").deleteWhere("id = 1")
    val feed = spark.sql(
      """SELECT _change_type, CAST(count(*) AS BIGINT) AS n
        |FROM gtest.`meta$changes` GROUP BY 1 ORDER BY 1""".stripMargin)
      .as[(String, Long)].collect().toMap
    assert(feed == Map("insert" -> 3L, "delete" -> 1L))
    val hist = spark.sql("SELECT version, operation FROM " +
      "gtest.`meta$history` ORDER BY version")
      .as[(Long, String)].collect().toSeq
    assert(hist.map(_._1) == Seq(0L, 1L, 2L, 3L))
    assert(hist.last._2 == "REWRITE" && hist(1)._2 == "APPEND")
    val detail = spark.sql(
      "SELECT version, n_segments FROM gtest.`meta$detail`")
      .as[(Long, Long)].head()
    assert(detail == ((3L, 1L)),
      "the delete rewrote both insert segments into one")
    // the feed composes with the streaming engine straight from SQL
    val q = spark.readStream.table("gtest.`meta$changes`")
      .groupBy(col("_change_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("cat_meta_feed").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("cat_meta_feed")
      .as[(String, Long)].collect().toMap ==
      Map("insert" -> 3L, "delete" -> 1L))
    // '$' is reserved for metadata tables
    intercept[Exception] {
      spark.sql("CREATE TABLE gtest.`bad$name` (id BIGINT)")
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM gtest.`meta$nope`").collect()
    }
  }

  test("SQL DELETE FROM: a closed range on the stats column takes the " +
      "stats-pruned path (untouched segments carried by name), a " +
      "general predicate takes copy-on-write, NULL rows follow SQL " +
      "semantics, and TRUNCATE empties; history intact throughout") {
    root
    spark.sql("CREATE TABLE gtest.del (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('statsCol' = 'id')")
    spark.sql("INSERT INTO gtest.del SELECT id, CAST(id AS STRING) " +
      "FROM range(0, 100)")                            // seg A: 0..99
    spark.sql("INSERT INTO gtest.del SELECT id, CAST(id AS STRING) " +
      "FROM range(1000, 1100)")                        // seg B: 1000..1099
    spark.sql("INSERT INTO gtest.del VALUES (CAST(NULL AS BIGINT), 'n')")
    val store = LogStore.configured(spark, s"$root/del")
    val before = store.liveSegmentInfos().map(_.name).toSet
    // closed range touching only seg B
    spark.sql("DELETE FROM gtest.del WHERE id >= 1050 AND id <= 1059")
    assert(spark.sql("SELECT count(*) FROM gtest.del").head().getLong(0)
      == 191L)
    val after = store.liveSegmentInfos().map(_.name).toSet
    assert(before.count(after.contains) == 1,
      "the range delete must carry segment A over by name; B overlaps " +
        "and the null-row segment has no id bounds (rewritten by the " +
        "safe default) — its row survives the rewrite")
    // a NULL-id row survives a value predicate (SQL semantics)
    spark.sql("DELETE FROM gtest.del WHERE id < 10 OR v = '1070'")
    val left = spark.sql(
      "SELECT count(*), sum(CAST(id IS NULL AS INT)) FROM gtest.del")
      .as[(Long, Long)].head()
    assert(left == ((180L, 1L)),
      "10 low ids + the '1070' row deleted; the null row survives")
    // the deletes are honest CDF events: 10 (range) + 11 (predicate)
    val feed = store.readChanges(0)
      .where(col("_change_type") === "delete").count()
    assert(feed == 21L)
    spark.sql("TRUNCATE TABLE gtest.del")
    assert(spark.sql("SELECT count(*) FROM gtest.del").head().getLong(0)
      == 0L)
    assert(store.read(3).count() == 201L,
      "pre-delete snapshots stay time-travelable")
  }

  test("clustered INSERT (clusterBy write option): each range-" +
      "partitioned task file lands as its own segment with tight " +
      "bounds, so skipping reads prune from the FIRST write") {
    root
    val dir = s"$root/clustered"
    spark.range(0, 100000).toDF("id")
      .withColumn("v", col("id") * 2)
      .write.format("graft-log").option("path", dir)
      .option("statsColBoot", "ignored") // no-op: exercise unknown opt
      .option("clusterBy", "id").option("clusterPartitions", "8")
      .mode("append").save()
    // configure stats AFTER the fact? No — bounds need statsCol at
    // write; create via a configured table instead
    val dir2 = s"$root/clustered2"
    new LogStore(spark, dir2, statsCol = Some("id"))
      .create(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType))))
    spark.range(0, 100000).toDF("id")
      .withColumn("v", col("id") * 2)
      .write.format("graft-log").option("path", dir2)
      .option("clusterBy", "id").option("clusterPartitions", "8")
      .mode("append").save()
    val store = LogStore.configured(spark, dir2)
    val segs = store.liveSegmentInfos()
    assert(segs.size == 8, s"8 range partitions -> 8 segments: ${segs.size}")
    assert(segs.forall(s => s.min.nonEmpty && s.rows.nonEmpty))
    // disjoint tight ranges: a narrow probe opens exactly 1 of 8
    val (df, scanned, live) = store.readRange("20000", "20100")
    assert(live == 8 && scanned == 1,
      s"clustered ingest must prune without OPTIMIZE: $scanned/$live")
    assert(df.count() == 101L)
    // and the rows all arrived
    assert(store.read().count() == 100000L)
  }

  test("readStream.table: initial snapshot + append-only tail, " +
      "exactly-once across restart, compaction invisible, rewrite " +
      "refuses loudly toward t$changes") {
    root
    spark.sql("CREATE TABLE gtest.ts (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gtest.ts VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO gtest.ts VALUES (3, 'c')")
    val ckpt = Files.createTempDirectory("graft-tstream").toString
    val sink = Files.createTempDirectory("graft-tsink").toString

    def run(): Unit = {
      val q = spark.readStream.table("gtest.ts")
        .writeStream.outputMode("append").format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    run()
    def got() = spark.read.parquet(sink)
      .as[(Long, String)].collect().toSeq.sorted
    assert(got() == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      "the first batch must be the full snapshot")
    // appends + a compaction land while the stream is down; restart
    // must deliver EXACTLY the new rows (offsets in the checkpoint)
    spark.sql("INSERT INTO gtest.ts VALUES (4, 'd')")
    new LogStore(spark, s"$root/ts").compact()
    spark.sql("INSERT INTO gtest.ts VALUES (5, 'e')")
    run()
    assert(got() == Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"),
      (5L, "e")),
      "the tail must deliver appends once and the compaction never")
    // a data-changing rewrite cannot ride a bare-table stream
    spark.sql("DELETE FROM gtest.ts WHERE id = 1")
    val e = intercept[Exception] { run() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("append-only")),
      s"rewrites must refuse loudly, got: ${msgs(e)}")
  }

  test("metadata tables are READ-ONLY: INSERT INTO t$changes and " +
      "DELETE FROM t$changes refuse; the base table is untouched") {
    root
    spark.sql("CREATE TABLE gtest.ro (id BIGINT, v STRING)")
    spark.sql("INSERT INTO gtest.ro VALUES (1, 'a'), (2, 'b')")
    // an INSERT would append feed-shaped rows and silently evolve
    // _change_type/_commit_version into the base table's schema
    intercept[Exception] {
      spark.sql("INSERT INTO gtest.`ro$changes` VALUES " +
        "(3, 'c', 'insert', 9)")
    }
    // a DELETE rooted at the base dir would delete BASE rows
    intercept[Exception] {
      spark.sql("DELETE FROM gtest.`ro$changes` WHERE id = 1")
    }
    assert(spark.sql("SELECT count(*) FROM gtest.ro").head().getLong(0)
      == 2L, "refused writes must leave the base table untouched")
    assert(spark.sql("SELECT count(*) FROM gtest.`ro$changes`")
      .head().getLong(0) == 2L, "the feed still reads")
    val store = LogStore.configured(spark, s"$root/ro")
    assert(store.latestVersion() == 1L,
      "no extra version may land from the refused writes")
  }

  test("engine-reserved identifier parts refuse: a table or " +
      "namespace named _log (or seg-*/cdc-*/_*) would corrupt the " +
      "directory-layout classification") {
    root
    for (bad <- Seq("_log", "_stage-x", "seg-abc", "cdc-abc", "dv-abc")) {
      val e = intercept[Exception] {
        spark.sql(s"CREATE TABLE gtest.ns1.`$bad` (id BIGINT)")
      }
      assert(e.getMessage.contains("illegal identifier part"),
        s"'$bad' must refuse as a table name, got: ${e.getMessage}")
      val n = intercept[Exception] {
        spark.sql(s"CREATE NAMESPACE gtest.`$bad`")
      }
      assert(n.getMessage.contains("illegal identifier part"),
        s"'$bad' must refuse as a namespace, got: ${n.getMessage}")
    }
    // the corruption this pins against: gtest.ns1._log existing makes
    // isTable(root/ns1) true and misclassifies the NAMESPACE forever
  }

  test("ALTER TABLE ADD COLUMN is a METADATA-ONLY schema commit: " +
      "zero data bytes, old segments read null, new appends carry " +
      "the column, time travel keeps the old shape; unsafe ALTERs " +
      "and unsafe ADDs keep refusing") {
    root
    spark.sql("CREATE TABLE gtest.evoddl (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('statsCol' = 'id')")
    spark.sql("INSERT INTO gtest.evoddl SELECT id, 'old' FROM range(0, 5)")
    val store = LogStore.configured(spark, s"$root/evoddl")
    val vOld = store.latestVersion()
    val segsBefore = store.liveSegmentInfos().map(_.name).toSet
    spark.sql("ALTER TABLE gtest.evoddl ADD COLUMN score DOUBLE")
    // metadata-only: same live segments, one new version, no data dirs
    assert(store.liveSegmentInfos().map(_.name).toSet == segsBefore)
    assert(store.latestVersion() == vOld + 1)
    // old rows read null in the added column
    assert(spark.sql(
      "SELECT count(*) FROM gtest.evoddl WHERE score IS NULL")
      .head().getLong(0) == 5L)
    // new appends carry it
    spark.sql("INSERT INTO gtest.evoddl VALUES (100, 'new', 9.5)")
    assert(spark.sql("SELECT sum(score) FROM gtest.evoddl")
      .head().getDouble(0) == 9.5)
    // time travel BEFORE the evolution returns the old 2-column shape
    assert(spark.sql(
      s"SELECT * FROM gtest.evoddl VERSION AS OF $vOld").columns.toSeq ==
      Seq("id", "v"))
    // multiple columns in one statement
    spark.sql("ALTER TABLE gtest.evoddl ADD COLUMNS (a INT, b STRING)")
    assert(spark.table("gtest.evoddl").columns.toSeq ==
      Seq("id", "v", "score", "a", "b"))
    // refusals: NOT NULL, duplicate, unsupported changes (RENAME and
    // DROP are now supported via column mapping — their own suites —
    // but a type mutation keeps refusing)
    intercept[Exception] {
      spark.sql("ALTER TABLE gtest.evoddl ADD COLUMN nn INT NOT NULL")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gtest.evoddl ADD COLUMN score DOUBLE")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE gtest.evoddl ALTER COLUMN v TYPE INT")
    }
  }

  test("t$segments: the per-file ops view — recorded rows/bounds/" +
      "vector debt per live segment, straight SQL") {
    root
    spark.sql("CREATE TABLE gtest.segs (id BIGINT, v STRING) " +
      "TBLPROPERTIES ('statsCol' = 'id', 'dvDeletes' = 'true')")
    spark.sql("INSERT INTO gtest.segs SELECT id, 'a' FROM range(0, 50)")
    spark.sql("INSERT INTO gtest.segs SELECT id, 'a' " +
      "FROM range(1000, 1100)")
    spark.sql("DELETE FROM gtest.segs WHERE id >= 1000 AND id <= 1009")
    val rows = spark.sql("SELECT segment, rows, dv_rows, min, max, " +
      "has_bloom FROM gtest.`segs$segments` ORDER BY min")
      .as[(String, Long, Long, String, String, Boolean)].collect()
    assert(rows.length == 2)
    assert(rows(0)._2 == 50L && rows(0)._3 == 0L &&
      rows(0)._4 == "0" && rows(0)._5 == "49" && !rows(0)._6)
    assert(rows(1)._2 == 100L && rows(1)._3 == 10L,
      s"segment B must show its 10 vector rows: ${rows(1)}")
    // totals agree with the one-row detail view
    val d = spark.sql("SELECT n_segments, dv_rows FROM " +
      "gtest.`segs$detail`").as[(Long, Long)].head()
    assert(d == ((2L, 10L)))
  }

  test("ALTER TABLE SET/UNSET TBLPROPERTIES: skipping config changes " +
      "are metadata-only commits; a statsCol replacement CLEARS the " +
      "old positional bounds (never mis-prunes), the feed stays " +
      "silent, and application extras round-trip") {
    root
    spark.sql("CREATE TABLE gtest.props (id BIGINT, id2 BIGINT, " +
      "v STRING)")
    spark.sql("INSERT INTO gtest.props SELECT id, id + 10000, 'a' " +
      "FROM range(0, 100)")                     // seg A: no stats
    spark.sql("ALTER TABLE gtest.props SET TBLPROPERTIES " +
      "('statsCol' = 'id', 'pipelineVersion' = '7')")
    spark.sql("INSERT INTO gtest.props SELECT id, id + 10000, 'b' " +
      "FROM range(1000, 1100)")                 // seg B: id stats
    val s1 = LogStore.configured(spark, s"$root/props")
    assert(s1.recordedProp("pipelineVersion") == Some("7"))
    val (_, scanned1, live1) = s1.readRangeOn("id", "5000", "6000")
    assert(live1 == 2 && scanned1 == 1,
      "seg B prunes by its new stats; pre-config seg A always scans")
    // REPLACING statsCol clears seg B's positional bounds in the same
    // commit — probing id2 against id's numbers would mis-prune
    val feedBefore = spark.sql(
      "SELECT count(*) FROM gtest.`props$changes`").head().getLong(0)
    spark.sql("ALTER TABLE gtest.props SET TBLPROPERTIES " +
      "('statsCol' = 'id2')")
    val s2 = LogStore.configured(spark, s"$root/props")
    assert(s2.liveSegmentInfos().forall(_.min.isEmpty),
      "old primary bounds must be cleared, not reinterpreted")
    spark.sql("INSERT INTO gtest.props SELECT id, id + 10000, 'c' " +
      "FROM range(5000, 5100)")                 // seg C: id2 stats
    val (_, scanned2, live2) = s2.readRangeOn("id2", "0", "100")
    assert(live2 == 3 && scanned2 == 2,
      s"seg C prunes on id2, A and B take the safe default: " +
        s"$scanned2 of $live2")
    // metadata-only: content identical, the feed saw NOTHING from the
    // props commit (the empty cdc marker keeps dataChange=false)
    assert(spark.sql("SELECT count(*) FROM gtest.props")
      .head().getLong(0) == 300L)
    assert(spark.sql("SELECT count(*) FROM gtest.`props$changes`")
      .head().getLong(0) == feedBefore + 100L,
      "only seg C's insert may appear in the feed")
    // the audit labels the metadata commits honestly
    val ops = spark.sql("SELECT operation FROM gtest.`props$history`")
      .as[String].collect()
    assert(ops.contains("METADATA (PROPERTIES)"))
    // UNSET: pruning config removed, reads stay correct
    spark.sql("ALTER TABLE gtest.props UNSET TBLPROPERTIES " +
      "('statsCol')")
    val s3 = LogStore.configured(spark, s"$root/props")
    intercept[Exception] { s3.readRangeOn("id2", "0", "1") }
    assert(spark.sql("SELECT count(*) FROM gtest.props")
      .head().getLong(0) == 300L)
    // the UNSET-then-SET two-step cannot smuggle stale bounds past
    // the clearance: seg C still carries id2 bounds after the UNSET
    // above; re-SETTING statsCol to a DIFFERENT column must clear
    // them (the positional slot is unattributed — only a clean slate
    // is safe)
    spark.sql("ALTER TABLE gtest.props SET TBLPROPERTIES " +
      "('statsCol' = 'id')")
    assert(LogStore.configured(spark, s"$root/props")
      .liveSegmentInfos().forall(_.min.isEmpty),
      "bounds recorded under id2 must not be probed as id bounds")
    spark.sql("ALTER TABLE gtest.props UNSET TBLPROPERTIES " +
      "('statsCol')")
    // dvDeletes toggled ON via SQL: DELETE now rides vectors
    spark.sql("ALTER TABLE gtest.props SET TBLPROPERTIES " +
      "('dvDeletes' = 'true')")
    val segs = LogStore.configured(spark, s"$root/props")
      .liveSegmentInfos().map(_.name).toSet
    spark.sql("DELETE FROM gtest.props WHERE id IN (0, 1000, 5000)")
    val s4 = LogStore.configured(spark, s"$root/props")
    assert(s4.liveSegmentInfos().map(_.name).toSet == segs,
      "the SQL DELETE must attach vectors, not rewrite")
    assert(spark.sql("SELECT count(*) FROM gtest.props")
      .head().getLong(0) == 297L)
  }

  test("namespace operations never resolve into table internals: " +
      "DROP NAMESPACE ... CASCADE on a live segment directory " +
      "refuses (the CREATE/RENAME-only relaxation of the reserved-" +
      "prefix rule is for TABLES, not namespaces), and a namespace " +
      "cannot be created inside a table root") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.ns1")
    spark.sql("CREATE TABLE gtest.ns1.vic (id BIGINT)")
    spark.sql("INSERT INTO gtest.ns1.vic VALUES (1), (2), (3)")
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val seg = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$root/ns1/vic"))
      .map(_.getPath.getName).find(_.startsWith("seg-")).get
    // the attack this pins against: the segment dir exists and has no
    // _log, so a relaxed namespaceExists would call it a namespace and
    // CASCADE-delete it out of a table whose log still references it
    intercept[Exception] {
      spark.sql(s"DROP NAMESPACE gtest.ns1.vic.`$seg` CASCADE")
    }
    assert(fs.exists(new org.apache.hadoop.fs.Path(
        s"$root/ns1/vic/$seg")),
      "the live segment must survive the namespace op")
    assert(spark.sql("SELECT count(*) FROM gtest.ns1.vic")
      .head().getLong(0) == 3L, "the table must still read in full")
    // non-reserved names inside a table root are table internals too
    intercept[Exception] {
      spark.sql("CREATE NAMESPACE gtest.ns1.vic.sub")
    }
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$root/ns1/vic/sub")), "no directory may appear in a table root")
    intercept[Exception] {
      spark.sql("DROP NAMESPACE gtest.ns1.vic.`_log` CASCADE")
    }
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$root/ns1/vic/_log")), "the log dir must survive")
    // legitimate namespaces are untouched by the tightening
    spark.sql("CREATE NAMESPACE gtest.nsdrop")
    assert(spark.sql("SHOW NAMESPACES IN gtest").collect()
      .map(_.getString(0)).contains("nsdrop"))
    spark.sql("DROP NAMESPACE gtest.nsdrop")
  }

  test("ALTER TABLE RENAME COLUMN is a METADATA-ONLY commit via " +
      "column mapping: zero data bytes, old segments read through " +
      "the mapping, new writes land under the stable physical name, " +
      "time travel shows the OLD name AS OF its version, and every " +
      "downstream op (INSERT, UPDATE, DELETE, optimize, feed) keeps " +
      "working on the new name") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.cmap")
    spark.sql("CREATE TABLE gtest.cmap.rn (id BIGINT, label STRING) " +
      "TBLPROPERTIES ('statsCol' = 'id')")
    spark.sql("INSERT INTO gtest.cmap.rn VALUES (1,'a'), (2,'b'), (3,'c')")
    val store = LogStore.configured(spark, s"$root/cmap/rn")
    val vBefore = store.latestVersion()
    val segsBefore = store.liveSegmentInfos().map(_.name).toSet
    spark.sql("ALTER TABLE gtest.cmap.rn RENAME COLUMN label TO tag")
    // metadata-only: one commit, zero new segments
    assert(store.latestVersion() == vBefore + 1)
    assert(store.liveSegmentInfos().map(_.name).toSet == segsBefore)
    // old segments read through the mapping
    assert(spark.sql("SELECT tag FROM gtest.cmap.rn WHERE id = 2")
      .head().getString(0) == "b")
    // new writes land under the STABLE physical name: append + read
    spark.sql("INSERT INTO gtest.cmap.rn VALUES (4, 'd')")
    assert(spark.sql(
        "SELECT count(*) FROM gtest.cmap.rn WHERE tag IS NOT NULL")
      .head().getLong(0) == 4L,
      "old and new segments must agree on the renamed column")
    // time travel: AS OF the pre-rename version shows the OLD name
    val old = spark.sql(
      s"SELECT * FROM gtest.cmap.rn VERSION AS OF $vBefore")
    assert(old.columns.toSeq == Seq("id", "label"))
    assert(old.where(col("id") === 2).head().getString(1) == "b")
    // row-level DML on the renamed column
    spark.sql("UPDATE gtest.cmap.rn SET tag = 'zz' WHERE id = 1")
    assert(spark.sql("SELECT tag FROM gtest.cmap.rn WHERE id = 1")
      .head().getString(0) == "zz")
    spark.sql("DELETE FROM gtest.cmap.rn WHERE tag = 'd'")
    assert(spark.sql("SELECT count(*) FROM gtest.cmap.rn")
      .head().getLong(0) == 3L)
    // maintenance rewrite keeps the mapping intact
    store.compact()
    assert(spark.sql("SELECT tag FROM gtest.cmap.rn WHERE id = 2")
      .head().getString(0) == "b")
    // programmatic surfaces read logical names too
    assert(store.read().columns.toSeq == Seq("id", "tag"))
    // renaming the stats column refuses with the workaround
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE gtest.cmap.rn RENAME COLUMN id TO key")
    }
    assert(e.getMessage.contains("TBLPROPERTIES"),
      s"stats-column rename must refuse: ${e.getMessage}")
  }

  test("DROP COLUMN hides the field with zero data bytes; a column " +
      "RE-ADDED under the same name gets a fresh physical name and " +
      "NEVER resurrects the dropped bytes; time travel keeps the old " +
      "shape") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.cmap")
    spark.sql("CREATE TABLE gtest.cmap.dr " +
      "(id BIGINT, secret STRING, keep STRING)")
    spark.sql("INSERT INTO gtest.cmap.dr VALUES " +
      "(1, 'hunter2', 'k1'), (2, 'hunter3', 'k2')")
    val store = LogStore.configured(spark, s"$root/cmap/dr")
    val vBefore = store.latestVersion()
    val segsBefore = store.liveSegmentInfos().map(_.name).toSet
    spark.sql("ALTER TABLE gtest.cmap.dr DROP COLUMN secret")
    assert(store.latestVersion() == vBefore + 1,
      "the drop is ONE metadata commit")
    assert(store.liveSegmentInfos().map(_.name).toSet == segsBefore,
      "zero data bytes move")
    assert(spark.sql("SELECT * FROM gtest.cmap.dr").columns.toSeq ==
      Seq("id", "keep"))
    // time travel: the dropped column is intact AS OF its version
    assert(spark.sql(
        s"SELECT secret FROM gtest.cmap.dr VERSION AS OF $vBefore " +
          "WHERE id = 1").head().getString(0) == "hunter2")
    // RE-ADD the same name: fresh physical — the old bytes must NOT
    // come back, not from old segments, not after new writes
    spark.sql("ALTER TABLE gtest.cmap.dr ADD COLUMN secret STRING")
    assert(spark.sql("SELECT secret FROM gtest.cmap.dr WHERE id = 1")
      .head().isNullAt(0),
      "the re-added column must read NULL off the old segments — " +
        "anything else resurrects dropped data")
    spark.sql("INSERT INTO gtest.cmap.dr VALUES (3, 'k3', 'new3')")
    val got = spark.sql("SELECT id, secret FROM gtest.cmap.dr " +
      "ORDER BY id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(got == Seq((1L, None), (2L, None), (3L, Some("new3"))),
      s"only the post-re-add write may carry values: $got")
    // drop-then-re-add-then-drop-then-re-add: each generation isolated
    spark.sql("ALTER TABLE gtest.cmap.dr DROP COLUMN secret")
    spark.sql("ALTER TABLE gtest.cmap.dr ADD COLUMN secret STRING")
    assert(spark.sql("SELECT count(*) FROM gtest.cmap.dr " +
        "WHERE secret IS NOT NULL").head().getLong(0) == 0L,
      "the second re-add must not see the first generation either")
  }

  test("a PRE-EXISTING table under a reserved name stays reachable " +
      "for SELECT and DROP (the prefix rule gates create/rename only)") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.ns1")
    spark.sql("CREATE TABLE gtest.ns1.mv_src (id BIGINT)")
    spark.sql("INSERT INTO gtest.ns1.mv_src VALUES (1), (2), (3)")
    // simulate a table that predates the reserved-prefix rule (or was
    // copied in externally): rename the DIRECTORY out from under the
    // catalog
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$root/ns1/mv_src"),
      new org.apache.hadoop.fs.Path(s"$root/ns1/seg-orphan")))
    // reachable: reads work, DROP works — the user can dig out
    assert(spark.sql("SELECT count(*) FROM gtest.ns1.`seg-orphan`")
      .head().getLong(0) == 3L)
    spark.sql("DROP TABLE gtest.ns1.`seg-orphan`")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$root/ns1/seg-orphan")))
    // but CREATE under the reserved name still refuses
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gtest.ns1.`seg-orphan` (id BIGINT)")
    }
    assert(e.getMessage.contains("illegal identifier part"))
  }

  test("DISTRIBUTED segments ops view: past the threshold the ops view is " +
      "served from the checkpoint part files by executors, with the " +
      "post-checkpoint suffix (an append, a DV delete, a remove) " +
      "replayed driver-side — row-for-row EQUAL to the driver walk") {
    root
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dseg").toString + "/t"
    val t = new LogStore(spark, dir, statsCol = Some("id"),
      bloomCol = Some("k"), checkpointInterval = 1000,
      checkpointShardRows = 4, dvDeletes = true)
    (0 until 12).foreach { i =>
      t.append((i * 100L until i * 100L + 20L)
        .map(x => (x, s"k$x")).toDF("id", "k"))
    }
    t.checkpoint() // sharded: 12 segments over buckets
    // suffix commits AFTER the checkpoint: every change class the
    // merge must reconcile
    t.append((5000L until 5020L).map(x => (x, s"k$x")).toDF("id", "k"))
    t.deleteWhereDV("id IN (305, 306)") // dv on a checkpointed segment
    t.deleteRange("id", "700", "719")   // removes one whole segment
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), Option(r.getString(4)),
        Option(r.getString(5)), r.getString(6), r.getBoolean(7))).toSet
    val driver = rows(t.describeSegments(distributedOver = Long.MaxValue))
    val dist = rows(t.describeSegments(distributedOver = 1L))
    assert(dist == driver,
      s"distributed ops view must equal the driver walk:\n" +
        s"only-dist=${dist -- driver}\nonly-driver=${driver -- dist}")
    // 12 appends + 1 suffix append − the fully-covered segment,
    // + its (empty) rewrite replacement = 13
    assert(driver.size == 13, s"13 live segments expected: ${driver.size}")
    assert(driver.exists(_._4 == 2L), "the DV suffix must show dv_rows")
    assert(driver.forall(_._8), "every segment carries a bloom")
    assert(driver.forall(_._2 > 0L), "bytes must be measured")
  }
}
