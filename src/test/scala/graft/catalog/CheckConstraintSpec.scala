package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CHECK constraints: ANSI semantics (NULL passes, FALSE refuses),
  * validation of existing rows at add time, enforcement on every
  * write path (append, streaming epoch, merge, the DSv2 clustered
  * ingest) BEFORE anything commits, schema-evolution guards for
  * referenced columns, restart survival, and the SQL CALL surface. */
class CheckConstraintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The violation surfaces as a SparkException wrapping the
    * assert_true RuntimeException — search the cause chain. */
  private def messageChain(e: Throwable): String = {
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
  }

  test("lifecycle: add validates existing rows, gates appends and " +
      "merges atomically (violating write leaves the table " +
      "untouched), NULL passes, drop restores, and a FRESH store " +
      "sees the recorded constraint") {
    val dir = Files.createTempDirectory("graft-ck").toString
    val store = new LogStore(spark, s"$dir/t")
    store.append(Seq((1L, Some(10.0), "a"), (2L, None, "b"))
      .toDF("id", "qty", "tag"))
    store.addCheckConstraint("qty_pos", "qty >= 0")
    // recorded + visible to a fresh handle (restart survival)
    assert(LogStore.configured(spark, s"$dir/t").checkConstraints() ==
      Map("qty_pos" -> "qty >= 0"))
    // a violating append fails BEFORE any commit
    val v0 = store.latestVersion()
    val e1 = intercept[Exception] {
      store.append(Seq((3L, Some(-1.0), "c")).toDF("id", "qty", "tag"))
    }
    assert(messageChain(e1).contains("qty_pos"))
    assert(store.latestVersion() == v0 && store.read().count() == 2L,
      "a refused write must leave the table untouched")
    // NULL passes (ANSI CHECK), and a valid append passes
    store.append(Seq((4L, None, "d"), (5L, Some(0.0), "e"))
      .toDF("id", "qty", "tag"))
    assert(store.read().count() == 4L)
    // a MERGE whose postimage violates refuses atomically
    val v1 = store.latestVersion()
    val e2 = intercept[Exception] {
      store.merge(Seq((1L, Some(-5.0), "a"))
        .toDF("id", "qty", "tag"), "id")
    }
    assert(messageChain(e2).contains("qty_pos"))
    assert(store.latestVersion() == v1)
    // a streaming epoch violating refuses the same way
    val e3 = intercept[Exception] {
      store.appendStream(Seq((9L, Some(-9.0), "z"))
        .toDF("id", "qty", "tag"), batchId = 777L)
    }
    assert(messageChain(e3).contains("qty_pos"))
    // the ops view shows what writes are gated on
    assert(store.describeDetail().select("check_constraints")
      .as[String].head() == "qty_pos: qty >= 0")
    // DROP CONSTRAINT: the same row now lands
    store.dropCheckConstraint("qty_pos")
    store.append(Seq((3L, Some(-1.0), "c")).toDF("id", "qty", "tag"))
    assert(store.read().count() == 5L)
    assert(store.describeDetail().select("check_constraints")
      .as[String].head() == "")
    // time travel still shows the constraint at its recorded versions
    assert(store.checkConstraints(v1).contains("qty_pos"))
  }

  test("add-time refusals: existing offender (with a sample row), " +
      "non-boolean expression, duplicate name, bad name; drop of an " +
      "unknown constraint refuses") {
    val dir = Files.createTempDirectory("graft-ck").toString
    val store = new LogStore(spark, s"$dir/t")
    store.append(Seq((1L, -4.0), (2L, 7.0)).toDF("id", "qty"))
    val e1 = intercept[IllegalArgumentException] {
      store.addCheckConstraint("qty_pos", "qty >= 0")
    }
    assert(e1.getMessage.contains("existing") &&
      e1.getMessage.contains("-4.0"))
    assert(store.checkConstraints().isEmpty,
      "a refused add must record nothing")
    intercept[Exception] { store.addCheckConstraint("bad", "qty + 1") }
    intercept[Exception] { store.addCheckConstraint("no such col", "id > 0") }
    store.addCheckConstraint("id_pos", "id > 0")
    val e2 = intercept[IllegalArgumentException] {
      store.addCheckConstraint("id_pos", "id > 1")
    }
    assert(e2.getMessage.contains("already exists"))
    val e3 = intercept[IllegalArgumentException] {
      store.dropCheckConstraint("ghost")
    }
    assert(e3.getMessage.contains("ghost"))
  }

  test("schema evolution guards: RENAME/DROP of a constraint-" +
      "referenced column refuses toward DROP CONSTRAINT first; an " +
      "unreferenced column still renames; rewrite paths (delete " +
      "survivors) pass the gate untouched") {
    val dir = Files.createTempDirectory("graft-ck").toString
    val store = new LogStore(spark, s"$dir/t",
      statsCol = Some("id"))
    store.append(Seq((1L, 10.0, "a"), (2L, 3.0, "b"), (3L, 4.0, "c"))
      .toDF("id", "qty", "tag"))
    store.addCheckConstraint("qty_pos", "qty >= 0 AND id IS NOT NULL")
    val e1 = intercept[IllegalArgumentException] {
      store.renameColumn("qty", "amount")
    }
    assert(e1.getMessage.contains("CHECK constraint"))
    val e2 = intercept[IllegalArgumentException] {
      store.dropColumns(Seq("qty"))
    }
    assert(e2.getMessage.contains("CHECK constraint"))
    store.renameColumn("tag", "label") // unreferenced: fine
    // the delete-survivor rewrite re-validates for free (all pass)
    store.deleteWhere("id = 2")
    assert(store.read().count() == 2L)
    // after DROP CONSTRAINT the rename goes through
    store.dropCheckConstraint("qty_pos")
    store.renameColumn("qty", "amount")
    assert(store.read().columns.contains("amount"))
  }

  test("a NARROWER write legally omits a constrained column: the " +
      "gate sees the NULLs those rows read back as (ANSI: pass) on " +
      "both the programmatic and the DSv2 staged paths, and the " +
      "padding never lands in the segment") {
    val dir = Files.createTempDirectory("graft-ck").toString
    val store = new LogStore(spark, s"$dir/t")
    store.append(Seq((1L, Some(5.0))).toDF("id", "qty"))
    store.addCheckConstraint("qty_pos", "qty >= 0")
    // narrow programmatic append: no qty column at all — the rows
    // read back NULL there, which ANSI CHECK passes
    store.append(Seq(Tuple1(2L)).toDF("id"))
    val rows = store.read().select("id", "qty")
      .as[(Long, Option[Double])].collect().toMap
    assert(rows == Map(1L -> Some(5.0), 2L -> None),
      "the padding column must never land in the segment")
    // narrow DSv2 append rides the staged validation's padding
    Seq(Tuple1(3L)).toDF("id").write.format("graft-log")
      .option("path", s"$dir/t").mode("append").save()
    assert(store.read().count() == 3L)
    // a violating WIDE write still refuses
    val e = intercept[Exception] {
      store.append(Seq((4L, Some(-1.0))).toDF("id", "qty"))
    }
    assert(messageChain(e).contains("qty_pos"))
    assert(store.read().count() == 3L)
  }

  test("the DSv2 clustered ingest validates STAGED bytes before the " +
      "commit (the executor-side writers bypass the inline filter), " +
      "and the SQL CALL surface adds/drops constraints") {
    val root = Files.createTempDirectory("graft-ckcat").toString
    spark.conf.set("spark.sql.catalog.gcons",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.gcons.root", root)
    spark.sql("CREATE TABLE gcons.t (id BIGINT, qty DOUBLE)")
    spark.sql("INSERT INTO gcons.t VALUES (1, 5.0), (2, 6.0)")
    val added = spark.sql(
      "CALL gcons.system.add_check_constraint(`table` => 't', " +
        "name => 'qty_pos', expr => 'qty >= 0')")
      .as[Long].collect()
    assert(added.length == 1)
    // the DSv2 write path (INSERT INTO / df.write) refuses a
    // violating batch with nothing committed
    val before = spark.sql("SELECT count(*) FROM gcons.t")
      .as[Long].head()
    val e = intercept[Exception] {
      Seq((3L, -1.0)).toDF("id", "qty").write.format("graft-log")
        .option("path", s"$root/t").mode("append").save()
    }
    assert(messageChain(e).contains("qty_pos"))
    assert(spark.sql("SELECT count(*) FROM gcons.t")
      .as[Long].head() == before)
    // a clean batch through the same path lands
    Seq((3L, 1.0)).toDF("id", "qty").write.format("graft-log")
      .option("path", s"$root/t").mode("append").save()
    assert(spark.sql("SELECT count(*) FROM gcons.t")
      .as[Long].head() == before + 1)
    // SQL INSERT violating refuses too (same staged validation)
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO gcons.t VALUES (4, -2.0)")
    }
    assert(messageChain(e2).contains("qty_pos"))
    // drop via CALL, then the row lands
    spark.sql("CALL gcons.system.drop_check_constraint(" +
      "`table` => 't', name => 'qty_pos')").collect()
    spark.sql("INSERT INTO gcons.t VALUES (4, -2.0)")
    assert(spark.sql("SELECT count(*) FROM gcons.t")
      .as[Long].head() == before + 2)
  }

  test("NATIVE SQL DDL: ALTER TABLE ADD/DROP CONSTRAINT ... CHECK " +
      "routes through the catalog (SUPPORT_TABLE_CONSTRAINT), the " +
      "table advertises recorded constraints back to Spark, " +
      "non-CHECK kinds refuse, and an offending add refuses with " +
      "nothing recorded") {
    val root = Files.createTempDirectory("graft-ckddl").toString
    spark.conf.set("spark.sql.catalog.gddl",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.gddl.root", root)
    spark.sql("CREATE TABLE gddl.t (id BIGINT, qty DOUBLE)")
    spark.sql("INSERT INTO gddl.t VALUES (1, 5.0), (2, 6.0)")
    spark.sql(
      "ALTER TABLE gddl.t ADD CONSTRAINT qty_pos CHECK (qty >= 0)")
    val store = LogStore.configured(spark, s"$root/t")
    assert(store.checkConstraints() == Map("qty_pos" -> "qty >= 0"))
    // a violating INSERT refuses (Spark-side analyzer enforcement or
    // the log's own gate — either way, nothing lands)
    val e1 = intercept[Exception] {
      spark.sql("INSERT INTO gddl.t VALUES (3, -1.0)")
    }
    assert(messageChain(e1).toLowerCase.contains("qty_pos") ||
      messageChain(e1).contains("CHECK"))
    assert(spark.sql("SELECT count(*) FROM gddl.t").as[Long].head()
      == 2L)
    // an ADD over offending data refuses and records nothing
    val e2 = intercept[Exception] {
      spark.sql(
        "ALTER TABLE gddl.t ADD CONSTRAINT qty_big CHECK (qty > 100)")
    }
    assert(e2.getMessage != null)
    assert(!store.checkConstraints().contains("qty_big"))
    // DROP CONSTRAINT, then the once-refused row lands
    spark.sql("ALTER TABLE gddl.t DROP CONSTRAINT qty_pos")
    assert(store.checkConstraints().isEmpty)
    spark.sql("INSERT INTO gddl.t VALUES (3, -1.0)")
    assert(spark.sql("SELECT count(*) FROM gddl.t").as[Long].head()
      == 3L)
    // DROP of an unknown name refuses; IF EXISTS tolerates
    intercept[Exception] {
      spark.sql("ALTER TABLE gddl.t DROP CONSTRAINT ghost")
    }
    spark.sql("ALTER TABLE gddl.t DROP CONSTRAINT IF EXISTS ghost")
  }

  test("every rewrite path is gated: a violating SQL UPDATE and a " +
      "violating INSERT OVERWRITE refuse with the table untouched " +
      "(both land via publishReplace, outside the inline filter); " +
      "RESTORE to a pre-constraint version with offending data " +
      "refuses toward DROP CONSTRAINT; nondeterministic and " +
      "subquery expressions refuse at add time") {
    val root = Files.createTempDirectory("graft-ckrw").toString
    spark.conf.set("spark.sql.catalog.grw",
      "graft.sources.GraftLogCatalog")
    spark.conf.set("spark.sql.catalog.grw.root", root)
    spark.sql("CREATE TABLE grw.t (id BIGINT, qty DOUBLE)")
    spark.sql("INSERT INTO grw.t VALUES (1, -3.0), (2, 6.0)") // v2
    val store = LogStore.configured(spark, s"$root/t")
    val preConstraint = store.latestVersion()
    spark.sql("UPDATE grw.t SET qty = 3.0 WHERE id = 1")
    spark.sql(
      "ALTER TABLE grw.t ADD CONSTRAINT qty_pos CHECK (qty >= 0)")
    // SQL UPDATE writing a violating value refuses atomically
    val v0 = store.latestVersion()
    val e1 = intercept[Exception] {
      spark.sql("UPDATE grw.t SET qty = -5.0 WHERE id = 2")
    }
    assert(messageChain(e1).contains("qty_pos"))
    assert(store.latestVersion() == v0 &&
      spark.sql("SELECT qty FROM grw.t WHERE id = 2")
        .as[Double].head() == 6.0)
    // INSERT OVERWRITE with a violating row refuses atomically
    val e2 = intercept[Exception] {
      spark.sql("INSERT OVERWRITE grw.t VALUES (9, -1.0)")
    }
    assert(messageChain(e2).contains("qty_pos"))
    assert(store.latestVersion() == v0 &&
      store.read().count() == 2L)
    // RESTORE to the version whose data violates the constraint
    // refuses; after DROP CONSTRAINT it goes through
    val e3 = intercept[IllegalArgumentException] {
      store.restore(preConstraint)
    }
    assert(e3.getMessage.contains("qty_pos"))
    store.dropCheckConstraint("qty_pos")
    store.restore(preConstraint)
    assert(spark.sql("SELECT qty FROM grw.t WHERE id = 1")
      .as[Double].head() == -3.0)
    // nondeterministic / subquery constraint expressions refuse
    val e4 = intercept[IllegalArgumentException] {
      store.addCheckConstraint("flaky", "qty > rand()")
    }
    assert(e4.getMessage.contains("deterministic"))
    val e5 = intercept[Exception] {
      store.addCheckConstraint("subq",
        "id IN (SELECT id FROM grw.t)")
    }
    assert(e5.getMessage != null)
    assert(store.checkConstraints().isEmpty)
    // a RAW property set cannot smuggle a constraint past validation
    // (an unparseable payload would brick every subsequent write)
    val e6 = intercept[IllegalArgumentException] {
      store.setProperties(Map("constraint.evil" -> "bm90LXNxbA"))
    }
    assert(e6.getMessage.contains("engine-managed"))
    val e7 = intercept[Exception] {
      spark.sql("ALTER TABLE grw.t SET TBLPROPERTIES " +
        "('constraint.evil' = 'bm90LXNxbA')")
    }
    assert(messageChain(e7).contains("engine-managed"))
    assert(store.checkConstraints().isEmpty)
  }
}
