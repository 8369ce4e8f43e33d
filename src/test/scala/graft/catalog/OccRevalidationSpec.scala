package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Multi-writer OCC with conflict RE-VALIDATION: a read-modify-write
  * loser (merge / deleteRange / optimize / compact / DV delete) that
  * lost its commit race re-checks the winner's actions against its
  * own read set — disjoint writers BOTH land (no wholesale re-run);
  * non-disjoint ones still fail loudly with the original conflict. */
class OccRevalidationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A store whose NEXT commit attempt is raced by a concurrent
    * writer landing `racerLine` in the very slot it tries to claim
    * (one-shot). The racer's segment parquet is written first, so the
    * table stays fully readable afterwards. */
  private def racingStore(dir: String,
      racerRows: Option[(Long, Long)],
      racerStats: Boolean,
      racerSchemaB64: Option[String] = None): (LogStore, () => Unit) = {
    @volatile var armed = false
    val t: LogStore = new LogStore(spark, dir, statsCol = Some("id")) {
      override private[graft] def commit(expected: Long,
          adds: Seq[Segment], removes: Seq[String], txn: Option[Long],
          vacuumHorizon: Option[Long], cdc: Seq[String],
          schema: Option[String], props: Option[String],
          dvs: Seq[(String, String, Long)]): Long = {
        if (armed) {
          armed = false
          val line = racerRows match {
            case Some((lo, hi)) =>
              spark.range(lo, hi + 1).toDF("id")
                .withColumn("v", lit("racer"))
                .write.parquet(s"$dir/seg-racer-$expected")
              if (racerStats)
                s"""{"add":"seg-racer-$expected","min":"$lo","max":"$hi","num":true}"""
              else s"""{"add":"seg-racer-$expected"}"""
            case None => """{"txn":424242}""" // a fence-style winner
          }
          val line2 = racerSchemaB64
            .map(b => line + "\n" + s"""{"schema":"$b"}""")
            .getOrElse(line)
          val p = new org.apache.hadoop.fs.Path(
            f"$dir/_log/$expected%08d.json")
          val rfs = p.getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          val out = rfs.create(p, false)
          out.write((line2 + "\n").getBytes("UTF-8"))
          out.close()
        }
        super.commit(expected, adds, removes, txn, vacuumHorizon, cdc,
          schema, props, dvs)
      }
    }
    (t, () => { armed = true })
  }

  private def seeded(t: LogStore): Unit = {
    t.append((0L until 1000L).map(i => (i, "a")).toDF("id", "v"))
    t.append((5000L until 6000L).map(i => (i, "a")).toDF("id", "v"))
  }

  test("DISJOINT writers both land: a key-range-pruned merge that " +
      "loses its race to an append OUTSIDE its range re-validates " +
      "and re-commits — no recompute, no lost rows on either side") {
    val dir = Files.createTempDirectory("graft-occ").toString + "/t"
    val (t, arm) = racingStore(dir, Some((100000L, 100099L)),
      racerStats = true)
    seeded(t)
    arm()
    val r = t.merge((5000L until 5010L).map(i => (i, "B"))
      .toDF("id", "v"), "id")
    assert(r.rewritten == 1, s"pruned to one segment: $r")
    // BOTH writers' rows are present
    assert(t.read().count() == 2100L,
      "2000 seeded + 100 racer rows (the merge replaced, not added)")
    assert(t.read().where(col("v") === "B").count() == 10L)
    assert(t.read().where(col("v") === "racer").count() == 100L)
  }

  test("OVERLAPPING add conflicts: the same merge racing an append " +
      "INSIDE its key range fails loudly — rows it should have " +
      "matched were never read (an add inside the touched SEGMENT " +
      "but outside the KEY range is no conflict: the merge never " +
      "claimed those keys)") {
    val dir = Files.createTempDirectory("graft-occ").toString + "/t"
    val (t, arm) = racingStore(dir, Some((5005L, 5104L)),
      racerStats = true)
    seeded(t)
    arm()
    intercept[Exception] {
      t.merge((5000L until 5010L).map(i => (i, "B")).toDF("id", "v"),
        "id")
    }
    // nothing from the loser landed; the racer's rows are intact
    assert(t.read().where(col("v") === "B").count() == 0L)
    assert(t.read().count() == 2100L)
  }

  test("a STATS-LESS winner add conflicts by the safe default (it " +
      "might overlap anything)") {
    val dir = Files.createTempDirectory("graft-occ").toString + "/t"
    val (t, arm) = racingStore(dir, Some((100000L, 100099L)),
      racerStats = false)
    seeded(t)
    arm()
    intercept[Exception] {
      t.merge((5000L until 5010L).map(i => (i, "B")).toDF("id", "v"),
        "id")
    }
  }

  test("maintenance survives concurrent appends: compact and a " +
      "range deleteRange racing a disjoint append both land") {
    val dir = Files.createTempDirectory("graft-occ").toString + "/t"
    val (t, arm) = racingStore(dir, Some((100000L, 100099L)),
      racerStats = true)
    seeded(t)
    arm()
    t.compact() // loses the race, re-validates, lands
    assert(t.read().count() == 2100L)
    arm()
    val d = t.deleteRange("id", "0", "9")
    assert(d.rewritten >= 1)
    assert(t.read().count() == 2190L,
      "10 deleted; the second racer's 100 rows land too")
    // deleteRange must not have swallowed either racer's segments
    assert(t.read().where(col("v") === "racer").count() == 200L)
  }

  test("a DV delete racing a fence-style winner lands; racing an " +
      "overlapping add conflicts") {
    val dir = Files.createTempDirectory("graft-occ").toString + "/t"
    val (t, arm) = racingStore(dir, None, racerStats = false)
    seeded(t)
    arm()
    val r = t.deleteRangeDV("id", "100", "109")
    assert(r.deletedRows == 10L)
    assert(t.read().count() == 1990L)

    val dir2 = Files.createTempDirectory("graft-occ").toString + "/t"
    val (t2, arm2) = racingStore(dir2, Some((105L, 205L)),
      racerStats = true)
    seeded(t2)
    arm2()
    intercept[Exception] { t2.deleteRangeDV("id", "100", "109") }
  }

  test("a winner carrying a METADATA action always conflicts: the " +
      "loser must re-derive instead of re-committing a schema/props " +
      "computed against the pre-evolution snapshot") {
    // the winner appends a DISJOINT key range (8000-8100 vs the
    // loser's 100-109 delete — re-validation would pass on data
    // grounds alone) AND evolves the schema with an `extra` column.
    // Replay takes the LAST schema action, so a loser allowed to
    // re-commit at the new head could clobber that evolution; the
    // metadata-change rule makes it conflict instead.
    val evolved = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.StringType)))
    val b64 = java.util.Base64.getEncoder.encodeToString(
      evolved.json.getBytes("UTF-8"))
    val dir = Files.createTempDirectory("graft-occ").toString + "/t"
    val (t, arm) = racingStore(dir, Some((8000L, 8100L)),
      racerStats = true, racerSchemaB64 = Some(b64))
    seeded(t)
    arm()
    intercept[Exception] { t.deleteRange("id", "100", "109") }
    // the winner's evolution is intact — nothing stale overwrote it
    assert(t.recordedSchema().exists(_.fieldNames.contains("extra")),
      "the concurrent winner's schema action must survive")
    assert(t.read().count() == 2101L, "no delete may have landed")
  }
}
