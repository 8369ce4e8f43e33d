package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SnapshotDiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def diff(oldRows: Seq[(Long, Option[String], Option[Double])],
      newRows: Seq[(Long, Option[String], Option[Double])]) =
    RelationalOps.snapshotDiff(
        oldRows.toDF("id", "status", "price"),
        newRows.toDF("id", "status", "price"),
        keys = Seq("id"), compare = Seq("status", "price"))
      .orderBy("id")
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("op")))

  test("classifies insert / update / delete and drops unchanged keys") {
    val out = diff(
      oldRows = Seq(
        (1L, Some("A"), Some(1.0)), // unchanged → dropped
        (2L, Some("A"), Some(1.0)), // price changes → update
        (3L, Some("A"), Some(1.0)), // status changes → update
        (4L, Some("A"), Some(1.0))  // only in old → delete
      ),
      newRows = Seq(
        (1L, Some("A"), Some(1.0)),
        (2L, Some("A"), Some(2.0)),
        (3L, Some("B"), Some(1.0)),
        (5L, Some("A"), Some(1.0))  // only in new → insert
      ))
    assert(out === Array(
      2L -> "update", 3L -> "update", 4L -> "delete", 5L -> "insert"))
  }

  test("NULL compared values are legitimate: null==null is unchanged, " +
      "null→value and value→null are updates") {
    val out = diff(
      oldRows = Seq(
        (1L, None, Some(1.0)),      // null status both sides → dropped
        (2L, None, Some(1.0)),      // null → value: update
        (3L, Some("A"), Some(1.0))  // value → null: update
      ),
      newRows = Seq(
        (1L, None, Some(1.0)),
        (2L, Some("A"), Some(1.0)),
        (3L, None, Some(1.0))
      ))
    assert(out === Array(2L -> "update", 3L -> "update"))
  }

  test("old/new columns carry the per-side values, absent side is NULL") {
    val rows = RelationalOps.snapshotDiff(
        Seq((1L, "A")).toDF("id", "v"),
        Seq((2L, "B")).toDF("id", "v"),
        keys = Seq("id"), compare = Seq("v"))
      .orderBy("id").collect()
    assert(rows.length === 2)
    val del = rows(0)
    assert(del.getAs[String]("op") === "delete"
      && del.getAs[String]("old_v") === "A" && del.isNullAt(del.fieldIndex("new_v")))
    val ins = rows(1)
    assert(ins.getAs[String]("op") === "insert"
      && ins.getAs[String]("new_v") === "B" && ins.isNullAt(ins.fieldIndex("old_v")))
  }

  test("composite keys diff on the full key tuple") {
    val out = RelationalOps.snapshotDiff(
        Seq((1L, "x", 10), (1L, "y", 10)).toDF("id", "part", "v"),
        Seq((1L, "x", 10), (1L, "y", 20)).toDF("id", "part", "v"),
        keys = Seq("id", "part"), compare = Seq("v"))
      .orderBy("id", "part").collect()
      .map(r => (r.getAs[String]("part"), r.getAs[String]("op")))
    assert(out === Array("y" -> "update"))
  }

  test("maintainJoinView: partial refresh equals full recompute " +
      "across fact insert/update/delete and dim update/delete") {
    // fact (id, fk, v); dim (k, seg)
    val aOld = Seq((1L, 10L, 1.0), (2L, 20L, 2.0), (3L, 30L, 3.0),
      (4L, 10L, 4.0)).toDF("id", "fk", "v")
    // id=2 deleted; id=3 value update; id=5 inserted; id=1,4 untouched
    val aNew = Seq((1L, 10L, 1.0), (3L, 30L, 9.0), (4L, 10L, 4.0),
      (5L, 40L, 5.0)).toDF("id", "fk", "v")
    // k=10 segment update (hits facts 1 and 4); k=30 deleted (drops
    // fact 3 despite its own update); k=40 inserted (backs fact 5)
    val bOld = Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("k", "seg")
    val bNew = Seq((10L, "A2"), (20L, "b"), (40L, "d")).toDF("k", "seg")

    val viewOld = aOld.join(bOld, col("fk") === col("k"))
      .select(col("id"), col("fk"), col("v"), col("seg"))
    val aDelta = RelationalOps.snapshotDiff(aOld, aNew,
      keys = Seq("id"), compare = Seq("fk", "v"))
    val bDelta = RelationalOps.snapshotDiff(bOld, bNew,
      keys = Seq("k"), compare = Seq("seg"))

    val maintained = RelationalOps.maintainJoinView(viewOld, aNew,
        bNew, aDelta, bDelta, aKey = "id", fkCol = "fk", bKey = "k")
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("v"),
        r.getAs[String]("seg")))
    val full = aNew.join(bNew, col("fk") === col("k"))
      .select(col("id"), col("v"), col("seg"))
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("v"),
        r.getAs[String]("seg")))
    assert(maintained === full)
    assert(maintained === Array((1L, 1.0, "A2"), (4L, 4.0, "A2"),
      (5L, 5.0, "d"))) // 2 deleted, 3 dropped with its dim row
  }
}
