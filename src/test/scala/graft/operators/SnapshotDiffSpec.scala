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
}
