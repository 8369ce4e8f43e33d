package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized equivalence checks: the scalable formulations must agree
  * with their brute-force definitions on arbitrary inputs. */
class RelationalPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(8)
  private def holds(p: Prop): Unit = {
    val r = check(params, p)
    assert(r.passed, r.status.toString)
  }

  private def ts(epochMin: Long): Timestamp =
    new Timestamp(1700000000000L + epochMin * 60000L)

  test("asofBackward equals the naive max-over-range-join definition") {
    val rowGen = Gen.listOfN(30,
      Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 50L)))
    holds(Prop.forAll(rowGen, rowGen) { (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((u, m), i) => (i.toLong, u, ts(m)) }
        .toDF("event_id", "user_id", "ts")
      val right = rs.map { case (u, m) => (u, ts(m)) }.toDF("user_id", "ts")

      val got = RelationalOps.asofBackward(left, right,
          "user_id", "ts", "ts", "prev_ts")
        .select("event_id", "prev_ts")
        .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap

      // brute force: max right ts <= left ts per user, on the driver
      val expected = ls.zipWithIndex.map { case ((u, m), i) =>
        val cands = rs.filter { case (ru, rm) => ru == u && rm <= m }
        i.toLong -> (if (cands.isEmpty) None
                     else Some(ts(cands.map(_._2).max)))
      }.toMap
      got == expected
    })
  }

  test("topKByCount equals the window row_number formulation") {
    val rowGen = Gen.listOfN(60,
      Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(1L, 6L)))
    holds(Prop.forAll(rowGen) { rows =>
      rows.nonEmpty && {
        val df = rows.toDF("ty", "uid")
        val got = TopK.topKByCount(df, "ty", "uid", k = 2)
          .select("ty", "rank", "uid", "n")
          .as[(String, Long, Long, Long)].collect().toSet

        val expected = rows.groupBy(identity).view.mapValues(_.size)
          .toSeq.map { case ((ty, uid), n) => (ty, uid, n.toLong) }
          .groupBy(_._1).flatMap { case (_, xs) =>
            xs.sortBy(x => (-x._3, x._2)).take(2).zipWithIndex
              .map { case ((ty, uid, n), i) => (ty, (i + 1).toLong, uid, n) }
          }.toSet
        got == expected
      }
    })
  }
}
