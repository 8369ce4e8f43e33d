package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.GraftFunctions

/** The optimizer rule must (a) actually fire on the idiomatic HOF form,
  * both In and InSet variants, and (b) be observationally identical to
  * the interpreted plan it replaces. */
class CountInSetRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withRule[A](f: => A): A = { GraftFunctions.register(spark); f }

  test("size(filter(x IN small-list)) rewrites to native count_in_set") {
    withRule {
      val df = Seq(Seq("a", "b", "a", "c"), Seq("x")).toDF("toks").repartition(1)
      val q = df.select(
        size(filter($"toks", t => t.isInCollection(Seq("a", "c")))).as("n"))
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("count_in_set"), s"rule did not fire:\n$opt")
      assert(q.as[Int].collect().toSeq == Seq(3, 0))
    }
  }

  test("large IN list (InSet after OptimizeIn) also rewrites") {
    withRule {
      val words = ('a' to 'l').map(_.toString) // 12 > InSet threshold
      val df = Seq(Seq("a", "z", "k"), Seq.empty[String]).toDF("toks").repartition(1)
      val q = df.select(
        size(filter($"toks", t => t.isInCollection(words))).as("n"))
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("count_in_set"), s"rule did not fire:\n$opt")
      assert(q.as[Int].collect().toSeq == Seq(2, 0))
    }
  }

  test("SQL text form rewrites and null array stays null") {
    withRule {
      Seq((1L, Seq("a", "b")), (2L, null.asInstanceOf[Seq[String]]))
        .toDF("id", "toks").repartition(1).createOrReplaceTempView("v_rw")
      val q = spark.sql(
        "SELECT size(filter(toks, t -> t IN ('a', 'c'))) AS n " +
        "FROM v_rw ORDER BY id")
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("count_in_set"), s"rule did not fire:\n$opt")
      val got = q.collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
      assert(got.toSeq == Seq(Some(1), None))
    }
  }

  test("non-literal or non-string predicates are left untouched") {
    withRule {
      val df = Seq((Seq("a", "b"), "a")).toDF("toks", "needle").repartition(1)
      // needle is a column, not a literal set: must NOT rewrite
      val q = df.select(
        size(filter($"toks", t => t === $"needle")).as("n"))
      val opt = q.queryExecution.optimizedPlan.toString
      assert(!opt.contains("count_in_set"), opt)
      assert(q.as[Int].head() == 1)
    }
  }
}
