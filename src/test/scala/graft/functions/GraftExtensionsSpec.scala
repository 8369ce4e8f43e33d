package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The cluster-wide installation path: a session created with
  * `spark.sql.extensions=graft.functions.GraftExtensions` must expose
  * every SQL function, the optimizer rule, and the planner strategy
  * with no imperative registration call. */
class GraftExtensionsSpec extends AnyFunSuite {

  private def withExtensionsSession[T](f: SparkSession => T): T = {
    val base = TestSpark.spark // ensures the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // withExtensions runs the SAME installer the static
      // spark.sql.extensions conf instantiates; the conf route can't be
      // exercised here because the test JVM's SparkContext already
      // exists and static confs are fixed at context launch
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      f(s) // do NOT stop s — it shares the test JVM's SparkContext
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("config-installed extensions expose the SQL functions") {
    withExtensionsSession { s =>
      assert(s.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
        .head().getDouble(0) === 11.0)
      assert(s.sql("SELECT damerau_levenshtein('ab', 'ba')")
        .head().getInt(0) === 1)
      // Spark's chr() is mod-256 ASCII, so the decomposed pair comes in
      // as a literal ('e' + U+0301 combining acute)
      assert(s.sql("SELECT length(nfc_normalize('é'))")
        .head().getInt(0) === 1)
      assert(s.sql(
          "SELECT count_in_set(array('a', 'b', 'c'), array('a', 'c'))")
        .head().getLong(0) === 2L)
    }
  }

  test("config-installed extensions inject the TopK planner strategy") {
    withExtensionsSession { s =>
      assert(s.sessionState.planner.strategies
        .exists(_ == graft.plans.TopKStrategy),
        "TopKStrategy must be planned in via injectPlannerStrategy")
    }
  }
}
