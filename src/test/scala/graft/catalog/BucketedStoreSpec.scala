package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BucketedStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("co-bucketed tables join and aggregate with zero shuffle exchanges") {
    val store = new BucketedStore(spark)
    val sessions = (1L to 1000L).map(i => (i, s"tok-$i")).toDF("shop", "tok")
    val views = (1L to 5000L).map(i => (i % 1000 + 1, i)).toDF("shop", "event")
    store.writeBucketed(sessions, "b_sessions", "shop", 4)
    store.writeBucketed(views, "b_views", "shop", 4)

    val joined = store.table("b_sessions")
      .join(store.table("b_views"), "shop")
    assert(joined.count() == 5000)
    assert(!store.hasShuffle(joined),
      "co-bucketed equi-join must not shuffle:\n" +
        joined.queryExecution.executedPlan.toString)

    val agg = store.table("b_views").groupBy("shop").count()
    assert(agg.count() == 1000)
    assert(!store.hasShuffle(agg),
      "groupBy on the bucket key must not shuffle")
  }
}
