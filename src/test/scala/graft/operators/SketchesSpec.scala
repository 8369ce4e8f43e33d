package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mgOf(k: Int, xs: Seq[Long]): Map[Long, Long] = {
    val agg = new MisraGriesAggregator(k)
    xs.foldLeft(agg.zero)(agg.reduce)
  }

  test("MG sketch never holds more than k entries") {
    val xs = (1L to 1000L).flatMap(i => Seq.fill((i % 7).toInt + 1)(i % 40))
    assert(mgOf(5, xs).size <= 5)
  }

  test("MG estimates are within n/(k+1) of true counts (stream + merges)") {
    // skewed stream: item 0 is ~1/3 of all arrivals
    val xs = (0 until 3000).map(i => if (i % 3 == 0) 0L else (i % 50).toLong)
    val n = xs.size.toLong
    for (k <- Seq(4, 8, 16)) {
      val agg = new MisraGriesAggregator(k)
      // simulate Spark's partial aggregation: per-partition reduce, then
      // an uneven merge tree
      val parts = xs.grouped(101).toSeq
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
      val sk = parts.reduce(agg.merge)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
      assert(sk.size <= k)
      val bound = n / (k + 1)
      exact.foreach { case (item, cnt) =>
        val est = sk.getOrElse(item, 0L)
        assert(est <= cnt, s"overestimate for $item")
        assert(cnt - est <= bound, s"k=$k item=$item cnt=$cnt est=$est")
      }
      // capture guarantee: anything above the bound is present
      exact.filter(_._2 > bound).foreach { case (item, _) =>
        assert(sk.contains(item), s"k=$k heavy item $item missing")
      }
    }
  }

  test("mgHeavyHitters emits exact counts with all-true bound flags") {
    val df = (0 until 2000)
      .map(i => if (i % 4 == 0) -1L else (i % 300).toLong)
      .toDF("item")
    val out = Sketches.mgHeavyHitters(df, org.apache.spark.sql.functions
        .col("item"), k = 8)
      .orderBy("item").collect()
    // only the planted hot key crosses n/(k+1) = 222
    assert(out.map(_.getLong(0)).toSeq === Seq(-1L))
    assert(out.head.getLong(1) === 500L)
    assert(out.forall(_.getBoolean(2)))
  }
}
