package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RelationalOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofBackward picks latest right row at or before each left ts") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")), // no prior right row
      (4L, 20L, ts("2024-01-01 23:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00")),
      (10L, ts("2024-01-01 10:00:00")), // equal ts counts (<=)
      (10L, ts("2024-01-01 11:59:00")),
      (20L, ts("2024-01-01 22:00:00"))
    ).toDF("user_id", "ts")

    val out = RelationalOps.asofBackward(left, right,
        "user_id", "ts", "ts", "last_view_ts")
      .orderBy("event_id")
      .collect().map(r =>
        (r.getLong(0), Option(r.getAs[java.sql.Timestamp]("last_view_ts"))))

    assert(out === Array(
      1L -> Some(ts("2024-01-01 10:00:00")),
      2L -> Some(ts("2024-01-01 11:59:00")),
      3L -> None,
      4L -> Some(ts("2024-01-01 22:00:00"))))
  }

  test("asofForward picks earliest right row at or after each left ts") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // equal-ts right row matches
      (2L, 10L, ts("2024-01-01 11:00:00")),
      (3L, 20L, ts("2024-01-01 23:30:00")), // no following right row
      (4L, 20L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00")),
      (10L, ts("2024-01-01 11:59:00")),
      (20L, ts("2024-01-01 22:00:00"))
    ).toDF("user_id", "ts")

    val out = RelationalOps.asofForward(left, right,
        "user_id", "ts", "ts", "next_view_ts")
      .orderBy("event_id")
      .collect().map(r =>
        (r.getLong(0), Option(r.getAs[java.sql.Timestamp]("next_view_ts"))))

    assert(out === Array(
      1L -> Some(ts("2024-01-01 10:00:00")),
      2L -> Some(ts("2024-01-01 11:59:00")),
      3L -> None,
      4L -> Some(ts("2024-01-01 22:00:00"))))
  }

  test("asofBackwardWithin: nearest match nulls out beyond tolerance, " +
      "no fallback to older rows") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // match 30 min back → keep
      (2L, 10L, ts("2024-01-01 14:00:00")), // nearest 2h back → NULL
      (3L, 20L, ts("2024-01-01 09:00:00"))  // no prior at all → NULL
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 08:00:00")), // older fallback must NOT fire
      (10L, ts("2024-01-01 09:30:00")),
      (10L, ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "ts")
    val out = RelationalOps.asofBackwardWithin(left, right,
        "user_id", "ts", "ts", "m", tolSeconds = 3600L)
      .orderBy("event_id")
      .collect().map(r =>
        (r.getLong(0), Option(r.getAs[java.sql.Timestamp]("m"))))
    assert(out === Array(
      (1L, Some(ts("2024-01-01 09:30:00"))),
      (2L, None),
      (3L, None)))
  }

  test("asofBackward keeps every left row and its carried columns") {
    val left = Seq((1L, 5L, ts("2024-01-02 00:00:00"), "payload"))
      .toDF("event_id", "user_id", "ts", "extra")
    val right = Seq((5L, ts("2024-01-01 00:00:00")))
      .toDF("user_id", "ts")
    val out = RelationalOps.asofBackward(left, right,
      "user_id", "ts", "ts", "prev_ts")
    assert(out.columns.toSeq ===
      Seq("event_id", "user_id", "ts", "extra", "prev_ts"))
    assert(out.count() === 1)
    assert(out.head().getAs[String]("extra") === "payload")
  }

  test("forwardFill carries the last non-null value forward per key") {
    val df = Seq(
      ("a", 1, Some(10.0)), ("a", 2, None), ("a", 3, None),
      ("a", 4, Some(40.0)), ("b", 1, None), ("b", 2, Some(2.0))
    ).toDF("k", "i", "v")
    val out = RelationalOps.forwardFill(df, "k", "i", "v", "fill")
      .orderBy("k", "i")
      .collect().map(r => (r.getString(0), r.getInt(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out === Array(
      ("a", 1, Some(10.0)), ("a", 2, Some(10.0)), ("a", 3, Some(10.0)),
      ("a", 4, Some(40.0)), ("b", 1, None), ("b", 2, Some(2.0))))
  }

  test("linearInterpolate: straight line between points, no extrapolation") {
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    val df = Seq(
      ("a", d("2024-01-01"), None),             // before first known → null
      ("a", d("2024-01-02"), Some(10.0)),
      ("a", d("2024-01-03"), None),             // 1/3 of the way → 20
      ("a", d("2024-01-05"), Some(40.0)),       // uneven spacing
      ("a", d("2024-01-06"), None),             // after last known → null
      ("b", d("2024-01-01"), Some(7.0))
    ).toDF("k", "day", "v")
    val out = RelationalOps.linearInterpolate(df, "k", "day", "v", "fill")
      .orderBy("k", "day")
      .collect().map(r =>
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    assert(out === Array(None, Some(10.0), Some(20.0), Some(40.0), None,
      Some(7.0)))
  }

  test("scd2Intervals collapses runs into half-open validity intervals") {
    val log = Seq(
      (1L, ts("2024-01-01 00:00:00"), "free"),
      (1L, ts("2024-01-02 00:00:00"), "free"), // same run
      (1L, ts("2024-01-03 00:00:00"), "pro"),
      (1L, ts("2024-01-05 00:00:00"), "free"), // state may recur: new run
      (2L, ts("2024-01-04 00:00:00"), "pro")
    ).toDF("user_id", "ts", "event_type")
    val out = RelationalOps.scd2Intervals(log, "user_id", "ts", "event_type")
      .orderBy("user_id", "valid_from")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[String]("state"),
        r.getAs[java.sql.Timestamp]("valid_from"),
        Option(r.getAs[java.sql.Timestamp]("valid_to")),
        r.getAs[Boolean]("is_current"), r.getAs[Long]("n_events")))
    assert(out === Array(
      (1L, "free", ts("2024-01-01 00:00:00"),
        Some(ts("2024-01-03 00:00:00")), false, 2L),
      (1L, "pro", ts("2024-01-03 00:00:00"),
        Some(ts("2024-01-05 00:00:00")), false, 1L),
      (1L, "free", ts("2024-01-05 00:00:00"), None, true, 1L),
      (2L, "pro", ts("2024-01-04 00:00:00"), None, true, 1L)))
  }

  test("intervalOverlapJoin ≡ brute theta join, duplicate-free, across " +
      "bin widths") {
    // deterministic pseudo-random intervals spanning several bins
    val mk = (n: Int, salt: Long) => (0 until n).map { i =>
      val s = (i * 37 + salt * 13) % 500
      (i.toLong + salt * 1000, s, s + (i * 7 + salt) % 40)
    }.toDF("id", "s", "e")
    val (l, r) = (mk(80, 1L), mk(90, 2L))
    val brute = l.as("l").join(r.as("r"),
        col("l.s") <= col("r.e") && col("r.s") <= col("l.e"))
      .select(col("l.id").as("l_id"), col("r.id").as("r_id"),
        (least(col("l.e"), col("r.e")) -
          greatest(col("l.s"), col("r.s")) + lit(1L)).as("overlap"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sorted
    for (bw <- Seq(8L, 16L, 64L, 1000L)) {
      val got = RelationalOps.intervalOverlapJoin(l, r, binWidth = bw)
        .select(col("l_id"), col("r_id"), col("overlap"))
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
        .sorted
      assert(got.length === got.distinct.length,
        s"bin dedup must leave no duplicate pairs (binWidth=$bw)")
      assert(got === brute, s"binWidth=$bw must not change the result")
    }
  }

  test("applyDiffToSumCount ≡ full recompute: inserts, deletes, value " +
      "updates, group migration, emptied groups") {
    import org.apache.spark.sql.types.DecimalType
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("grp")).agg(count(lit(1)).as("cnt"),
        sum(col("v").cast(DecimalType(18, 4))).as("sm"))
    val oldSnap = Seq(
      (1L, "a", 10.5), (2L, "a", 1.25), (3L, "b", 7.0), (4L, "c", 2.0)
    ).toDF("id", "grp", "v")
    val newSnap = Seq(
      (1L, "a", 10.5),  // unchanged
      (2L, "b", 1.25),  // migrates a → b
      (3L, "b", 9.0),   // value update in place
      // id 4 deleted → group c empties and must disappear
      (5L, "d", 3.75)   // insert into a brand-new group
    ).toDF("id", "grp", "v")
    val diff = RelationalOps.snapshotDiff(oldSnap, newSnap,
      keys = Seq("id"), compare = Seq("grp", "v"))
    val incremental = RelationalOps
      .applyDiffToSumCount(agg(oldSnap), diff, key = "grp", value = "v")
      .select(col("grp"), col("cnt"), col("sm").cast("double").as("sm"))
      .orderBy("grp")
      .as[(String, Long, Double)].collect()
    val direct = agg(newSnap)
      .select(col("grp"), col("cnt"), col("sm").cast("double").as("sm"))
      .orderBy("grp")
      .as[(String, Long, Double)].collect()
    assert(incremental === direct)
    assert(incremental.map(_._1).toSeq === Seq("a", "b", "d"),
      "emptied group c must be dropped")
  }

  test("rollingMedian: odd frame takes the middle, even frame averages, " +
      "frame truncates at n and nulls are dropped") {
    val df = Seq(
      ("u", 1, 10L, Option(1.0)), ("u", 2, 11L, Option(2.0)),
      ("u", 3, 12L, Option.empty[Double]), // null → dropped entirely
      ("u", 4, 13L, Option(3.0)), ("u", 5, 14L, Option(4.0)),
      ("u", 6, 15L, Option(100.0)) // spike: median shrugs, mean wouldn't
    ).toDF("k", "d", "id", "v")
    val out = RelationalOps.rollingMedian(df, "k", "d", "id", "v", n = 3)
      .select("d", "n_in_frame", "rolling_median")
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1, 2, 4, 5, 6))
    assert(out.map(_._2).toSeq === Seq(1L, 2L, 3L, 3L, 3L))
    // frames: [1] [1,2] [1,2,3] [2,3,4] [3,4,100]
    assert(out.map(_._3).toSeq === Seq(1.0, 1.5, 2.0, 3.0, 4.0))
  }

  test("ewmaSmooth: constant series is a fixed point, a step decays " +
      "geometrically, truncation kicks in past the span") {
    val series = (1 to 20).map(d => ("u", d, 4L)) ++
      // step series for v: 0 for 10 days then 64
      (1 to 20).map(d => ("v", d, if (d <= 10) 0L else 64L))
    val out = RelationalOps
      .ewmaSmooth(series.toDF("k", "d", "n"), "k", "d", "n", span = 4)
      .select(col("k"), col("d"), col("ewma"))
      .as[(String, Int, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // constant input → ewma equals the constant at every row,
    // including the ramp-up rows where the window is short
    assert(out("u").forall(_ == 4.0))
    // first post-step row with span 4, weights 8,4,2,1 newest-first:
    // (64·8 + 0·4 + 0·2 + 0·1) / 15
    assert(out("v")(10) == 512.0 / 15.0)
    // 4 rows after the step the zeros leave the window entirely
    assert(out("v").drop(14).forall(_ == 64.0))
    // single-row ramp-up: ewma == x exactly
    assert(out("v").head == 0.0)
  }

  test("asofBackward plans one shuffle on the key, no theta join") {
    val left = Seq((1L, 1L, ts("2024-01-01 00:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("user_id", "ts")
    val plan = RelationalOps.asofBackward(left, right,
      "user_id", "ts", "ts", "p").queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"),
      s"as-of must not fall back to a nested-loop join:\n$plan")
  }
}
