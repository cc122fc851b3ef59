package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.pipeline.{Analytics, Profiling}

/** Hand-computed behavior tests for the event-analytics operators
  * (cohort retention, strict-sequence funnel) and the exact-sum
  * correlation profile.
  */
class AnalyticsSpec extends SparkTestBase {

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  lazy val events = {
    import spark.implicits._
    Seq(
      // user 1: joins day 1, returns day 2 and day 4 (two events day 2)
      (1L, ts(1, 9), "view"), (1L, ts(2, 9), "click"),
      (1L, ts(2, 11), "view"), (1L, ts(4, 9), "purchase"),
      // user 2: joins day 2 only
      (2L, ts(2, 10), "view"),
      // user 3: joins day 1, returns day 2
      (3L, ts(1, 8), "click"), (3L, ts(2, 8), "view")
    ).toDF("user_id", "ts", "event_type")
  }

  test("cohortRetention: cohort day, offsets, distinct-user counts") {
    val got = Analytics.cohortRetention(events)
      .orderBy("cohort_day", "day_offset")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    // cohort 01-01: users 1,3 active at offset 0 and 1; user 1 at 3
    // cohort 01-02: user 2 at offset 0
    assert(got.toSeq == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 2L), ("2024-01-01", 3, 1L),
      ("2024-01-02", 0, 1L)))
  }

  lazy val funnelEvents = {
    import spark.implicits._
    Seq(
      // user 1: click BEFORE first view — funnel click must be the
      // later one; purchase after that click converts
      (1L, ts(1, 8), "click"), (1L, ts(1, 9), "view"),
      (1L, ts(1, 10), "click"), (1L, ts(1, 11), "purchase"),
      // user 2: view then purchase but NO click — purchase must NOT
      // count (strict order), t2 and t3 both null
      (2L, ts(1, 9), "view"), (2L, ts(1, 10), "purchase"),
      // user 3: full funnel in order, conversion at same timestamp
      // as the previous step allowed (at-or-after)
      (3L, ts(1, 9), "view"), (3L, ts(1, 9), "click"),
      (3L, ts(2, 9), "purchase"),
      // user 4: never views — not in the funnel at all
      (4L, ts(1, 9), "click"), (4L, ts(1, 10), "purchase")
    ).toDF("user_id", "ts", "event_type")
  }

  test("funnelStages: strict order, earliest-at-or-after timestamps") {
    val got = Analytics.funnelStages(
      funnelEvents, Seq("view", "click", "purchase"))
      .orderBy("user_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val u1 = got(0)
    assert(u1.getTimestamp(1) == ts(1, 9))
    assert(u1.getTimestamp(2) == ts(1, 10), "must skip the pre-view click")
    assert(u1.getTimestamp(3) == ts(1, 11))
    val u2 = got(1)
    assert(u2.getTimestamp(1) == ts(1, 9))
    assert(u2.isNullAt(2) && u2.isNullAt(3),
      "no click: purchase must not convert out of order")
    val u3 = got(2)
    assert(u3.getTimestamp(2) == ts(1, 9), "same-timestamp conversion allowed")
    assert(u3.getTimestamp(3) == ts(2, 9))
  }

  test("funnel: per-step converted-user counts from one aggregation") {
    val got = Analytics.funnel(funnelEvents, Seq("view", "click", "purchase"))
      .orderBy("step_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1, "view", 3L), (2, "click", 2L), (3, "purchase", 2L)))
  }

  test("corrProfile: exact +1/-1 on linear columns, null rows dropped") {
    import spark.implicits._
    val df = Seq(
      (1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0),
      (4.0, 8.0, -4.0)).toDF("a", "b", "c")
      .unionByName(Seq((Option.empty[Double], Option(9.0), Option(9.0)))
        .toDF("a", "b", "c"))
    val got = Profiling.corrProfile(df, Seq("a", "b", "c"))
      .orderBy("col_x", "col_y").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.forall(_._3 == 4L), "null row must be excluded from n")
    val byPair = got.map(t => (t._1, t._2) -> t._4).toMap
    assert(math.abs(byPair(("a", "b")) - 1.0) < 1e-12)
    assert(math.abs(byPair(("a", "c")) + 1.0) < 1e-12)
    assert(math.abs(byPair(("b", "c")) + 1.0) < 1e-12)
  }

  test("corrProfile matches a directly computed Pearson r") {
    import spark.implicits._
    val xs = Seq(1.07, 2.13, 3.02, 4.44, 5.01, 6.29, 7.11, 8.56)
    val ys = Seq(2.44, 1.95, 3.67, 3.01, 5.88, 5.02, 6.73, 8.01)
    val got = Profiling.corrProfile(
      xs.zip(ys).toDF("x", "y"), Seq("x", "y"))
      .collect().head.getDouble(3)
    // expected from the same cents-scaled exact sums
    val (vx, vy) = (xs.map(v => math.round(v * 100)), ys.map(v => math.round(v * 100)))
    val n = vx.size.toDouble
    val (sx, sy) = (vx.sum.toDouble, vy.sum.toDouble)
    val sxx = vx.map(v => v * v).sum.toDouble
    val syy = vy.map(v => v * v).sum.toDouble
    val sxy = vx.zip(vy).map { case (a, b) => a * b }.sum.toDouble
    val expected = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(got - expected) < 1e-12, s"got $got expected $expected")
  }

  test("slidingActiveUsers: hand-computed 2-day rolling distinct counts") {
    import spark.implicits._
    val ev = Seq(
      // user 1 active Jan 10 (twice — must not double count) and Jan 12
      (1L, ts(10, 9)), (1L, ts(10, 11)), (1L, ts(12, 9)),
      // user 2 active Jan 10 only
      (2L, ts(10, 10))
    ).toDF("user_id", "ts")
    val got = Analytics.slidingActiveUsers(ev, windowDays = 2)
      .orderBy("window_start")
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toSeq
    // window [s, s+1]: Jan 9 covers {u1,u2}@10; Jan 10 covers both
    // days 10-11 {u1,u2}; Jan 11 covers day 12 {u1}; Jan 12 {u1}
    assert(got == Seq("2024-01-09" -> 2L, "2024-01-10" -> 2L,
      "2024-01-11" -> 1L, "2024-01-12" -> 1L))
  }

  test("slidingActiveUsers plans the two-level distinct: no Window, no Expand") {
    val p = Analytics.slidingActiveUsers(events, windowDays = 7)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.take(1500))
    assert(!p.contains("Expand"), p.take(1500))
    assert(p.contains("HashAggregate"), p.take(1500))
  }

  test("dailyRollup: three levels in one pass, exact cents, grouping bitmask") {
    import spark.implicits._
    val ev = Seq(
      (ts(1, 9), "view", 1.25), (ts(1, 10), "view", 2.10),
      (ts(2, 9), "view", 0.65), (ts(1, 11), "click", 10.00)
    ).toDF("ts", "event_type", "value")
    val got = Analytics.dailyRollup(ev).collect().map { r =>
      (Option(r.getString(0)).orNull,
        Option(r.getDate(1)).map(_.toString).orNull,
        r.getLong(2), r.getLong(3), r.getLong(4))
    }.toSet
    assert(got == Set(
      ("view", "2024-01-01", 2L, 335L, 0L),
      ("view", "2024-01-02", 1L, 65L, 0L),
      ("click", "2024-01-01", 1L, 1000L, 0L),
      ("view", null, 3L, 400L, 1L),
      ("click", null, 1L, 1000L, 1L),
      (null, null, 4L, 1400L, 3L)))
    // ROLLUP's Expand multiplies by the LEVEL count (a constant 3),
    // and partial aggregation still collapses before the shuffle
    val p = Analytics.dailyRollup(ev)
      .queryExecution.executedPlan.toString
    assert(p.contains("Expand"), p.take(1200))
    assert(p.contains("partial_count") || p.contains("partial count"),
      p.take(1200))
  }

  test("hotKeys ranks by mass with shares summing to the heavy fraction") {
    import spark.implicits._
    val d = (Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
      (1 to 10).map(i => s"cold$i")).toDF("k")
    val got = graft.pipeline.Skew.hotKeys(d, "k", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq(("hot", 60L), ("warm", 30L)))
    assert(math.abs(got(0)._3 - 0.6) < 1e-12)
    assert(math.abs(got(1)._3 - 0.3) < 1e-12)
    // ties break by key, deterministically
    val tied = (Seq.fill(5)("b") ++ Seq.fill(5)("a")).toDF("k")
    assert(graft.pipeline.Skew.hotKeys(tied, "k", k = 1)
      .head().getString(0) == "a")
  }

  test("zOutliers flags exactly the rows past z, drops NULLs, exact-grid stats") {
    import spark.implicits._
    // 20 values at 10.0 and one far outlier: mean/std pull from the
    // exact cents grid, the single extreme row is the only flag
    val d = ((1L to 20L).map(i => (i, 10.0)) :+ (99L, 1000.0))
      .toDF("id", "x")
      .unionByName(Seq((100L, Option.empty[Double])).toDF("id", "x"))
    val got = Profiling.zOutliers(d, "id", "x", z = 3.0).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(99L))
    assert(got(0).getDouble(2) > 4.0) // far above the threshold
    // z larger than the extreme's score flags nothing
    assert(Profiling.zOutliers(d, "id", "x", z = 10.0).count() == 0)
    // the flagged set equals a direct two-pass computation
    val ev = Tables.load(spark, "/root/testdata/sf0.01", "events")
      .select(col("event_id"), col("value"))
    val cents = round(col("value") * 100, 0).cast("decimal(38,0)")
    val st = ev.agg(count(lit(1)).cast("double").as("n"),
      sum(cents).cast("double").as("s"),
      sum(cents * cents).cast("double").as("ss")).head()
    val (n, s, ss) = (st.getDouble(0), st.getDouble(1), st.getDouble(2))
    val mean = s / 100 / n
    val std = math.sqrt(ss / 10000 / n - mean * mean)
    val want = ev.filter(abs((col("value") - mean) / std) > 3.0)
      .count()
    assert(Profiling.zOutliers(ev, "event_id", "value").count() == want)
  }
}
