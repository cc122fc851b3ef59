package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Temporal

/** Hand-computed edge cases for the temporal join operators. */
class TemporalSpec extends SparkTestBase {

  def ts(m: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:${m}%02d:00")

  test("as-of join: latest right at-or-before, per key, null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 7L, ts(10)), // after right rows at 5 and 10 → picks 10 (tie counts)
      (2L, 7L, ts(7)),  // between 5 and 10 → picks 5
      (3L, 7L, ts(1)),  // before any right → null
      (4L, 9L, ts(30))  // key with no right rows at all → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts(5), "v5"), (7L, ts(10), "v10"), (8L, ts(1), "other"))
      .toDF("user_id", "ts", "tag")
    val got = Temporal.asofJoin(left, right, "user_id", "ts", "tag", "last_tag")
      .select("event_id", "last_tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("v10"), 2L -> Some("v5"),
      3L -> None, 4L -> None))
  }

  test("as-of join tie between same-ts right rows picks the largest payload") {
    import spark.implicits._
    val left = Seq((1L, 7L, ts(10))).toDF("event_id", "user_id", "ts")
    val right = Seq((7L, ts(10), "a"), (7L, ts(10), "b"))
      .toDF("user_id", "ts", "tag")
    val got = Temporal.asofJoin(left, right, "user_id", "ts", "tag", "last_tag")
      .collect()(0).getAs[String]("last_tag")
    assert(got == "b")
  }

  test("scd2Build: compaction, LWW same-ts collapse, intervals, one exchange") {
    import spark.implicits._
    val changes = Seq(
      (1L, ts(1), "a"),          // v1: a from 10:01
      (1L, ts(3), "a"),          // re-assertion — compacted away
      (1L, ts(5), "b"),          // v2: b from 10:05
      (1L, ts(5), "a"),          // same-ts collision → max("b","a") = b
      (1L, ts(9), "a"),          // v3: back to a (a≠b, new version)
      (2L, ts(2), "x")           // lone row → single current version
    ).toDF("user_id", "ts", "state")
    val got = Temporal.scd2Build(changes, "user_id", "ts", "state")
      .orderBy("user_id", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getTimestamp(3)), r.getBoolean(4), r.getInt(5)))
    assert(got.toSeq == Seq(
      (1L, "a", Some(ts(5)), false, 1),
      (1L, "b", Some(ts(9)), false, 2),
      (1L, "a", None, true, 3),
      (2L, "x", None, true, 1)))
    // one shuffle serves the dedupe agg and both window passes
    val p = Temporal.scd2Build(changes, "user_id", "ts", "state")
      .queryExecution.executedPlan.toString
    assert(p.split("Exchange hashpartitioning").length - 1 == 1, p.take(1200))
  }

  test("scd2Build: NULL attribute states version null-safely (ADVICE r11)") {
    import spark.implicits._
    // x → NULL → x: the null-unsafe =!= form dropped the NULL state
    // (never a version) AND compacted the revert (x "unchanged"),
    // collapsing three real states into one row
    val changes = Seq(
      (1L, ts(1), Some("x")),
      (1L, ts(5), None),
      (1L, ts(9), Some("x"))
    ).toDF("user_id", "ts", "state")
    val got = Temporal.scd2Build(changes, "user_id", "ts", "state")
      .orderBy("valid_from").collect()
      .map(r => (Option(r.getString(1)), r.getInt(5)))
    assert(got.toSeq == Seq((Some("x"), 1), (None, 2), (Some("x"), 3)))
    // and a NULL re-assertion compacts like any other value
    val reassert = Seq((1L, ts(1), None: Option[String]),
      (1L, ts(5), None)).toDF("user_id", "ts", "state")
    assert(Temporal.scd2Build(reassert, "user_id", "ts", "state")
      .count() == 1)
  }

  test("scd2Build multi-attribute: struct change detection, tuple LWW, one exchange") {
    import spark.implicits._
    val changes = Seq(
      (1L, ts(1), "a", 1.0, "p"),
      (1L, ts(3), "a", 1.0, "p"), // identical payload — compacted
      (1L, ts(5), "b", 1.0, "p"), // same-ts LWW: first attr dominates
      (1L, ts(5), "a", 9.0, "p"),
      (1L, ts(9), "a", 1.0, "q")  // only props changed — NEW version
    ).toDF("user_id", "ts", "event_type", "value", "props")
    val dim = Temporal.scd2Build(changes, "user_id", "ts",
      Seq("event_type", "value", "props"))
    val got = dim.orderBy("valid_from").collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getString(3),
        r.getBoolean(6), r.getInt(7)))
    assert(got.toSeq == Seq(
      ("a", 1.0, "p", false, 1),
      ("b", 1.0, "p", false, 2),
      ("a", 1.0, "q", true, 3)))
    // attribute count doesn't change the scale shape: still ONE
    // exchange serving the dedupe agg and both windows
    val p = dim.queryExecution.executedPlan.toString
    assert(p.split("Exchange hashpartitioning").length - 1 == 1, p.take(1200))
  }

  test("binned range join matches a plain range predicate, incl. boundaries") {
    import spark.implicits._
    val points = Seq((1L, 0.0), (2L, 1.5), (3L, 1.499), (4L, 7.999),
      (5L, 8.0), (6L, 99.9)).toDF("id", "v")
    val ivals = Seq((0.0, 1.5, "lo"), (1.5, 8.0, "mid"), (8.0, 100.0, "hi"))
      .toDF("lo", "hi", "band")
    val got = Temporal.rangeJoinBinned(points, "v", ivals, "lo", "hi", 2.0)
      .select("id", "band").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // [lo, hi): 1.5 falls in "mid", 8.0 in "hi"
    assert(got == Map(1L -> "lo", 2L -> "mid", 3L -> "lo", 4L -> "mid",
      5L -> "hi", 6L -> "hi"))
    // and it agrees with the naive cross-join+filter on this data
    val naive = points.crossJoin(ivals)
      .filter(col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "band").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == naive)
  }
}
