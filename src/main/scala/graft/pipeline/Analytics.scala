package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch event analytics: cohort retention and funnel conversion —
  * the two queries every event warehouse runs daily, shaped so no
  * per-user state is unbounded and no step materializes the full
  * event set more than once.
  */
object Analytics {

  /** Cohort retention matrix: users are cohorted by their first
    * active day; output counts, per (cohort day, day offset), the
    * users of that cohort active `offset` days after joining.
    *
    * Scale shape — three shuffles, all map-side combined, no join:
    *   1. distinct (user, day): partial agg; raw event volume
    *      collapses to at most users x calendar-days rows before the
    *      exchange, so a hot user's millions of events shrink to its
    *      active-day count on the map side.
    *   2. per-user window min for the cohort day: one shuffle on
    *      user; the window frame buffers a user's DISTINCT days,
    *      bounded by the calendar span regardless of event volume —
    *      not a skew funnel.
    *   3. final (cohort_day, day_offset) count: since rows are
    *      already distinct per (user, day) and a user has exactly one
    *      cohort day, count(*) IS the distinct-user count — no
    *      countDistinct Expand at the widest stage.
    */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val userDays = events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("day"))
      .distinct()
    val cohorted = userDays.withColumn("cohort_day",
      min("day").over(Window.partitionBy("user_id")))
    cohorted
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("int").as("day_offset"))
      .agg(count(lit(1)).as("n_active_users"))
  }

  /** Strict-sequence funnel: for ordered step event types
    * (e.g. view -> click -> purchase), a user converts to step i only
    * via an event at-or-after their step i-1 conversion time; each
    * conversion time is the EARLIEST event satisfying that order.
    * Returns the per-user stage frame (user_id, t1..tk) with NULL
    * from the first unreached step; [[funnel]] summarizes it.
    *
    * Scale shape — a linear left-join chain, one final aggregation:
    * each step scans events once with its type filter pushed to the
    * scan, joins co-partitioned on user (hash equi join; the step
    * predicate ts >= t_{i-1} rides the join condition so a user who
    * never reached step i-1 gets NULL, not dropped), and re-aggregates
    * min(ts) per user. Per-user aggregation state is k timestamps —
    * bounded. Step counts come from ONE count-non-null aggregation
    * over the final (user, t_1..t_k) frame, exploded to rows: no
    * per-step actions, no recomputed subtrees.
    */
  def funnelStages(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got ${steps.mkString(", ")}")
    def stepEvents(i: Int) = events
      .filter(col(typeCol) === steps(i))
      .select(col(userCol).as("user_id"), col(tsCol).as("__ev_ts"))
    var acc = stepEvents(0).groupBy("user_id").agg(min("__ev_ts").as("t1"))
    for (i <- 1 until steps.size) {
      val prevT = s"t$i"
      val carried = (1 to i).map(j => min(s"t$j").as(s"t$j"))
      // bind the step frame ONCE: each stepEvents() call is a fresh
      // plan with fresh expression ids, so referencing a second call
      // inside the join condition would point at a frame that is not
      // the one being joined
      val se = stepEvents(i)
      acc = acc
        .join(se,
          acc("user_id") === se("user_id") &&
            se("__ev_ts") >= acc(prevT),
          "left_outer")
        .drop(se("user_id"))
        .groupBy("user_id")
        .agg(carried.head, carried.tail :+ min("__ev_ts").as(s"t${i + 1}"): _*)
    }
    acc
  }

  /** Sliding-window active users: for every window of `windowDays`
    * calendar days (stepped daily), the count of distinct users active
    * in it — the rolling-DAU/WAU/MAU family.
    *
    * Scale shape — bounded amplification, no countDistinct Expand, no
    * range-window over raw events:
    *   1. distinct (user, day) partial agg first: raw event volume
    *      (hot users included) collapses map-side to at most
    *      users × calendar-days rows.
    *   2. each user-day explodes into the `windowDays` windows that
    *      contain it — a bounded ×windowDays Generate inside codegen,
    *      NOT a per-user range window (whose frame would rescan a
    *      user's whole history per row).
    *   3. distinct (window, user) partial agg, then a count(*) per
    *      window that IS the distinct-user count — the same
    *      two-level trick as [[cohortRetention]], never a
    *      countDistinct over the widest stage.
    * Windows with no active day are absent (a corpus-scale result
    * carries no zero rows).
    */
  def slidingActiveUsers(events: DataFrame, windowDays: Int = 7,
      userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val userDays = events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("day"))
      .distinct()
    userDays
      .select(col("user_id"), explode(sequence(lit(0),
        lit(windowDays - 1))).as("__o"), col("day"))
      .select(col("user_id"), date_sub(col("day"), col("__o"))
        .as("window_start"))
      .distinct()
      .groupBy("window_start")
      .agg(count(lit(1)).as("n_active_users"))
  }

  /** Funnel summary: converted-user count per step, from ONE
    * count-non-null aggregation over [[funnelStages]]'s per-user
    * frame, exploded to (step_idx, step_name, n_users) rows.
    */
  def funnel(events: DataFrame, steps: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    val acc = funnelStages(events, steps, userCol, tsCol, typeCol)
    val counts = acc.agg(
      count(col("t1")).as("c1"),
      (2 to steps.size).map(i => count(col(s"t$i")).as(s"c$i")): _*)
    val stepStructs = array(steps.indices.map { i =>
      struct(lit(i + 1).as("step_idx"), lit(steps(i)).as("step_name"),
        col(s"c${i + 1}").as("n_users"))
    }: _*)
    counts.select(explode(stepStructs).as("s")).select("s.*")
  }

  /** Multi-level daily rollup in ONE pass: per (event_type, day),
    * per event_type, and the grand total, distinguished by
    * `grouping_id` (standard bitmask, first column = high bit) — the
    * pre-aggregated table a dashboard reads instead of re-scanning
    * events. Spark plans ROLLUP via Expand, which this codebase
    * otherwise avoids — but here Expand multiplies rows by exactly
    * the LEVEL count (3), a fixed constant, not by distinct-value
    * cardinality (the countDistinct Expand that retention/profiling
    * route around), and map-side partial aggregation collapses each
    * level before the single shuffle. Value sums ride the exact
    * integer-cents grid, so totals are fold-order-independent on any
    * cluster.
    */
  def dailyRollup(events: DataFrame): DataFrame =
    events.select(col("event_type"), to_date(col("ts")).as("day"),
        col("value"))
      .rollup(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("value_cents"),
        grouping_id().as("gid"))
}
