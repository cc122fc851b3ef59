package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as primitives: as-of join and
  * (no-equi-key) range join, both expressed as compositions that keep
  * the work linear-ish and shuffle-partitioned — never a cartesian,
  * never a per-row subquery.
  */
object Temporal {

  /** As-of join: for each left row, attach the latest `payloadCol`
    * among right rows of the same key with right ts ≤ left ts (ties
    * at equal ts count as "before"; among same-ts right rows the
    * largest payload wins, making the result deterministic).
    *
    * Implementation is the union+window formulation: tag both sides,
    * union, and take the running `last(payload, ignoreNulls)` per key
    * in (ts, tag, payload) order. ONE shuffle on the key, windows per
    * key are as parallel as the key cardinality — the classic
    * scalable as-of shape (vs. a range join that replicates, or a
    * per-row argmax subquery that never distributes).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCol: String, asofCol: String): DataFrame = {
    val lt = left.withColumn("__is_left", lit(1))
    val rt = right.select(col(keyCol), col(tsCol),
      col(payloadCol).as("__pay")).withColumn("__is_left", lit(0))
    val all = lt.unionByName(rt, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol).asc, col("__is_left").asc, col("__pay").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    all.withColumn(asofCol, last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .drop("__is_left", "__pay")
  }

  /** Resample an event series to fixed-width time buckets per key and
    * forward-fill the gaps — the downsample + gap-fill primitive every
    * time-series feature pipeline needs (sqlpp has no temporal
    * operators at all; this is beyond-reference surface, SURVEY §2.2).
    *
    * Three stages, each scale-honest:
    *   1. bucket aggregation — `max(valueCol)` + `count(*)` per
    *      (key, bucket), ONE partial-aggregated shuffle on the key;
    *      the bucket id is integer µs division, exact in both engines.
    *   2. spine — per-key `sequence(min_bucket, max_bucket)` exploded;
    *      spine rows ∝ key-span/bucket, never keys × global span, so a
    *      key active for a day never pays the corpus's full range.
    *   3. forward fill — running `last(value, ignoreNulls)` per key in
    *      bucket order; one window, parallel in the key cardinality.
    * Buckets before a key's first observation keep a NULL fill (there
    * is nothing to carry); `n_obs = 0` marks filled gaps.
    *
    * At 100 TB the plan stays: partial agg → one |keys·span|-row frame
    * → keyed window. No global sort, no per-row subquery, and the
    * spine explode is bounded by the *observed* span of each key.
    */
  def resampleFill(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, bucketSeconds: Long): DataFrame = {
    val busUs = bucketSeconds * 1000000L
    // FLOOR division, not `div` (which truncates toward zero): a
    // pre-1970 timestamp must land in the day it belongs to, matching
    // both DuckDB's `//` and the streaming twin's Math.floorDiv —
    // (a − pmod(a, b)) div b is floorDiv in exact integer arithmetic
    val b = events
      .withColumn("__bucket", expr(
        s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), $busUs))" +
          s" div $busUs"))
      .groupBy(col(keyCol), col("__bucket"))
      .agg(max(col(valueCol)).as("__v"), count(lit(1)).as("__n"))
    val spine = b.groupBy(col(keyCol))
      .agg(min("__bucket").as("__lo"), max("__bucket").as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as("__bucket"))
    val w = Window.partitionBy(keyCol).orderBy("__bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(b, Seq(keyCol, "__bucket"), "left")
      .select(col(keyCol),
        timestamp_micros(col("__bucket") * busUs).as("bucket_ts"),
        last(col("__v"), ignoreNulls = true).over(w).as("val_filled"),
        coalesce(col("__n"), lit(0L)).as("n_obs"))
  }

  /** Range join with no equi key: each interval explodes to the
    * integer bins it covers, points join on their bin, and the exact
    * range predicate filters. Cost is O(points + intervals·span/bin)
    * rows through an equi-join — the bin size trades interval
    * replication against join selectivity; never an all-pairs
    * product. Intervals are half-open [lo, hi).
    */
  def rangeJoinBinned(points: DataFrame, valueCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binSize: Double): DataFrame = {
    val ib = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binSize).cast("long"),
        floor(col(hiCol) / binSize).cast("long"))))
    val pb = points.withColumn("__bin",
      floor(col(valueCol) / binSize).cast("long"))
    pb.join(ib, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }

  /** SCD Type-2 dimension build from a change log (Kimball's slowly
    * changing dimension): per key, the MULTI-ATTRIBUTE payload history
    * compacted into versioned rows with `[valid_from, valid_to)`
    * intervals — `valid_to` is NULL on the current version. Real
    * dimensions version a tuple of attributes, so the payload columns
    * are packed into ONE struct: change detection is a single
    * null-SAFE struct comparison (`<=>` — a NULL attribute value is a
    * real dimension state, so NULL→x and x→NULL both open versions,
    * and a NULL re-assertion is compacted like any other; the `=!=`
    * form silently dropped NULL states), and same-timestamp changes
    * collapse to the struct-greatest payload (lexicographic by
    * attribute order — the ev5 last-write-wins tie rule, now total
    * over the whole payload). Consecutive re-assertions of an
    * unchanged payload are compacted away (a CDC feed re-asserts
    * unchanged state all the time; re-emitting would bloat the
    * dimension and break as-of joins on version count).
    *
    * Scale shape: ONE shuffle on the key — the dedupe agg, the
    * change-detection lag() and the interval lead() all run on the
    * same (key) partitioning and (ts) order, so Catalyst plans a
    * single Exchange feeding one agg and one Window, regardless of
    * attribute count (the struct rides the same exchange). Key-skew
    * bounded: windows are per key, state is one row.
    */
  def scd2Build(changes: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "scd2Build needs at least one value column")
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    // partition by the KEY up front: hashpartitioning(key) satisfies
    // the (key, ts) agg's clustering AND both window passes, so the
    // whole build is one Exchange (a groupBy-first shape would shuffle
    // once on (key, ts) and again on key for the windows). CDC feeds
    // rarely duplicate (key, ts), so the lost map-side combine costs
    // ~nothing.
    val latest = changes
      .repartition(col(keyCol))
      .groupBy(col(keyCol), col(tsCol))
      .agg(max(struct(valueCols.map(col): _*)).as("__v"))
    latest
      .withColumn("__prev", lag(col("__v"), 1).over(byKey))
      // keep the first row per key (lag NULL: `x <=> NULL` is false,
      // so the negation keeps it) and every actual payload change —
      // null-safe, so NULL-valued attributes version correctly
      .filter(!(col("__v") <=> col("__prev")))
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKey))
      .select(col(keyCol) +:
        valueCols.map(c => col(s"__v.`$c`").as(c)) ++: Seq(
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"),
        (row_number().over(byKey)).cast("int").as("version")): _*)
  }

  /** Single-attribute SCD2 (the original r11 form): the payload
    * column comes back named `value`. Same-ts LWW is `max` over the
    * lone attribute — identical to the struct-max over a 1-field
    * struct except when every colliding value is NULL (struct-max
    * then yields the NULL state as a trackable version, which is the
    * correct SCD2 reading; plain max() would skip it).
    */
  def scd2Build(changes: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame =
    scd2Build(changes, keyCol, tsCol, Seq(valueCol))
      .withColumnRenamed(valueCol, "value")
}
