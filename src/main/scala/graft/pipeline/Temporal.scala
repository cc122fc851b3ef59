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
}
