package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: when one join key carries a large share
  * of the rows, the shuffle sends that key's whole mass to one task.
  * Salting splits each hot key into `saltFactor` sub-keys: the big
  * side gets a deterministic per-row salt, the small side is
  * replicated once per salt value, and the join runs on
  * (keys..., salt) — same result set, `saltFactor`-way parallelism on
  * every key. (AQE's skew-join handles sort-merge cases adaptively;
  * explicit salting also covers aggregations-after-join and engines
  * or shapes AQE won't rewrite.)
  */
object Skew {

  /** Inner equi-join with the big side salted. The salt is derived
    * from a hash of the big side's whole row, so the routing is
    * deterministic and needs no random state; the result equals the
    * unsalted join exactly.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*),
        lit(saltFactor.toLong)))
    val smallReplicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1))))
    bigSalted.join(smallReplicated, keys :+ "__salt").drop("__salt")
  }

  /** Hot-key report: the `k` heaviest values of a prospective
    * join/group key with their row share — the diagnostic that
    * decides between a plain equi-join and [[saltedJoin]] (or a
    * bigger `saltFactor`). Run it on the key BEFORE shipping a join
    * that might funnel one task; a key with share >> 1/parallelism
    * is the skew that salting exists for.
    *
    * One partial+final count aggregation (state = distinct keys, the
    * same bound any join on that key pays) + a per-partition-heap
    * top-k; the total-row count re-aggregates the counts frame — the
    * input is scanned ONCE — and joins in as a lazy one-row cross.
    * No driver action.
    */
  def hotKeys(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    require(k > 0, s"hotKeys needs k > 0, got $k")
    val counts = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum("n_rows").as("__total"))
    counts.crossJoin(total)
      .select(col(keyCol), col("n_rows"),
        (col("n_rows").cast("double") / col("__total")).as("share"))
      .orderBy(col("n_rows").desc, col(keyCol).asc)
      .limit(k)
  }

  /** Exact output cardinality of an inner equi-join WITHOUT running
    * it: Σ over matched keys of c_left(k)·c_right(k), plus side row
    * counts and the matched-key count. The pre-flight check before a
    * join that might explode (a 100 TB join whose answer is 100 PB is
    * cheaper to learn about from this one-row report than from the
    * shuffle that dies): est rows >> max(n_left, n_right) means a
    * many-to-many key — reconsider the key, pre-aggregate a side, or
    * plan for the output size.
    *
    * Scale shape: each side collapses to (key, count) via one partial
    * aggregation — the join that follows is distinct-keys ×
    * distinct-keys on the SAME equi key (never row × row), and the
    * final sum is one scalar aggregation. Side totals re-aggregate
    * the counts frames (each input scanned once) and arrive as lazy
    * one-row crosses. Returns one row:
    * (n_left, n_right, n_matched_keys, out_rows).
    */
  def joinCardinality(left: DataFrame, right: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "joinCardinality needs >= 1 key column")
    def keyCounts(df: DataFrame) = df
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
    val lc = keyCounts(left)
    val rc = keyCounts(right).withColumnRenamed("__c", "__c2")
    val nLeft = lc.agg(sum("__c").as("n_left"))
    val nRight = rc.agg(sum("__c2").as("n_right"))
    lc.join(rc, keys)
      .agg(count(lit(1)).as("n_matched_keys"),
        coalesce(sum(col("__c") * col("__c2")), lit(0L)).as("out_rows"))
      .crossJoin(broadcast(nLeft)).crossJoin(broadcast(nRight))
      .select(
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"),
        col("n_matched_keys"), col("out_rows"))
  }
}
