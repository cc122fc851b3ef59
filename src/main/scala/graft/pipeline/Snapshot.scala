package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot comparison: the regression gate a pipeline runs
  * between two versions of a 100 TB dataset ("what did the new crawl
  * / new filter change?") without ever diffing bytes pairwise —
  * rows meet only through one equi-join on the key, and content
  * equality is a fixed-width fingerprint computed map-side.
  */
object Snapshot {

  private val Sep = "\u0001"
  private val NullSentinel = "\u0000"

  private def fingerprint(fpCols: Seq[String]) =
    md5(concat_ws(Sep,
      fpCols.map(c => coalesce(col(c).cast("string"), lit(NullSentinel))): _*))

  /** Row-level diff of two snapshots sharing a key.
    *
    * Each side gets a map-side md5 fingerprint over `fpCols`
    * (U+0001-separated with a U+0000 NULL sentinel — so
    * (NULL,"a") != ("","a") and ("a","bc") != ("ab","c") unless a
    * value embeds those control bytes; acceptable for a change
    * DETECTOR and stated here); a full outer join on `keyCols` then
    * classifies every key as 'added' (v2 only), 'removed' (v1 only),
    * 'changed' (both, fingerprints differ) or 'unchanged'.
    *
    * Scale shape: fingerprinting prunes each side to key + one
    * 32-char hash before the exchange — the join shuffles fixed-width
    * rows regardless of how wide the payload columns are, and the
    * only shuffle is that one equi-join on the key. Keys are the
    * caller's contract: a duplicated key multiplies join rows like
    * any join would (dedup first — [[Dedup.exactDedup]] — if the
    * snapshot key is not unique).
    *
    * Returns one row per key in either snapshot:
    * (keyCols..., status, fp_v1, fp_v2).
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, keyCols: Seq[String],
      fpCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs >= 1 key column")
    require(fpCols.nonEmpty, "snapshotDiff needs >= 1 fingerprint column")
    val a = v1.select(keyCols.map(col) :+ fingerprint(fpCols).as("fp_v1"): _*)
    val b = v2.select(keyCols.map(col) :+ fingerprint(fpCols).as("fp_v2"): _*)
    a.join(b, keyCols, "full_outer").select(
      keyCols.map(col) ++ Seq(
        when(col("fp_v1").isNull, lit("added"))
          .when(col("fp_v2").isNull, lit("removed"))
          .when(col("fp_v1") === col("fp_v2"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("fp_v1"), col("fp_v2")): _*)
  }

  /** Grouped summary of [[snapshotDiff]]: counts per
    * (groupCols..., status), where group columns are taken from
    * whichever side has the row (v2 wins for keys present in both —
    * the diff reports the NEW snapshot's grouping for surviving
    * rows, the old one's only for removals).
    *
    * One extra map-side projection + one partial-agg'd count on top
    * of the diff join; group cardinality bounds the result, not
    * corpus size.
    */
  def snapshotDiffSummary(v1: DataFrame, v2: DataFrame,
      keyCols: Seq[String], fpCols: Seq[String],
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "summary needs >= 1 group column")
    def slim(df: DataFrame, suffix: String): DataFrame = df.select(
      keyCols.map(col) ++
        groupCols.map(c => col(c).as(s"${c}_$suffix")) :+
        fingerprint(fpCols).as(s"fp_$suffix"): _*)
    slim(v1, "v1").join(slim(v2, "v2"), keyCols, "full_outer")
      .select(
        // group side picked by row PRESENCE (fp_v2 is non-null iff
        // the key exists in v2), not value-level coalesce — a
        // surviving row whose v2 group is legitimately NULL must
        // report NULL, not fall back to its v1 group
        groupCols.map(c =>
          when(col("fp_v2").isNotNull, col(s"${c}_v2"))
            .otherwise(col(s"${c}_v1")).as(c)) :+
          when(col("fp_v1").isNull, lit("added"))
            .when(col("fp_v2").isNull, lit("removed"))
            .when(col("fp_v1") === col("fp_v2"), lit("unchanged"))
            .otherwise(lit("changed")).as("status"): _*)
      .groupBy(groupCols.map(col) :+ col("status"): _*)
      .agg(count(lit(1)).as("n_rows"))
  }
}
