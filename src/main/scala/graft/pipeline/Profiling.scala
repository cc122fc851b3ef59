package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus profiling: the "know your data" pass a pipeline runs before
  * and after every transformation (did the filter skew the length
  * distribution? did dedup drop a source?).
  */
object Profiling {

  /** Per-column numeric profile — row count, null count, exact
    * distinct count, min/max, exact quartiles — as one row per column.
    *
    * Scale shape: ONE wide aggregation over a single scan (the
    * multiple DISTINCT aggregates plan through Expand), then a
    * driver-free unpivot of the single result row via explode. The
    * quartiles use Spark's exact `percentile` so an external oracle
    * matches bit-for-bit; a 100 TB profile would swap them for
    * `approx_percentile` (same plan shape, bounded memory) — the
    * exact form is a deliberate choice for attestable profiling of
    * bounded corpora, not an oversight.
    */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c).cast("double")).as(s"${c}__min"),
        max(col(c).cast("double")).as(s"${c}__max"),
        percentile(col(c), lit(0.25)).as(s"${c}__p25"),
        percentile(col(c), lit(0.5)).as(s"${c}__p50"),
        percentile(col(c), lit(0.75)).as(s"${c}__p75"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val structs = array(cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"${c}__n").as("n_rows"),
        (col(s"${c}__n") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"),
        col(s"${c}__p25").as("p25"),
        col(s"${c}__p50").as("median"),
        col(s"${c}__p75").as("p75"))
    }: _*)
    wide.select(explode(structs).as("s")).select("s.*")
  }
}
