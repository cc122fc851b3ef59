package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Re-identification-risk profiling for tabular training data: the
  * k-anonymity audit (Sweeney, "k-Anonymity: a model for protecting
  * privacy", IJUFKS 2002) every dataset release gate runs before
  * tabular records ship in a corpus. Complements the text-side PII
  * redaction in [[TextAnalysis.redactPii]] — that scrubs free text,
  * this measures whether the *structured* columns single people out.
  */
object Privacy {

  /** k-anonymity profile over a set of (already generalized)
    * quasi-identifier columns: every QI combination is an equivalence
    * class; a class smaller than k means its members are
    * re-identifiable to within that class.
    *
    * Output is one row per generalization stratum (`byCol`): number
    * of equivalence classes, the smallest class (the table's
    * k-anonymity level restricted to that stratum), how many classes
    * and rows sit below k, and the rows at risk as a share. Callers
    * pass generalization *expressions* (bucketed balances, truncated
    * zips) as `quasiIds` — generalization is the knob that trades
    * utility for anonymity, so it belongs to the caller, not the
    * audit.
    *
    * Scale shape: ONE partial-aggregated shuffle on the QI tuple
    * (class sizes), then a tiny second agg over |classes| rows keyed
    * by the stratum. No windows, no joins; at 100 TB the first agg is
    * the whole cost and it map-side combines — exactly a groupBy
    * count. Skewed QI tuples (one giant class) are harmless: a big
    * class is the SAFE case, and a count partial-agg absorbs it
    * map-side.
    */
  def kAnonymityProfile(df: DataFrame, byCol: Column,
      quasiIds: Seq[Column], k: Long): DataFrame = {
    val classes = df
      .groupBy(byCol.as("stratum") +: quasiIds.zipWithIndex.map {
        case (c, i) => c.as(s"__qi$i") }: _*)
      .agg(count(lit(1)).as("__size"))
    classes.groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_classes"),
        min("__size").as("k_anonymity"),
        sum(when(col("__size") < k, 1L).otherwise(0L)).as("risky_classes"),
        sum(when(col("__size") < k, col("__size")).otherwise(0L))
          .as("risky_rows"),
        sum("__size").as("n_rows"))
      // basis points via integral div (long/long would widen to double)
      .withColumn("risky_pct_bp", expr("risky_rows * 10000 div n_rows"))
  }

  /** l-diversity audit (Machanavajjhala et al., "l-Diversity: Privacy
    * Beyond k-Anonymity", TKDD 2007): k-anonymity bounds CLASS SIZE,
    * but a large class whose members all share one sensitive value
    * still leaks it (the homogeneity attack). This measures, per QI
    * equivalence class, how many DISTINCT sensitive values it holds,
    * and rolls up per stratum: the minimum diversity (the table's
    * l-level) and the classes/rows below `l`.
    *
    * Scale shape: one partial agg on (QI, sensitive) — the distinct —
    * then (QI) then (stratum): three shrinking aggregations, no
    * Expand-based countDistinct, no windows.
    */
  def lDiversityProfile(df: DataFrame, byCol: Column,
      quasiIds: Seq[Column], sensitive: Column, l: Long): DataFrame = {
    val qiCols = quasiIds.zipWithIndex.map { case (c, i) => c.as(s"__qi$i") }
    val perValue = df
      .groupBy((byCol.as("stratum") +: qiCols) :+ sensitive.as("__sv"): _*)
      .agg(count(lit(1)).as("__rows"))
    val perClass = perValue
      .groupBy(col("stratum") +:
        quasiIds.indices.map(i => col(s"__qi$i")): _*)
      .agg(count(lit(1)).as("__div"), sum("__rows").as("__sz"))
    perClass.groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_classes"),
        min("__div").as("l_diversity"),
        sum(when(col("__div") < l, 1L).otherwise(0L)).as("homog_classes"),
        sum(when(col("__div") < l, col("__sz")).otherwise(0L))
          .as("homog_rows"),
        sum("__sz").as("n_rows"))
  }
}
