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

  /** Differentially-private count release (Laplace mechanism — Dwork,
    * McSherry, Nissim, Smith, "Calibrating Noise to Sensitivity in
    * Private Data Analysis", TCC 2006): the RELEASE-side complement of
    * the audits above — per-stratum counts published with calibrated
    * noise instead of raw (a count query has sensitivity 1, so the
    * noise scale is b = 1/ε). Output carries ONLY the noised value
    * (`released_milli` = 1000·count + noise in milli-units, clamped at
    * 0) — never the true count.
    *
    * The noise draw is the Laplace inverse CDF over a uniform u
    * derived from a portable md5 hash of (seed, stratum) on the ppm
    * grid — so a given (seed, stratum) releases ONE fixed value no
    * matter how often or where the job reruns (re-running a fresh
    * draw per execution would let an observer average the noise
    * away; the hash pins the draw, the same way a production release
    * pins per-release RNG state). The hash-seeded form is what makes
    * the release attestable: the oracle replays u and the inverse CDF
    * exactly.
    *
    * DEPLOYMENT PRECONDITION: the seeded draw exists FOR ORACLE
    * REPLAY. The formal ε guarantee holds only against observers who
    * do not know the seed — anyone holding (seed, stratum) can
    * recompute u, hence the exact noise value, and SUBTRACT it to
    * recover the true count. A real release must draw its seed fresh
    * per release and keep it secret (treat it like a key: never in
    * code, config repos, or logs); the gate's fixed `seed = 7` is a
    * test-fixture convention, not a release posture.
    *
    * Scale shape: ONE partial-aggregated groupBy (the count), then a
    * map-only noise column over |strata| rows. Nothing else.
    */
  def dpCountRelease(df: DataFrame, byCol: Column, epsMilli: Long,
      seed: Long): DataFrame = {
    require(epsMilli > 0, s"epsMilli must be positive, got $epsMilli")
    val u = (PortableHash.hash60(concat(lit(s"dp:$seed:"),
      col("stratum").cast("string"))) % 1000000L).cast("double")
    // u on the half-open ppm grid, never exactly 0, 0.5 or 1
    val uu = (u + lit(0.5d)) / lit(1000000.0d)
    val b = lit(1000.0d) / lit(epsMilli.toDouble) // 1/ε in count units
    // inverse CDF: u<.5 → b·ln(2u); u≥.5 → −b·ln(2−2u). Keep the
    // expression tree IDENTICAL to the oracle's SQL (same op order) —
    // ln/mul/floor on the same doubles are bit-equal cross-engine
    // (the dr1/tx10 discipline).
    val noiseMilli = when(uu < 0.5d,
      floor(lit(1000.0d) * (b * log(lit(2.0d) * uu))))
      .otherwise(floor(lit(1000.0d) * (-b * log(lit(2.0d) - lit(2.0d) * uu))))
    df.groupBy(byCol.as("stratum"))
      .agg(count(lit(1)).as("__n"))
      .select(col("stratum"), lit(epsMilli).as("eps_milli"),
        greatest(lit(0L), col("__n") * 1000L + noiseMilli)
          .as("released_milli"))
  }
}
