package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate (edit-distance-bounded) joins — the entity-resolution
  * primitive (match customer/supplier/vendor names across systems
  * that never shared keys) a data platform needs wherever records
  * arrive from independent sources.
  *
  * The classic scalable shape (Gravano et al., "Approximate String
  * Joins in a Database (Almost) for Free", VLDB 2001): q-gram
  * BLOCKING generates candidates through an equi-join — never an
  * all-pairs product — and an exact per-candidate edit-distance
  * verify keeps only true matches.
  */
object Fuzzy {

  /** Distinct positional-free q-grams per row: (id, gram). Strings
    * shorter than `q` contribute their whole text as the single gram
    * (substring truncates identically in any engine).
    */
  private def qgrams(df: DataFrame, idCol: String, textCol: String,
      q: Int): DataFrame =
    df.select(col(idCol), explode(expr(
      s"transform(sequence(1, greatest(length($textCol) - ${q - 1}, 1))," +
        s" i -> substring($textCol, i, $q))")).as("gram"))
      .distinct()

  /** Fuzzy join: all (left, right) pairs with
    * `levenshtein(leftText, rightText) <= maxDist`, found via q-gram
    * blocking. Returns (id1, id2, dist).
    *
    * Blocking: a candidate is any pair sharing at least one
    * NON-HOT q-gram. A gram occurring more than `maxGramFreq` times
    * on EITHER side is dropped from the join (the stop-shingle
    * discipline: a gram with G_l × G_r incidences yields G_l·G_r
    * candidate rows — boilerplate, not identity signal, and THE
    * quadratic blowup at corpus scale; guarding only one side would
    * leave a left-rare/right-hot gram free to fan out G_r-fold). The
    * union hot set is anti-joined on ONE side — that alone kills the
    * gram's join output. Recall caveat, documented not hidden: a true
    * match whose every shared gram is hot is missed — the standard
    * blocking trade; tune `maxGramFreq` up for higher recall at
    * quadratic candidate cost.
    *
    * Verify: candidates join their texts back and pass
    * `abs(len(s) − len(t)) <= maxDist` (free pre-filter — length is
    * a 1-Lipschitz function of edit distance) before the codegen'd
    * `levenshtein`. Cost is O(candidates · |s|·|t|), all map-side
    * after the candidate distinct.
    *
    * At 100 TB: grams explode ~|text| rows per record but collapse
    * through two distinct partial aggs; the candidate join is
    * gram-keyed and hot-guarded, so no task ever materializes a
    * super-linear pair set.
    */
  def fuzzyJoin(left: DataFrame, leftId: String, leftText: String,
      right: DataFrame, rightId: String, rightText: String,
      maxDist: Int, q: Int = 4, maxGramFreq: Long = 500L): DataFrame = {
    require(maxDist >= 0 && q >= 2,
      s"need maxDist >= 0 and q >= 2, got $maxDist, $q")
    val l = left.select(col(leftId).as("id1"), col(leftText).as("__s"))
    val r = right.select(col(rightId).as("id2"), col(rightText).as("__t"))
    val lg = qgrams(l, "id1", "__s", q)
    val rg = qgrams(r, "id2", "__t", q)
    def hotOf(g: DataFrame): DataFrame =
      g.groupBy("gram").agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxGramFreq).select("gram")
    val hot = hotOf(lg).unionByName(hotOf(rg)).distinct()
    val cand = lg.join(broadcast(hot), Seq("gram"), "left_anti")
      .join(rg, "gram")
      .select("id1", "id2").distinct()
    cand.join(l, "id1").join(r, "id2")
      .filter(abs(length(col("__s")) - length(col("__t"))) <= maxDist)
      .withColumn("dist", levenshtein(col("__s"), col("__t")))
      .filter(col("dist") <= maxDist)
      .select(col("id1"), col("id2"), col("dist").cast("long").as("dist"))
  }
}
