package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval contamination check: for every evaluation document, how
  * many of its word w-shingles also occur anywhere in the training
  * corpus. The standard leakage audit a training-data pipeline runs
  * before shipping a corpus (n-gram overlap against benchmark sets).
  *
  * Scale shape: the training side collapses to DISTINCT shingles (a
  * partial+final hash aggregation — the corpus text itself is never
  * carried past the map side), and eval meets train only through an
  * equi-join on the shingle, shuffle-partitioned by key. The eval side
  * is typically tiny (benchmarks) while train is the 100 TB side; the
  * join never materializes anything proportional to train × eval. For
  * repeated audits against a fixed train corpus, persist the distinct
  * train-shingle table once and reuse it.
  */
object Contamination {

  /** Per eval-document contamination: total distinct shingles, how
    * many appear in `train`, and their ratio. Documents shorter than
    * `w` words contribute their full text as one shingle (the same
    * convention the dedup shinglers use).
    */
  def ngramContamination(eval_ : DataFrame, train: DataFrame,
      idCol: String, textCol: String, w: Int = 8): DataFrame = {
    val evalSh = Dedup.wordShingles(eval_, idCol, textCol, w)
    val trainSh = Dedup.wordShingles(train, idCol, textCol, w)
      .select("shingle").distinct()
    val totals = evalSh.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"))
    val hits = evalSh.join(trainSh, Seq("shingle"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hit"))
    totals.join(hits, Seq(idCol), "left_outer")
      .select(col(idCol), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_shingles").cast("double")).as("contamination"))
  }
}
