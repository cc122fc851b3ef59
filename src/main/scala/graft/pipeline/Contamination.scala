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
    *
    * `bloomPrefilter = true` is the 100 TB path: the eval side is
    * benchmark-sized, so its distinct shingles fit a driver-built
    * Bloom filter (a few MB at the default 1% fpp) that is broadcast
    * and applied MAP-SIDE to the train scan — train shingles that
    * cannot possibly match never enter the distinct aggregation or
    * the shuffle. Results are EXACT either way: a Bloom false
    * positive only lets a useless shingle through to the equi-join,
    * which then drops it. Building the sketch runs one eager job over
    * the (small) eval side at composition time — this operator is an
    * audit job, so the cost is part of the audit.
    */
  def ngramContamination(eval_ : DataFrame, train: DataFrame,
      idCol: String, textCol: String, w: Int = 8,
      bloomPrefilter: Boolean = false,
      bloomFpp: Double = 0.01): DataFrame = {
    val evalSh = Dedup.wordShingles(eval_, idCol, textCol, w)
    val trainSh0 = Dedup.wordShingles(train, idCol, textCol, w)
    val trainPre =
      if (!bloomPrefilter) trainSh0
      else {
        val evalDistinct = evalSh.select("shingle").distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = evalDistinct.count()
        val bf = evalDistinct.stat.bloomFilter("shingle",
          math.max(n, 1000L), bloomFpp)
        evalDistinct.unpersist(false)
        val bc = eval_.sparkSession.sparkContext.broadcast(bf)
        val mightContain = udf((s: String) =>
          s != null && bc.value.mightContainString(s))
        trainSh0.filter(mightContain(col("shingle")))
      }
    val trainSh = trainPre.select("shingle").distinct()
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

  /** Train-side decontamination: the training documents to DROP
    * because they carry at least `minHits` distinct word w-shingles
    * of the evaluation set — the acting flip side of
    * [[ngramContamination]] (which audits the eval side). Returns
    * (idCol, n_hits) for the offending train documents; the caller
    * anti-joins them away.
    *
    * Same scale shape: eval collapses to its distinct shingles (the
    * benchmark-sized side), train shingles meet them in ONE equi join
    * shuffle-partitioned on the shingle, and per-train-doc hit counts
    * come from a partial aggregation — never train × eval, and the
    * train text itself is dropped map-side after shingling.
    */
  def contaminatedTrainDocs(train: DataFrame, eval_ : DataFrame,
      idCol: String, textCol: String, w: Int = 8,
      minHits: Long = 1L): DataFrame = {
    require(minHits >= 1L, s"minHits must be >= 1, got $minHits")
    val evalSh = Dedup.wordShingles(eval_, idCol, textCol, w)
      .select("shingle").distinct()
    // wordShingles is distinct per document, so the count below is
    // the number of DISTINCT leaked shingles
    val trainSh = Dedup.wordShingles(train, idCol, textCol, w)
    trainSh.join(evalSh, Seq("shingle"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }

  /** Pairwise source-overlap matrix: for every pair of strata, the
    * size of the intersection of their distinct word-w-shingle sets
    * and its Jaccard index — the cross-source redundancy diagnostic
    * run before mixing corpora (two crawls of the same sites will
    * light up here long before per-document dedup sees them).
    * Returns (source_a, source_b, overlap, n_a, n_b, jaccard) for
    * pairs with at least one shared shingle, source_a < source_b.
    *
    * Scale shape: the corpus collapses to DISTINCT (stratum, shingle)
    * rows in one partial+final aggregation — text never travels —
    * and pairs meet through a self-equi-join on the shingle, so a
    * shingle present in k strata contributes C(k,2) pair rows,
    * bounded by the stratum count squared, never by corpus size. The
    * stratum cardinality is small by contract (sources, not
    * documents) — the same contract as mixtureRates' target table.
    */
  def sourceOverlap(df: DataFrame, strataCol: String, textCol: String,
      w: Int = 8): DataFrame = {
    val sh = Dedup.wordShingles(df, strataCol, textCol, w).distinct()
    val sizes = sh.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val inter = sh.toDF("source_a", "shingle")
      .join(sh.toDF("source_b", "shingle"), "shingle")
      .filter(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("overlap"))
    inter
      .join(sizes.toDF("source_a", "n_a"), "source_a")
      .join(sizes.toDF("source_b", "n_b"), "source_b")
      .select(col("source_a"), col("source_b"), col("overlap"),
        col("n_a"), col("n_b"),
        (col("overlap").cast("double") /
          (col("n_a") + col("n_b") - col("overlap")).cast("double"))
          .as("jaccard"))
  }

  /** Winnowing-fingerprint contamination: for every (train, eval)
    * document pair sharing at least `minShared` winnowing fingerprint
    * hashes ([[Dedup.winnowFingerprints]]), the shared count and the
    * fraction of the eval document's fingerprints found in that train
    * document. This is the MOSS overlap report applied to leakage
    * auditing: unlike the exact w-gram audit ([[ngramContamination]],
    * which tells you THAT an eval set leaks), the fingerprint pair
    * report tells you WHICH train document carries the overlap and
    * how much of the eval doc it covers — robust to position shifts
    * and partial quoting, at 2/(w+1) of the gram volume.
    *
    * Guarantee inherited from winnowing: any shared run of at least
    * k+w−1 words between a train and an eval document produces at
    * least one shared fingerprint, so minShared=1 cannot miss a
    * shared passage of that length; higher thresholds trade recall
    * on short quotes for noise suppression.
    *
    * Scale shape: each side winnows independently (one doc-keyed
    * shuffle each, train never re-read per eval doc); the distinct
    * (doc, hash) sets meet through a hash-keyed equi-join — the eval
    * side is benchmark-sized, so its fingerprint set broadcasts and
    * the train side is filtered MAP-SIDE to matching hashes only.
    * The pair aggregation is bounded by actually-shared fingerprints,
    * never train × eval.
    */
  def winnowContamination(train: DataFrame, eval_ : DataFrame,
      idCol: String, textCol: String, k: Int = 4, w: Int = 8,
      minShared: Long = 1L): DataFrame = {
    require(minShared >= 1L, s"minShared must be >= 1, got $minShared")
    val trainFp = Dedup.winnowFingerprints(train, idCol, textCol, k, w)
      .select(col(idCol).as("train_id"), col("fp_hash")).distinct()
    val evalFp = Dedup.winnowFingerprints(eval_, idCol, textCol, k, w)
      .select(col(idCol).as("eval_id"), col("fp_hash")).distinct()
    val evalSizes = evalFp.groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_eval_fps"))
    trainFp.join(broadcast(evalFp), "fp_hash")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(broadcast(evalSizes), "eval_id")
      .select(col("train_id"), col("eval_id"), col("n_shared"),
        col("n_eval_fps"),
        (col("n_shared").cast("double") /
          col("n_eval_fps").cast("double")).as("eval_coverage"))
  }
}
