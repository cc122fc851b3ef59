package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text featurization for downstream classifiers (the fastText-style
  * quality/domain classifiers an LLM-data pipeline trains to gate
  * documents): fixed-dimension features with NO vocabulary pass.
  */
object Features {

  /** Hashing-trick term features (Weinberger et al., ICML 2009):
    * every token hashes straight into one of `dim` buckets, so the
    * feature space is fixed BEFORE seeing any data — no vocabulary
    * build, no dictionary broadcast, new tokens land somewhere
    * deterministic. Collisions are the accepted trade (they act as
    * regularization at classifier scale).
    *
    * Returns the sparse form (id, bucket, n_hits), one row per
    * document × occupied bucket — bounded by docs × min(distinct
    * tokens, dim), never corpus token volume, and the natural input
    * shape for a sparse trainer.
    *
    * Scale shape: map-only split/explode/hash (a Generate, no
    * shuffle), then ONE (doc, bucket) partial aggregation — a hot
    * token's occurrences collapse map-side. The hash is the repo's
    * portable md5-derived 60-bit lane (PortableHash.hash60 mod dim)
    * so an external oracle replays buckets exactly; swap to xxhash64
    * for production throughput.
    */
  def hashingTrick(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 1024): DataFrame = {
    require(dim >= 2, s"hashingTrick needs dim >= 2, got $dim")
    Dedup.spread(df)
      .select(col(idCol),
        explode(split(col(textCol), " +")).as("__tok"))
      .filter(length(col("__tok")) > 0)
      .select(col(idCol),
        pmod(PortableHash.hash60(col("__tok")), lit(dim.toLong))
          .as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Linear-classifier inference over [[hashingTrick]] features — the
    * fastText-style quality-gate scoring pass (Joulin et al., "Bag of
    * Tricks for Efficient Text Classification", EACL 2017) a pipeline
    * runs over every candidate document.
    *
    * `weights` is the trained model as a (bucket, w_milli) frame with
    * integer milli-unit weights: the per-doc logit is then
    * `z_milli = Σ n_hits · w_milli` — exact long arithmetic in every
    * fold order, so scores and the z > 0 accept decision are
    * cross-engine reproducible (the sigmoid is monotone, so
    * thresholding the logit IS thresholding the probability; no
    * engine-varying exp() in the decision path).
    *
    * Scale shape: the model (≤ feature dim rows) broadcasts; the
    * sparse features equi-join it map-side and ONE per-doc partial
    * agg folds the dot product. At 100 TB this is a map-only pass
    * plus one doc-keyed combine — the cheapest possible inference.
    */
  def logitScore(feats: DataFrame, idCol: String,
      weights: DataFrame): DataFrame =
    feats.join(broadcast(weights), "bucket")
      .groupBy(col(idCol))
      .agg(sum(col("n_hits") * col("w_milli")).as("z_milli"),
        count(lit(1)).as("n_feats"))
      .withColumn("accept", col("z_milli") > 0L)
}
