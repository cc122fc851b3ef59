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
}
