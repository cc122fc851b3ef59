package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization: at 100 TB the embedding column IS the
  * dataset, and int8 storage is a 4× cut in scan bytes, shuffle bytes
  * and cache footprint. Symmetric per-vector scheme: scale = max |v|,
  * q_d = floor(v_d · 127 / scale + 0.5) ∈ [-127, 127] stored as
  * tinyint. All arithmetic is plain double ops with floor rounding,
  * so the correctness oracle reproduces it bit-for-bit (no
  * round-half banker's ambiguity).
  */
object Quantize {

  private def absMax(vecd: Column): Column =
    aggregate(vecd, lit(0.0d), (acc, x) => greatest(acc, abs(x)))

  /** Adds `qvec array<tinyint>` and `scale double` next to the
    * original vector column.
    */
  def quantize(df: DataFrame, vecCol: String): DataFrame = {
    val vd = transform(col(vecCol), x => x.cast("double"))
    val scale = absMax(vd)
    df.withColumn("scale", scale)
      .withColumn("qvec",
        when(col("scale") === 0.0d,
          transform(col(vecCol), _ => lit(0).cast("byte")))
          .otherwise(transform(vd, x =>
            floor(x * lit(127.0d) / col("scale") + lit(0.5d)).cast("byte"))))
  }

  /** Reconstruct a double vector from (qvec, scale). */
  def dequantize(qvec: Column, scale: Column): Column =
    transform(qvec, q => (q.cast("double") * scale) / lit(127.0d))

  /** Quantize→dequantize fidelity: cosine between the original and
    * the reconstructed vector (≈0.999+ for 64-dim unit-ish data).
    */
  def fidelity(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // materialize the cast vector, the scale and the reconstruction
    // ONCE per row: referencing the absMax fold from inside the
    // per-element lambda re-runs the whole 64-element fold per
    // element (O(dims²) per row — measured ~50x slowdown on the
    // benched entry before this was lifted out)
    val vd = transform(col(vecCol), x => x.cast("double"))
    val dv = transform(col("__vd"), x =>
      (floor(x * lit(127.0d) / col("scale") + lit(0.5d)) * col("scale"))
        / lit(127.0d))
    // composed cosine: the native expression is array<float>-only,
    // and the reconstructed vector is array<double>; the composed fold
    // is bit-identical (PipelineSpec asserts so)
    df.withColumn("__vd", vd)
      .withColumn("scale", absMax(col("__vd")))
      .withColumn("__dv", dv)
      .select(col(idCol), col("scale"),
        Similarity.cosineComposed(col(vecCol), col("__dv")).as("fidelity"))
  }
}
