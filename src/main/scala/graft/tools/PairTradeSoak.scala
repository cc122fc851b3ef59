package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.{Dedup, Similarity}

/** Measures the two payload trades the pair miners can make, at a
  * scaled fixture:
  *
  * 1. carry-vs-join-back: ride the per-row payload (embedding vector /
  *    minhash signature) through the bucket exchange and the pair
  *    `distinct` (bands× payload amplification, zero extra joins), or
  *    bucket id-only rows and join the payload back once per
  *    surviving pair side. The interesting regime is WIDE payloads —
  *    production embeddings are 256–4096 dims (1–16 KB), not the
  *    fixture's 64 — so the embeddings are tiled out to `dims`
  *    (default 256) before mining.
  *
  * 2. fixed-vs-derived bucket bits: fixed bits turn k× corpus growth
  *    into ~k² in-bucket pair density (SOAK_r8 measured dd10 at 5.4×
  *    work for 10× data); [[Similarity.deriveBits]] re-sizes buckets
  *    from the corpus count. Run this tool at the base AND scaled
  *    fixtures and compare the derived-bits walls.
  *
  * Prints ONE JSON line:
  * {"n_vecs":N,"dims":D,"cosine_carry_sec":S,"cosine_joinback_sec":S,
  *  "cosine_pairs":N,"minhash_carry_sec":S,"minhash_joinback_sec":S,
  *  "minhash_pairs":N,"derived_bits":B,"cosine_derived_sec":S,
  *  "cosine_derived_pairs":N}
  *
  * Usage: runMain graft.tools.PairTradeSoak <sfDir> [dims]
  */
object PairTradeSoak {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty && args.length <= 2,
      "usage: PairTradeSoak <sfDir> [dims]")
    val dir = args(0)
    val dims = if (args.length == 2) args(1).toInt else 256
    require(dims % 64 == 0, s"dims must be a multiple of 64, got $dims")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // widen 64-dim fixture vectors to `dims` by tiling scaled copies:
    // direction structure (and so bucket/pair structure) is preserved
    // within each block, and the payload per row is dims×4 bytes —
    // the production embedding width the trade actually depends on
    val copies = dims / 64
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), flatten(transform(
        sequence(lit(1), lit(copies)),
        i => transform(col("embedding"),
          x => x * i.cast("float")))).as("embedding"))
    val planted = e.filter(col("vec_id") < 20).select(
      (col("vec_id") + 50000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.05f)).as("embedding"))
    val corpus = e.unionByName(planted).cache()
    val nVecs = corpus.count() // also materializes the cache

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def cosineRun(carry: Boolean, bits: Int): Long =
      Similarity.cosineNearDupPairs(corpus, "vec_id", "embedding",
        minCosine = 0.99, bands = 4, bitsPerBand = bits, dims = dims,
        carryPayload = carry).count()

    // warm-up (codegen + cache), then timed runs
    cosineRun(carry = true, bits = 8)
    val (cc, ccN) = time(cosineRun(carry = true, bits = 8))
    val (cj, cjN) = time(cosineRun(carry = false, bits = 8))
    require(ccN == cjN, s"variant pair counts diverge: carry $ccN joinback $cjN")

    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").cache()
    docs.count()
    def minhashRun(carry: Boolean): Long =
      Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        minEstJaccard = 0.5, carryPayload = carry).count()
    minhashRun(carry = true)
    val (mc, mcN) = time(minhashRun(carry = true))
    val (mj, mjN) = time(minhashRun(carry = false))
    require(mcN == mjN, s"minhash variant pair counts diverge: $mcN vs $mjN")

    // derived-bits run: the scale path (bits from corpus count)
    val derivedBits = Similarity.deriveBits(nVecs)
    val (cd, cdN) = time(cosineRun(carry = true, bits = 0))

    println(
      s"""{"n_vecs":$nVecs,"dims":$dims,""" +
        s""""cosine_carry_sec":${Fmt.fmt("%.2f", cc)},"cosine_joinback_sec":${Fmt.fmt("%.2f", cj)},""" +
        s""""cosine_pairs":$ccN,""" +
        s""""minhash_carry_sec":${Fmt.fmt("%.2f", mc)},"minhash_joinback_sec":${Fmt.fmt("%.2f", mj)},""" +
        s""""minhash_pairs":$mcN,""" +
        s""""derived_bits":$derivedBits,""" +
        s""""cosine_derived_sec":${Fmt.fmt("%.2f", cd)},"cosine_derived_pairs":$cdN}""")
    spark.stop()
  }
}
