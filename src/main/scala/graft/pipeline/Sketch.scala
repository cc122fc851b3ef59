package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan, J. Algorithms 2005):
  * frequency estimation whose state is `depth × width` counters —
  * bounded however many distinct keys the stream holds. That bound is
  * the 100 TB point: an exact per-key count is a shuffle whose output
  * is |keys| rows (billions for user/URL/n-gram keys), while the
  * sketch build is ONE partial aggregation whose map-side state and
  * final output are both ≤ depth·width cells, with estimate error
  * ≤ e·N/width at confidence 1 − e^−depth, N = total count.
  *
  * Every value is engine-replayable: the lane hashes are the
  * [[PortableHash]] md5 2-universal family, so the oracle rebuilds
  * the identical sketch and estimates in SQL — the estimates
  * themselves are hash-attested, not just bounded.
  */
object Sketch {

  /** The (lane, bucket) pairs each input row increments: `depth`
    * rows per input row, bucket = h_lane(key) mod width. The md5
    * lane seeds are materialized as columns first so the hash runs
    * once per row, not once per lane.
    */
  private def laneBuckets(df: DataFrame, keyCol: String, depth: Int,
      width: Int): DataFrame = {
    val keyed = df.select(col(keyCol).cast("string").as("__k"), col(keyCol))
    val (a, b) = PortableHash.lanes(col("__k"))
    val seeded = keyed.withColumn("__a", a).withColumn("__b", b)
    val lanes = (0 until depth).map { i =>
      struct(lit(i).as("lane"),
        pmod(PortableHash.laneHash(col("__a"), col("__b"), i),
          lit(width.toLong)).as("bucket"))
    }
    seeded.select(col(keyCol),
      explode(array(lanes: _*)).as("__lb"))
      .select(col(keyCol), col("__lb.lane").as("lane"),
        col("__lb.bucket").as("bucket"))
  }

  /** Build the sketch: (lane, bucket, cnt), at most depth·width rows
    * (only touched cells appear). One partial aggregation — map-side
    * state is bounded by the sketch size, so the shuffle carries
    * ≤ partitions · depth · width rows regardless of key cardinality.
    */
  def cmsSketch(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(depth >= 1 && depth <= 16,
      s"cmsSketch needs 1 <= depth <= 16, got $depth")
    require(width >= 2, s"cmsSketch needs width >= 2, got $width")
    laneBuckets(df, keyCol, depth, width)
      .groupBy(col("lane"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** HyperLogLog registers (Flajolet, Fusy, Gandouet & Meunier, AofA
    * 2007) for distinct counting per group: bucket = low `p` bits of
    * the [[PortableHash.hash60]] key hash, register value ρ = the
    * position of the lowest set bit (1-based) in the next `w` hash
    * bits (w+1 when that window is all zeros) — P(ρ = i) = 2^−i, the
    * geometric observable HLL maxes per bucket. Registers are
    * integers and the max fold is associative and idempotent, so the
    * sketch build is ONE partial aggregation whose map-side state is
    * ≤ 2^p counters per group however many rows or distinct keys
    * feed it — the 100 TB reason to sketch: an exact distinct is a
    * |keys|-row shuffle (or an Expand doubling the scan), while this
    * ships 2^p bytes per group per partition. Sketches for disjoint
    * shards MERGE by the same max — the mergeability production
    * pipelines rely on for incremental ingest. ρ is computed by a
    * w-arm integer CASE chain, not log2 — every value replays exactly
    * in any engine.
    *
    * Returns (groupCol, bucket, mj) for TOUCHED buckets only;
    * [[hllDistinctReport]] fills the empty ones.
    */
  def hllRegisters(df: DataFrame, keyCol: String, groupCol: String,
      p: Int = 6, w: Int = 16): DataFrame = {
    require(p >= 2 && p <= 14, s"hllRegisters needs 2 <= p <= 14, got $p")
    require(w >= 4 && w <= 40, s"hllRegisters needs 4 <= w <= 40, got $w")
    val m = 1L << p
    val keyed = df.select(col(groupCol),
      PortableHash.hash60(col(keyCol).cast("string")).as("__h"))
      .withColumn("__bucket", pmod(col("__h"), lit(m)))
      .withColumn("__s", expr(s"(__h DIV $m) % ${1L << w}"))
    // rho: lowest set bit position of the w-bit window, w+1 if empty —
    // an integer CASE chain (s % 2^k = 2^(k-1) <=> k-1 trailing zeros)
    val rho = (1 to w).foldLeft(
      when(col("__s") === 0, lit(w + 1))) { (acc, k) =>
      acc.when(expr(s"__s % ${1L << k} = ${1L << (k - 1)}"), lit(k))
    }
    keyed.select(col(groupCol), col("__bucket").as("bucket"),
      rho.as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("mj"))
  }

  /** Distinct-count attestation report per group: the HLL estimate
    * next to the exact distinct count. Like [[cmsHeavyHitters]], the
    * exact side is the harness (it pays the cardinality-sized
    * aggregation the sketch exists to avoid — fine at gate scale);
    * the sketch side is the production path.
    *
    * The estimate pipeline keeps everything integer until the last
    * two IEEE operations: `harmonic_scaled` = Σ_j 2^(w+1−M_j) over
    * ALL 2^p buckets (an exact integer — the registers' harmonic sum
    * scaled by 2^(w+1)), `zeros` = untouched buckets, and the
    * estimate is α_m·m²·2^(w+1) / harmonic_scaled with the standard
    * small-range fallback m·ln(m/zeros) when the raw estimate ≤ 5m/2
    * and zeros > 0. The integer columns replay bit-for-bit in any
    * engine; the estimate is a short fixed chain of correctly-rounded
    * IEEE ops on those integers.
    *
    * p = 6 → m = 64 registers, standard error 1.04/√m ≈ 13%.
    */
  def hllDistinctReport(df: DataFrame, keyCol: String, groupCol: String,
      p: Int = 6, w: Int = 16): DataFrame = {
    require(p == 6, "hllDistinctReport pins p = 6: alpha_64 = 0.709 " +
      "is the paper's constant for m = 64; other m need their alpha")
    val m = 1L << p
    val reg = hllRegisters(df, keyCol, groupCol, p, w)
    val spark = df.sparkSession
    val groups = df.select(col(groupCol)).distinct()
    val buckets = spark.range(m).select(col("id").as("bucket"))
    val full = groups.crossJoin(broadcast(buckets))
      .join(reg, Seq(groupCol, "bucket"), "left")
      .withColumn("mj", coalesce(col("mj"), lit(0)))
    val sums = full.groupBy(col(groupCol)).agg(
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${w + 1} - mj)"))
        .as("harmonic_scaled"),
      sum(when(col("mj") === 0, 1L).otherwise(0L)).as("zeros"))
    val exact = df.groupBy(col(groupCol))
      .agg(countDistinct(col(keyCol)).as("exact_cnt"))
    sums.join(exact, Seq(groupCol))
      .withColumn("__raw",
        expr(s"0.709 * ${m * m}.0 * ${1L << (w + 1)}.0 / harmonic_scaled"))
      .withColumn("hll_est",
        when(col("__raw") <= lit(2.5 * m) && col("zeros") > 0,
          expr(s"$m.0 * ln($m.0 / zeros)"))
          .otherwise(col("__raw")))
      .select(col(groupCol), col("exact_cnt"), col("zeros"),
        col("harmonic_scaled"), col("hll_est"))
  }

  /** Heavy-hitter attestation report: the exact top-`topK` keys
    * (count DESC, key ASC) with their CMS estimate and overcount.
    * `cms_est ≥ exact_cnt` always (counters only ever over-count);
    * the overcount column makes the collision cost measurable.
    *
    * The exact side is the attestation harness (it pays the |keys|
    * shuffle the sketch exists to avoid — fine at gate scale, and
    * exactly the pf1a sketch-vs-exact pattern); the sketch side is
    * the production path. The sketch is broadcast to the probe join:
    * depth·width rows however large the corpus.
    */
  def cmsHeavyHitters(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 256, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"cmsHeavyHitters needs topK >= 1, got $topK")
    val sketch = cmsSketch(df, keyCol, depth, width)
    val top = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col(keyCol))
      .limit(topK)
    laneBuckets(top, keyCol, depth, width)
      .join(top, keyCol)
      .join(broadcast(sketch), Seq("lane", "bucket"))
      .groupBy(col(keyCol), col("exact_cnt"))
      .agg(min(col("cnt")).as("cms_est"))
      .withColumn("overcount", col("cms_est") - col("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col(keyCol))
  }
}
