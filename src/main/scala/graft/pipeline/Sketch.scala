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
