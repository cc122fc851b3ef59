package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for multi-dimensional data skipping.
  *
  * Sorting a table by ONE column gives parquet/ORC min-max pruning on
  * that column and destroys it for every other; interleaving the bits
  * of two dimensions into a single Morton index and sorting by THAT
  * keeps both dimensions locally clustered, so a 2-D box predicate
  * prunes files/row-groups on both columns at once (the Delta/Iceberg
  * `OPTIMIZE ZORDER BY` layout, from Morton 1966's curve). At 100 TB
  * this is the difference between a box query scanning ~sqrt-of-table
  * and scanning everything: each z-sorted file covers a compact tile
  * of (x, y) space, and both columns' footer stats are selective.
  *
  * Everything here is closed-form column arithmetic (shift/mask/add)
  * — codegen'd whole-stage, no UDF, and exactly reproducible by any
  * engine with integer bit ops (the oracle replays it in SQL via
  * [[zValueSql]]).
  */
object Zorder {

  /** Morton index of two non-negative integer columns: bit i of `x`
    * lands at position 2i+1 and bit i of `y` at position 2i. `bits`
    * is per-dimension width; values are masked to it, so callers
    * quantize wider domains first (rank, bucket, or clamp).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

  /** The identical Morton index as engine-neutral SQL over column
    * expressions `x`, `y` — for oracles and external validation.
    */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(((($x >> $i) & 1) << ${2 * i + 1}) + ((($y >> $i) & 1) << ${2 * i}))"
    }.mkString(" + ")

  /** Write `df` as parquet laid out along the Morton curve of
    * (`xCol`, `yCol`): range-partition on the z-index (contiguous
    * curve segments per file — range, not hash, is what makes each
    * FILE a compact tile), sort within partitions so row groups
    * inside a file are tiles too, then drop the helper column. Box
    * predicates on either or both dimensions prune at file AND
    * row-group granularity from footer min/max alone.
    *
    * `numFiles` sizes the layout: at corpus scale pick
    * total_bytes / target_file_size (range partitioning samples the
    * z distribution, so skewed dimensions still yield balanced
    * files).
    */
  def writeZordered(df: DataFrame, path: String, xCol: String,
      yCol: String, bits: Int, numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
