package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Hive-style partitioned parquet layout — the partition-pruning
  * storage decision.
  *
  * Where `Bucketed` prepays the *join* shuffle, directory partitioning
  * prepays the *scan filter*: rows are laid out as
  * `path/col=value/...` and a query filtering on the partition column
  * never opens the other directories at all (pruning happens at
  * planning time, before a single task launches — pinned in PlanSpec:
  * the scan's partition count equals the selected values, and
  * `PartitionFilters` carries the predicate). At 100 TB with a
  * `source` or date partition key this is the difference between
  * scanning one source and scanning the corpus.
  *
  * Two scale hazards this module makes explicit:
  *
  *   - **Small-file explosion.** A naive `df.write.partitionBy(k)`
  *     makes every write task emit one file per partition value it
  *     happens to hold — #tasks × #values files. `write` first
  *     hash-clusters rows by the partition columns so each value is
  *     written by (at most) a handful of tasks. (One exchange, paid
  *     once at landing time.)
  *   - **High-cardinality keys.** Directory partitioning is for
  *     low-cardinality columns (source, language, date). A
  *     million-value key means a million directories — metadata
  *     listing dominates; that shape belongs in `Bucketed` (fixed
  *     bucket count) instead. `write` refuses keys that explode past
  *     `maxPartitions` at write time rather than letting the listing
  *     cost surface months later.
  *
  * Beyond-reference surface (the reference has no storage layer);
  * attested by the src5 gate entry: partitioned write → pruned
  * read-back → per-source aggregate vs the parquet oracle.
  */
object Partitioned {

  /** Write `df` partitioned by `partCols`, clustered so each
    * partition value is one writer's output instead of every task's.
    *
    * The cardinality guard costs one extra pass over the PARTITION
    * COLUMNS only (column-pruned scan — a sliver of the bytes at
    * columnar sources); callers who already know the key's
    * cardinality skip it with `checkCardinality = false`.
    */
  def write(df: DataFrame, path: String, partCols: Seq[String],
      maxPartitions: Int = 10000,
      checkCardinality: Boolean = true): Unit = {
    if (checkCardinality) {
      val n = df.select(partCols.map(col): _*).distinct().count()
      require(n <= maxPartitions,
        s"${partCols.mkString(",")} has $n distinct values — beyond " +
          s"$maxPartitions a directory per value turns file listing into " +
          "the dominant scan cost; bucket on the key instead")
    }
    df.repartition(partCols.map(col): _*)
      .write
      .mode("overwrite")
      .partitionBy(partCols: _*)
      .parquet(path)
  }

  /** Read a partitioned layout back. Partition columns come back as
    * directory-derived values appended AFTER the data columns;
    * callers wanting the original column order should `.select` it.
    * Any filter on a partition column prunes at planning time.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      // pin discovery to the layout root so a caller handing a
      // subdirectory (one partition's path) still resolves the same
      // partition columns instead of silently losing them
      .option("basePath", path)
      .parquet(path)

  /** Pruned read: only the directories matching `pred` are scanned.
    * Semantically identical to `read(...).filter(pred)` — it exists
    * to make the pruning intent explicit at call sites.
    */
  def readPruned(spark: SparkSession, path: String, pred: Column): DataFrame =
    read(spark, path).filter(pred)
}
