package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema evolution across parquet batches: a long-lived 100 TB lake
  * table is written by many pipeline versions, and later batches add
  * columns earlier ones lack. Readers must union the schemas and
  * null-fill the holes — without rewriting old batches (at lake scale
  * a backfill rewrite IS the outage).
  *
  * Spark-first: `mergeSchema` makes the parquet source union footer
  * schemas at PLANNING time (one footer read per batch, distributed);
  * each file then decodes only the columns it physically has and the
  * missing ones materialize as nulls in the scan itself — no
  * post-scan join, no per-row branching, and column pruning still
  * reaches every file (a projection of old-batch columns never
  * decodes new-batch ones).
  */
object Evolution {

  /** Append a batch under its own subdirectory (one dir per writer
    * version — the layout that makes per-batch schemas self-describing
    * and lets retention delete whole batches by prefix).
    */
  def writeBatch(df: DataFrame, root: String, batch: String): Unit =
    df.write.mode("overwrite").parquet(s"$root/batch=$batch")

  /** Read every batch with schemas merged; `batch` surfaces as a
    * partition column (hive-style from the directory name), so batch
    * predicates prune whole directories before any footer is opened.
    */
  def readMerged(spark: SparkSession, root: String): DataFrame =
    spark.read.option("mergeSchema", "true")
      .option("basePath", root).parquet(root)
}
