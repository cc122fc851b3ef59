package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC source/sink — the other columnar lake format (Hive/Trino
  * warehouses standardize on it; reference counterpart: the parquet
  * tables of TESTDATA.md, same role different container). The scale
  * contract matches parquet exactly: Spark's vectorized ORC reader
  * serves pushed filters from stripe/row-group statistics, prunes
  * columns to `ReadSchema`, and splits stripes across tasks — every
  * layout argument made for the parquet tables carries over.
  */
object Columnar {

  /** Schema-enforced ORC read. ORC self-describes, but pinning the
    * expected schema fails fast on drift (a renamed or re-typed
    * column) instead of letting it widen silently downstream —
    * the same contract as the text-format readers.
    */
  def readOrc(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Write an ORC directory: parallel fan-out, one file per input
    * partition, stripe statistics written for predicate pushdown.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
