package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the driver-generated parquet test tables (TESTDATA.md).
  *
  * The reference declares its table schemas up-front in an `Env`
  * (reference: sqlpp.ml:87-103); here the parquet footer is the schema
  * of record and we register each table as a temp view so both the
  * DataFrame lowering and `spark.sql` can address them by name.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(path(sfDir, name))

  /** Register every test table as a temp view named after itself. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      load(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
