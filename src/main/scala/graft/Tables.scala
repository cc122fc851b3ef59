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
    if (name == "events") loadEvents(spark, sfDir)
    else spark.read.parquet(path(sfDir, name))

  /** The driver's events table has shipped `ts` in three physical
    * shapes across fixture generations, all normalized here to ONE
    * logical type — TIMESTAMP (LTZ; every session pins
    * spark.sql.session.timeZone=UTC) — so downstream instant
    * arithmetic (`unix_micros`, watermarking) never dispatches on the
    * fixture vintage:
    *   - TIMESTAMP(NANOS), which Spark's reader rejects: read nanos
    *     as long (legacy conf) and convert with integer µs division
    *     (exact — a double division would lose precision above
    *     2^53 ns);
    *   - naive TIMESTAMP(MICROS) (isAdjustedToUTC=false), which
    *     Spark 4 infers as TIMESTAMP_NTZ: cast to LTZ — an exact
    *     reinterpretation of the same µs value under the UTC session
    *     zone;
    *   - UTC-adjusted TIMESTAMP(MICROS) (e.g. the scaled soak
    *     fixtures this library writes itself): already the target
    *     type.
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(path(sfDir, "events")))
  }

  /** The vintage dispatch itself, shared with the streaming source
    * path (a file stream over the same fixture files sees the same
    * three physical shapes) so batch and stream cannot drift.
    */
  def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }

  /** Register every test table as a temp view named after itself. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      load(spark, sfDir, n).createOrReplaceTempView(n)
    }
}
