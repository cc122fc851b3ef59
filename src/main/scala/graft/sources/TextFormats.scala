package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema-enforced CSV / JSONL ingest and landing.
  *
  * Raw pretraining corpora overwhelmingly *arrive* as line-delimited
  * text (JSONL dumps, CSV exports); parquet is the landing format this
  * library computes on. These readers make the ingest hop explicit and
  * safe at corpus scale:
  *
  *   - **Schema is required, never inferred.** Spark's CSV/JSON schema
  *     inference is a full extra pass over the data (a second 100 TB
  *     scan before the first real one) and can *change* between
  *     increments as value distributions drift — an inferred `long`
  *     column silently becoming `string` breaks every downstream plan.
  *     Callers pass the landing schema (usually the parquet schema of
  *     record) and malformed rows surface instead of mutating types.
  *   - **Malformed-row policy is explicit.** `FAILFAST` for attested
  *     round trips (any bad row kills the job — right for data this
  *     library wrote itself), `PERMISSIVE` + a corrupt-record capture
  *     column for third-party feeds, so quarantine is a `filter` on
  *     the corrupt column, not a re-scan.
  *   - **Splittability is the scan-parallelism cliff.** Uncompressed
  *     (and bzip2/zstd-seekable) line files split at
  *     `spark.sql.files.maxPartitionBytes` like parquet row groups;
  *     a gzip member is ONE task no matter its size — a single 1 TB
  *     `.json.gz` serializes its whole scan on one core. Landing jobs
  *     should re-shard hot gzip inputs (many ≤1 GB files) or convert
  *     to parquet (these writers) before iterating.
  *
  * Reference parity note: the reference ships no file formats at all —
  * its tables live in an RDBMS (sqlpp_sqlite.ml, sqlpp_postgresql.ml);
  * this module is beyond-reference pipeline surface, attested by the
  * src3/src4 round-trip gate entries (write → read → byte-identical
  * rows vs the parquet oracle).
  */
object TextFormats {

  /** The corrupt-capture column used by the PERMISSIVE readers. */
  val corruptCol: String = "_corrupt_record"

  // ---------------- CSV ----------------

  /** Read a CSV directory under an explicit schema. `FAILFAST` (the
    * default) throws on the first malformed row; `PERMISSIVE` nulls
    * unparsable fields. Header handling is by position-independent
    * name match (`enforceSchema=false` makes Spark check the header
    * against the schema instead of trusting column order blindly).
    *
    * `multiLine` parses quoted embedded newlines but makes every FILE
    * one scan task (a record boundary can no longer be found by
    * seeking to a split offset) — only set it when the data truly
    * embeds newlines, and prefer JSONL there anyway: JSON escapes
    * `\n` inside values, so a JSONL file stays line-delimited and
    * splittable where the equivalent CSV does not.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      mode: String = "FAILFAST", multiLine: Boolean = false): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("enforceSchema", "false")
      .option("mode", mode)
      // must mirror the writer's quoting so round trips are exact
      .option("escape", "\"")
      .option("multiLine", multiLine.toString)
      .csv(path)

  /** PERMISSIVE CSV read that lands each malformed raw line in
    * `_corrupt_record` (NULL for clean rows) — the quarantine shape:
    * `filter($"_corrupt_record".isNotNull)` is the reject feed, the
    * complement is the accepted feed, one scan total.
    */
  def readCsvWithCorrupt(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already carries $corruptCol")
    val withCapture = StructType(
      schema.fields :+ StructField(corruptCol, StringType, nullable = true))
    spark.read
      .schema(withCapture)
      .option("header", "true")
      .option("enforceSchema", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .option("escape", "\"")
      .csv(path)
  }

  /** Write a CSV directory (header, RFC-4180 quoting with `"` as the
    * escape so embedded quotes/commas/newlines survive). One file per
    * input partition — callers landing small dimension feeds should
    * `coalesce(1)` themselves; corpus-scale writes want the natural
    * parallel fan-out.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write
      .option("header", "true")
      .option("escape", "\"")
      .mode("overwrite")
      .csv(path)

  // ---------------- JSONL ----------------

  /** Read line-delimited JSON under an explicit schema. Same mode
    * contract as `readCsv`. JSONL is the interchange format of
    * pretraining corpora; the schema pins field *types* (a bare read
    * would re-infer per increment).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      mode: String = "FAILFAST"): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", mode)
      .json(path)

  /** PERMISSIVE JSONL read with the malformed raw line captured in
    * `_corrupt_record` (see `readCsvWithCorrupt`).
    */
  def readJsonlWithCorrupt(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema already carries $corruptCol")
    val withCapture = StructType(
      schema.fields :+ StructField(corruptCol, StringType, nullable = true))
    spark.read
      .schema(withCapture)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** Write line-delimited JSON (one object per line, parallel
    * fan-out). `ignoreNullFields=false` keeps null-valued fields
    * present so a schema-enforced read-back reconstructs nullable
    * columns byte-identically instead of conflating "null" with
    * "absent".
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write
      .option("ignoreNullFields", "false")
      .mode("overwrite")
      .json(path)
}
