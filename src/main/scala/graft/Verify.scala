package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** The only column types an oracle-gated entry may emit. The
    * driver's compare is a lossy pandas round-trip: DECIMAL/HUGEINT
    * render differently per engine (the r10 14-red incident), lists
    * don't hash stably, FLOAT widens nondeterministically. Everything
    * outside this set must be cast in the ENTRY (BIGINT for exact
    * integers, comma-joined VARCHAR for lists) — on BOTH sides,
    * Spark and oracle.
    */
  private[graft] val allowedTypes: Set[DataType] = Set(
    BooleanType, IntegerType, LongType, DoubleType, StringType,
    DateType, TimestampType,
    // parquet-native datetimes read back as NTZ; DuckDB's TIMESTAMP
    // is itself naive, so NTZ is the exact-compare-safe twin of
    // TimestampType here (q9/q10 have been hash-green on it since r1)
    TimestampNTZType)

  /** Offending `name: type` strings for a gate entry's output schema
    * (empty = compliant). Called at registration/dump time so a new
    * entry with a DECIMAL/list/float output column is refused when it
    * is AUTHORED, not three days later when the driver's pandas
    * compare quietly hash-mismatches it (tools/check.py replays that
    * compare at check time; this is the same contract enforced
    * earlier).
    */
  private[graft] def lintSchema(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if !allowedTypes.contains(f.dataType) =>
        s"${f.name}: ${f.dataType.simpleString}"
    }
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated entry-name prefixes — local
    // iteration aid (the driver always passes exactly two args)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, Seq.empty[String])
      case Array(s, o, f) => (s, o, f.split(",").toSeq)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val refused = List.newBuilder[String]
    SparkEntry.queries
      .filter { case (name, _) =>
        only.isEmpty || only.exists(name.startsWith) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val bad = lintSchema(df.schema)
        if (bad.nonEmpty) {
          // refuse the entry: no parquet is written, so the round
          // shows a legible missing file instead of an inscrutable
          // hash mismatch from the lossy pandas compare
          refused += name
          System.err.println(s"[verify] REFUSED $name: output types " +
            s"outside the oracle-safe set {bool,int,bigint,double," +
            s"varchar,date,timestamp}: ${bad.mkString(", ")} — cast " +
            "in the entry (both Spark and oracle sides)")
        } else df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // under a prefix filter, emit only the matching oracles too — so
    // check.py over a filtered dump doesn't FAIL the ~160 entries
    // that were deliberately not dumped
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only.exists(k.startsWith) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val refusedList = refused.result()
    if (refusedList.nonEmpty) System.err.println(
      s"[verify] ${refusedList.size} entries REFUSED by the output-type " +
        s"lint: ${refusedList.mkString(", ")}")
    spark.stop()
  }
}
