package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session once (parquet footers, codegen, shuffle infra)
    // so the first timed query isn't charged for one-time init
    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).count() catch { case _: Throwable => }
    }
    // Each query runs twice: the reported number is the SECOND run, so
    // round-over-round deltas measure the operators, not JIT/codegen/GC
    // noise redistributing across the suite; the cold (first-run) time
    // is kept as a separate field. Harness-level memos (the shared
    // minhash pair set) are reset between the runs so warm numbers
    // measure the operators, not a cache read. A query that throws is
    // recorded in `errors` (name -> message) rather than silently
    // benched as near-0s — the bench must not report a breakage as a
    // speedup.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .linesIterator.next().take(200)
        }
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      PipelineQueries.resetCaches()
      val warm = once()
      name -> ((cold, warm))
    }
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def obj(f: ((Double, Double)) => Double): String =
      results.map { case (k, v) => jstr(k) + ":" + f(v) }
        .mkString("{", ",", "}")
    val errObj = errors.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    val total = results.values.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${obj(_._2)},"cold":${obj(_._1)},"errors":$errObj,"sf":"$sfDir"}"""
    // a file copy survives the driver's stdout tail-capture limit
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_out.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => }
    println(json)
    if (errors.nonEmpty) System.err.println(
      s"BENCH: ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
