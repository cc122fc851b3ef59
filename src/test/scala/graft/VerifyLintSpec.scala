package graft

import org.apache.spark.sql.functions._

/** The Verify registration-time output-type lint: a gate entry whose
  * output schema carries a type outside the oracle-safe scalar set
  * {bool, int, bigint, double, varchar, date, timestamp} is REFUSED
  * at dump time (no parquet written, loud stderr) instead of
  * surfacing three days later as a lossy-pandas hash mismatch — the
  * r10 14-red incident class (DECIMAL/HUGEINT render differently per
  * engine; lists don't hash stably).
  */
class VerifyLintSpec extends SparkTestBase {

  test("a DECIMAL-emitting entry is refused") {
    val df = spark.range(3)
      .agg(sum(col("id").cast("decimal(38,0)")).as("total"))
    val bad = Verify.lintSchema(df.schema)
    assert(bad == Seq("total: decimal(38,0)"))
  }

  test("array and float columns are refused; the cast fix passes") {
    val df = spark.range(3).select(
      array(col("id")).as("ids"),
      col("id").cast("float").as("f"))
    val bad = Verify.lintSchema(df.schema)
    assert(bad.toSet ==
      Set("ids: array<bigint>", "f: float"))
    // the required fix: comma-joined VARCHAR for lists, DOUBLE for
    // floats — both sides of the gate cast the same way
    val fixed = df.select(
      concat_ws(",", col("ids")).as("ids"),
      col("f").cast("double").as("f"))
    assert(Verify.lintSchema(fixed.schema).isEmpty)
  }

  test("checkedLong: in-range DECIMAL casts, overflow raises instead of NULLing") {
    import spark.implicits._
    val ok = Seq("123", "-9223372036854775807").toDF("s")
      .select(PipelineQueries.checkedLong(
        col("s").cast("decimal(38,0)")).as("v"))
      .collect().map(_.getLong(0)).sorted
    assert(ok.toSeq == Seq(-9223372036854775807L, 123L))
    // one over int64 max: the plain cast would silently NULL (the
    // silent-divergence ADVICE r11 flagged); the guard raises
    val boom = intercept[Exception] {
      Seq("9223372036854775808").toDF("s")
        .select(PipelineQueries.checkedLong(
          col("s").cast("decimal(38,0)")).as("v"))
        .collect()
    }
    assert(boom.getMessage != null)
    def root(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else root(t.getCause)
    assert((boom.getMessage + root(boom).getMessage)
      .contains("gate cast overflow"))
  }

  test("the full oracle-safe scalar set passes") {
    val df = spark.range(1).select(
      lit(true).as("b"), lit(1).as("i"), lit(1L).as("l"),
      lit(1.5d).as("d"), lit("s").as("s"),
      current_date().as("dt"), current_timestamp().as("ts"))
    assert(Verify.lintSchema(df.schema).isEmpty)
  }
}
