package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.Jdbc

/** JDBC source against embedded Derby — the operational-DB backend
  * role of the reference's pg/mariadb connectors, attested end to
  * end: write, dialect-engine read-back, filter/column pushdown into
  * the remote SQL, partitioned parallel reads.
  */
class JdbcSpec extends SparkTestBase {

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("graft_derby").toString
  private lazy val conn = Jdbc.Conn(s"jdbc:derby:$dbDir/db;create=true")

  // Derby's embedded driver registers itself on class load; nothing
  // else to configure — the jar ships with Spark.
  private def nationDf = Tables.load(spark, sf, "nation")

  test("roundtrip: parquet table written to Derby reads back identically") {
    Jdbc.write(nationDf, conn, "nation", SaveMode.Overwrite)
    val back = Jdbc.load(spark, conn, "nation")
    assert(back.columns.toSeq == nationDf.columns.toSeq)
    val a = nationDf.orderBy("n_nationkey").collect().toSeq
    val b = back.orderBy("n_nationkey").collect().toSeq
    assert(a == b)
  }

  test("dialect engine over the JDBC loader matches the parquet engine") {
    Jdbc.write(nationDf, conn, "nation2", SaveMode.Overwrite)
    val jdbcEngine = Jdbc.engine(spark, Catalog.env(), conn)
    // the Env still declares `nation`; point the loader's name at the
    // remote table by writing under the declared name
    Jdbc.write(nationDf, conn, "nation", SaveMode.Overwrite)
    val q = "select n_name, n_regionkey from nation where n_regionkey = 2 order by n_name"
    val viaJdbc = jdbcEngine.sql(q).collect().map(_.toSeq).toSeq
    val viaParquet = Catalog.engine(spark, sf).sql(q).collect().map(_.toSeq).toSeq
    assert(viaJdbc == viaParquet && viaJdbc.nonEmpty)
  }

  test("filters and projection push into the remote scan") {
    Jdbc.write(nationDf, conn, "nation3", SaveMode.Overwrite)
    val df = Jdbc.load(spark, conn, "nation3")
      .filter(col("n_regionkey") === 1)
      .select("n_name")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    // the JDBC scan node advertises what it pushed: the filter must
    // reach the remote SQL (a full-table pull that filters in Spark
    // is the non-scalable shape), and the read schema must be the
    // 2 needed columns, not the table
    assert(scan.contains("PushedFilters") && scan.contains("n_regionkey"),
      scan.take(500))
    assert(!scan.contains("n_comment"), scan.take(500))
  }

  test("partitioned read splits the table across ranged cursors") {
    Jdbc.write(nationDf, conn, "nation4", SaveMode.Overwrite)
    val part = Jdbc.partitioned(spark, conn, "nation4",
      "n_nationkey", lower = 0L, upper = 24L, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    assert(part.count() == nationDf.count())
    // strides partition the key range: no row lost or duplicated
    assert(part.select("n_nationkey").distinct().count() == nationDf.count())
  }

  test("append grows the remote table; the engine sees the new rows") {
    Jdbc.write(nationDf, conn, "nation5", SaveMode.Overwrite)
    val extra = nationDf.limit(2)
      .withColumn("n_nationkey", col("n_nationkey") + 1000)
    Jdbc.write(extra, conn, "nation5", SaveMode.Append)
    assert(Jdbc.load(spark, conn, "nation5").count() == nationDf.count() + 2)
  }
}
