package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.frontend.{Analyzer, Engine}

/** JDBC-backed table source — the role of the reference's database
  * backends (reference: sqlpp_postgresql.ml:77-219, sqlpp_mariadb.ml:
  * 1-173, which execute the printed SQL against an operational
  * pg/mariadb): here the operational DB is a SOURCE the Spark engine
  * reads through `spark.read.jdbc`, and the dialect/analyzer stack is
  * identical to the parquet path — an `Engine` whose loader resolves
  * table names against the connection instead of a fixture directory.
  *
  * Scale posture, which is the whole reason this is a thin layer over
  * Spark's JDBC source rather than a custom one:
  *   - filter/column pushdown: Catalyst pushes WHERE conjuncts and
  *     the projection into the generated remote SQL, so a dimension
  *     probe reads the probed rows, not the table (pinned in
  *     JdbcSpec);
  *   - partitioned parallel reads via `partitioned()`: an operational
  *     table of real size must be ranged over `numPartitions`
  *     long-column strides, one remote cursor per partition — the
  *     single-cursor default is the driver-bottleneck shape;
  *   - the remote DB stays the system of record for SMALL operational
  *     state (the `Env`-declared dimension tables); 100 TB fact data
  *     belongs in parquet/lakehouse tables, and joining a JDBC dim
  *     into a fact scan broadcasts the dim like any other small side.
  *
  * Tested against embedded Derby (the JDBC engine shipped with Spark);
  * the layer is driver-agnostic — `url` selects pg/mariadb/anything
  * with a registered JDBC driver.
  */
object Jdbc {

  /** Connection descriptor; `props` carries driver options (user,
    * password, driver class when not URL-inferable).
    */
  final case class Conn(url: String, props: Map[String, String] = Map.empty) {
    private[sources] def javaProps: java.util.Properties = {
      val p = new java.util.Properties()
      props.foreach { case (k, v) => p.setProperty(k, v) }
      p
    }
  }

  /** One remote table as a DataFrame — single cursor; use
    * [[partitioned]] for tables with real row counts.
    */
  def load(spark: SparkSession, conn: Conn, table: String): DataFrame =
    spark.read.jdbc(conn.url, table, conn.javaProps)

  /** Ranged parallel read: `numPartitions` remote cursors over
    * `[lower, upper]` strides of a numeric `partitionCol`. This is the
    * shape that scales — every executor pulls its own stride, the
    * Spark driver never funnels the rows.
    */
  def partitioned(spark: SparkSession, conn: Conn, table: String,
      partitionCol: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    spark.read.jdbc(conn.url, table, partitionCol, lower, upper,
      numPartitions, conn.javaProps)

  /** Write a DataFrame to a remote table. `varcharLen` maps Spark
    * StringType to VARCHAR(n) instead of the dialect default (Derby's
    * default is CLOB, which its own comparison operators reject —
    * equality pushdown would then fail remotely).
    */
  def write(df: DataFrame, conn: Conn, table: String,
      mode: SaveMode = SaveMode.ErrorIfExists,
      varcharLen: Int = 1024): DataFrame = {
    val stringCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType)
      .map(f => s"${f.name} VARCHAR($varcharLen)")
    val w = df.write.mode(mode)
    (if (stringCols.nonEmpty)
      w.option("createTableColumnTypes", stringCols.mkString(", "))
    else w).jdbc(conn.url, table, conn.javaProps)
    df
  }

  /** Dialect engine over a JDBC connection: same analyzer `Env`
    * (declared schemas are still checked against what the wire
    * returns — Spark validates on read), same lowering, different
    * loader. `partitions` upgrades named tables to ranged parallel
    * reads.
    */
  def engine(spark: SparkSession, env: Analyzer.Env, conn: Conn,
      partitions: Map[String, (String, Long, Long, Int)] = Map.empty): Engine =
    new Engine(spark, env, name =>
      partitions.get(name) match {
        case Some((c, lo, hi, n)) => partitioned(spark, conn, name, c, lo, hi, n)
        case None                 => load(spark, conn, name)
      })
}
