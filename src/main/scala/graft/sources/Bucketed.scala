package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout — the co-located-join storage decision.
  *
  * At 100 TB the dominant repeated cost is the shuffle both sides of
  * every fact-to-fact equi-join pay. Bucketing spends that shuffle
  * ONCE at write time: rows are hash-clustered into `numBuckets`
  * files per partition by the join key (and sorted within buckets),
  * and every later join or aggregation on that key reads the
  * co-located layout with NO exchange and NO sort — Spark's scan
  * reports the bucket spec as its output partitioning, and the
  * planner drops the Exchange/Sort it would otherwise insert
  * (pinned in PlanSpec: a self-join of two tables bucketed on the
  * same key plans zero ShuffleExchange nodes).
  *
  * The reference has no storage layer (it compiles queries for a
  * backing DB, where the analogous decision is the table's index);
  * this is the Spark-native counterpart of that decision, and the
  * natural home for the `lineitem ⋈ orders` class of repeated joins.
  *
  * Bucketed tables live in the session catalog (`saveAsTable` — the
  * bucket spec must be recorded somewhere scans can read it back;
  * a bare parquet path has nowhere to put it). Both join sides must
  * use the SAME bucket count on the join key; a mismatched count
  * degrades to a plain shuffle, so `join` requires it.
  */
object Bucketed {

  /** Write `df` as a bucketed, in-bucket-sorted catalog table. */
  def write(df: DataFrame, table: String, numBuckets: Int,
      keyCol: String, moreKeys: String*): Unit = {
    val spark = df.sparkSession
    // an in-memory session catalog forgets its tables at JVM exit but
    // the warehouse DIRECTORY survives; creating "fresh" over the
    // stale location fails with LOCATION_ALREADY_EXISTS — drop the
    // table if known, then clear the orphaned location if not
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // pre-cluster the writers on the bucket hash so each bucket is
    // written as ONE file: with multiple files per bucket Spark must
    // distrust the per-file sortBy order and re-Sort both sides of
    // every merge join — the repartition is the prepaid shuffle, and
    // it also prevents the numTasks×numBuckets small-file explosion
    df.repartition(numBuckets,
        (keyCol +: moreKeys).map(org.apache.spark.sql.functions.col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keyCol, moreKeys: _*)
      .sortBy(keyCol, moreKeys: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame =
    spark.table(name)

  /** Equi-join two same-bucket-count tables on their bucket key —
    * the zero-shuffle read path the layout exists for.
    */
  def join(spark: SparkSession, left: String, right: String,
      keys: Seq[String]): DataFrame = {
    def bucketsOf(t: String): Option[Int] = {
      import scala.jdk.CollectionConverters._
      val ident = spark.sessionState.sqlParser.parseMultipartIdentifier(t)
      val cat = spark.sessionState.catalog
      val meta = cat.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(
          ident.last, ident.dropRight(1).lastOption))
      meta.bucketSpec.map(_.numBuckets)
    }
    val (lb, rb) = (bucketsOf(left), bucketsOf(right))
    require(lb.nonEmpty && rb.nonEmpty && lb == rb,
      s"bucketed join needs both tables bucketed with the SAME count; " +
        s"$left has $lb, $right has $rb — a mismatch silently degrades " +
        "to a full shuffle, the cost this layout exists to avoid")
    table(spark, left).join(table(spark, right), keys)
  }
}
