package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.frontend.{Analyzer, Engine}

/** Dialect catalog for the driver-generated test tables: the up-front
  * `create table` declarations (the reference loads these into its Env,
  * sqlpp.ml:87-103) paired with a parquet loader.
  *
  * Types: parquet int32/int64 → INT, double → FLOAT, string → STRING,
  * timestamp → DATETIME (SURVEY §1.2). The TPC-H-ish generator emits
  * no nulls, so key/measure columns are declared NOT NULL; the dialect
  * treats bare types as nullable.
  */
object Catalog {

  val ddl: String =
    """create table region (
      |  r_regionkey int not null primary key, r_name string not null);
      |create table nation (
      |  n_nationkey int not null primary key, n_name string not null,
      |  n_regionkey int not null);
      |create table customer (
      |  c_custkey int not null primary key, c_name string not null,
      |  c_nationkey int not null, c_acctbal float not null,
      |  c_mktsegment string not null);
      |create table supplier (
      |  s_suppkey int not null primary key, s_name string not null,
      |  s_nationkey int not null, s_acctbal float not null);
      |create table part (
      |  p_partkey int not null primary key, p_name string not null,
      |  p_brand string not null, p_type string not null,
      |  p_size int not null, p_retailprice float not null);
      |create table orders (
      |  o_orderkey int not null primary key, o_custkey int not null,
      |  o_orderstatus string not null, o_totalprice float not null,
      |  o_orderdate datetime not null, o_orderpriority string not null);
      |create table lineitem (
      |  l_orderkey int not null, l_partkey int not null,
      |  l_suppkey int not null, l_linenumber int not null,
      |  l_quantity float not null, l_extendedprice float not null,
      |  l_discount float not null, l_tax float not null,
      |  l_returnflag string not null, l_linestatus string not null,
      |  l_shipdate datetime not null);
      |create table events (
      |  event_id int not null primary key, ts datetime not null,
      |  user_id int not null, event_type string not null,
      |  value float not null, props string not null);
      |create table documents (
      |  doc_id int not null primary key, text string not null,
      |  lang string not null, source string not null,
      |  n_chars int not null);
      |""".stripMargin

  def env(): Analyzer.Env = new Analyzer.Env().addDecls(ddl)

  /** Engine over the driver's parquet fixture dir. */
  def engine(spark: SparkSession, sfDir: String): Engine =
    new Engine(spark, env(), name => Tables.load(spark, sfDir, name))
}
