package graft

import graft.frontend.Engine

/** Engine-level execution of the composition features (SURVEY §2.8):
  * named queries, WITHSCOPE aliases, fieldset splices, multi-column
  * IN — each runs end-to-end on sf0.001.
  */
class EngineCompositionSpec extends SparkTestBase {

  lazy val engine: Engine = {
    val env = Catalog.env().addDecls(
      """create query big_orders as
        |  select o_orderkey, o_custkey, o_totalprice, ...
        |  from orders where o_totalprice > 300000.0;
        |create query order_stats as
        |  select o_custkey as k, with count(1) as n_orders, ...
        |  from orders group by o_custkey;
        |create fieldset cust_info(from customer AS c) as
        |  select c.c_custkey as cid, c.c_name as cname;
        |create query cust_flag as
        |  select o_custkey as k, with count(1) as n,
        |    with (min(o_orderkey) in
        |      (select o_orderkey from orders where o_totalprice > 200000.0)) as hot
        |  from orders group by o_custkey;
        |""".stripMargin)
    new Engine(spark, env, name => Tables.load(spark, sf, name))
  }

  test("named query in FROM inlines with fresh scope per use") {
    val df = engine.sql(
      """select b.o_orderkey, b.o_totalprice
        |from big_orders as b
        |order by b.o_orderkey limit 10""".stripMargin)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getDouble(1) > 300000.0))
  }

  test("named query with lazy fields: per-use-site pruning executes") {
    // stats.n_orders marks the lazy count used in THIS inlining only
    val df = engine.sql(
      """select c_custkey, stats.n_orders
        |from customer
        |join order_stats as stats on c_custkey = stats.k
        |order by c_custkey limit 5""".stripMargin)
    assert(df.columns.toSeq == Seq("c_custkey", "n_orders"))
    assert(df.collect().forall(_.getLong(1) > 0))
  }

  test("nav pushdown into a named query creates a generated agg field") {
    val df = engine.sql(
      """select c_custkey, stats.sum(o_totalprice), stats.n_orders
        |from customer
        |join order_stats as stats on c_custkey = stats.k
        |order by c_custkey limit 5""".stripMargin)
    assert(df.count() == 5 && df.columns.length == 3)
  }

  test("WITHSCOPE re-exports a nested scope under a new name") {
    val df = engine.sql(
      // (ORDER BY is analyzed before the projection, so it cannot see
      // the WITHSCOPE alias — same as the reference)
      """select withscope o as ord, ord.o_orderkey, ord.o_totalprice
        |from orders as o
        |order by o.o_orderkey limit 3""".stripMargin)
    assert(df.columns.toSeq == Seq("o_orderkey", "o_totalprice"))
    assert(df.count() == 3)
  }

  test("fieldset splice executes against the caller's scope") {
    val df = engine.sql(
      """select ...cust_info(customer), c_acctbal
        |from customer
        |order by c_custkey limit 4""".stripMargin)
    assert(df.columns.toSeq == Seq("cid", "cname", "c_acctbal"))
    assert(df.count() == 4)
  }

  test("lazy fieldset splice (WITH ...fs) contributes nothing unless used") {
    val df = engine.sql(
      """select with ...cust_info(customer), c_custkey
        |from customer
        |order by c_custkey limit 4""".stripMargin)
    assert(df.columns.toSeq == Seq("c_custkey"))
  }

  test("multi-column IN lowers to a left-semi join on both columns") {
    val df = engine.sql(
      """select l_orderkey, l_partkey from lineitem
        |where (l_orderkey, l_partkey) in
        |  (select l_orderkey, l_partkey from lineitem where l_quantity > 49.0)
        |order by l_orderkey, l_partkey""".stripMargin)
    val expected = spark.sql(
      s"""SELECT l_orderkey, l_partkey FROM parquet.`$sf/lineitem.parquet`
         |WHERE (l_orderkey, l_partkey) IN
         |  (SELECT l_orderkey, l_partkey FROM parquet.`$sf/lineitem.parquet`
         |   WHERE l_quantity > 49.0)
         |ORDER BY l_orderkey, l_partkey""".stripMargin).collect()
    assert(df.collect().toSeq == expected.toSeq)
  }

  /** The reference documents a known bug here: `Expr_in` scopes are
    * NOT copied fresh when a named query is inlined (reference
    * README.md:261-263), so a query inlined twice shares one recorded
    * subquery scope. Our Engine re-keys the scope memo per rewritten
    * node — this pins that a named query CONTAINING an IN subquery can
    * be used twice in one statement, with each use site marking its
    * lazy fields independently.
    */
  test("named query with an IN subquery inlines fresh twice in one statement") {
    // both sites use the IN-backed lazy field
    val df = engine.sql(
      """select a.k, a.hot, b.hot as hot2
        |from cust_flag as a join cust_flag as b on a.k = b.k
        |order by a.k limit 20""".stripMargin)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(r => r.getBoolean(1) == r.getBoolean(2)))
    val expected = spark.sql(
      s"""WITH cf AS (
         |  SELECT o_custkey AS k,
         |         min(o_orderkey) IN (SELECT o_orderkey
         |                             FROM parquet.`$sf/orders.parquet`
         |                             WHERE o_totalprice > 200000.0) AS hot
         |  FROM parquet.`$sf/orders.parquet` GROUP BY o_custkey)
         |SELECT a.k, a.hot, b.hot AS hot2 FROM cf a JOIN cf b ON a.k = b.k
         |ORDER BY a.k LIMIT 20""".stripMargin).collect()
    assert(rows.toSeq == expected.toSeq)

    // asymmetric use: only site A marks the IN-backed field used, site
    // B prunes it — per-use-site laziness with a shared source AST
    val asym = engine.sql(
      """select a.k, a.hot, b.n
        |from cust_flag as a join cust_flag as b on a.k = b.k
        |order by a.k limit 20""".stripMargin)
    assert(asym.columns.toSeq == Seq("k", "hot", "n"))
    assert(asym.collect().forall(_.getLong(2) > 0))
  }

  test("named query twice in one FROM keeps the namespaces apart") {
    val df = engine.sql(
      """select a.k, a.n_orders, b.n_orders as n2
        |from order_stats as a
        |join order_stats as b on a.k = b.k
        |order by a.k limit 5""".stripMargin)
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(1) == r.getLong(2)))
  }
}
