package graft

import graft.frontend.Engine
import graft.frontend.Syntax.SqlppError

/** Edge combinations of dialect features, each checked against the
  * equivalent Spark SQL result on the same parquet.
  */
class EngineEdgeSpec extends SparkTestBase {

  lazy val engine: Engine = Catalog.engine(spark, sf)

  def viaSql(q: String): Seq[org.apache.spark.sql.Row] = {
    Tables.names.foreach { n =>
      Tables.load(spark, sf, n).createOrReplaceTempView(n)
    }
    spark.sql(q).collect().toSeq
  }

  test("ordered+limited subselect inside FROM") {
    val df = engine.sql(
      """select t.o_orderkey from
        |(select o_orderkey, ... from orders order by o_totalprice desc limit 20) as t
        |order by t.o_orderkey""".stripMargin)
    val want = viaSql(
      """SELECT o_orderkey FROM
        |(SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC LIMIT 20) t
        |ORDER BY o_orderkey""".stripMargin)
    assert(df.collect().toSeq == want)
  }

  test("IN subquery inside a subselect's WHERE") {
    val df = engine.sql(
      """select t.c_custkey from
        |(select c_custkey, ...
        | from customer
        | where c_custkey in (select o_custkey from orders where o_totalprice > 400000.0)) as t
        |order by t.c_custkey""".stripMargin)
    val want = viaSql(
      """SELECT c_custkey FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin)
    assert(df.collect().toSeq == want)
  }

  test("two IN conjuncts plus a plain predicate") {
    val df = engine.sql(
      """select c_custkey from customer
        |where c_custkey in (select o_custkey from orders where o_totalprice > 300000.0)
        |  and c_custkey in (select o_custkey from orders where o_orderstatus = 'F')
        |  and c_acctbal > 0.0
        |order by c_custkey""".stripMargin)
    val want = viaSql(
      """SELECT c_custkey FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
        |  AND c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |  AND c_acctbal > 0.0
        |ORDER BY c_custkey""".stripMargin)
    assert(df.collect().toSeq == want)
  }

  test("NOT IN under OR (flag-join path, negated)") {
    val df = engine.sql(
      """select c_custkey from customer
        |where not (c_custkey in (select o_custkey from orders where o_totalprice > 400000.0))
        |   or c_acctbal < -900.0
        |order by c_custkey""".stripMargin)
    val want = viaSql(
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |   OR c_acctbal < -900.0
        |ORDER BY c_custkey""".stripMargin)
    assert(df.collect().toSeq == want)
  }

  test("EXISTS gate inside a grouped query's WHERE") {
    val df = engine.sql(
      """select o_orderstatus, count(1) as n from orders
        |where exists(select r_regionkey from region where r_name = 'ASIA')
        |group by o_orderstatus order by o_orderstatus""".stripMargin)
    val want = viaSql(
      """SELECT o_orderstatus, count(1) AS n FROM orders
        |WHERE EXISTS (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    assert(df.collect().toSeq == want)
  }

  test("join of two grouped subselects") {
    val df = engine.sql(
      """select a.k, a.n, b.m
        |from (select o_custkey as k, count(1) as n, ... from orders group by o_custkey) as a
        |join (select c_nationkey as k2, count(1) as m, ...
        |      from customer group by c_nationkey) as b
        |on a.k = b.k2
        |order by a.k limit 20""".stripMargin)
    val want = viaSql(
      """SELECT a.k, a.n, b.m
        |FROM (SELECT o_custkey AS k, count(1) AS n FROM orders GROUP BY o_custkey) a
        |JOIN (SELECT c_nationkey AS k2, count(1) AS m FROM customer GROUP BY c_nationkey) b
        |ON a.k = b.k2
        |ORDER BY a.k LIMIT 20""".stripMargin)
    assert(df.collect().toSeq == want)
  }

  test("grouped query ordered by aggregate not in the projection") {
    val df = engine.sql(
      """select l_orderkey from lineitem
        |group by l_orderkey
        |having count(1) > 5
        |order by sum(l_quantity) desc, l_orderkey
        |limit 10""".stripMargin)
    // Spark SQL itself cannot order a projected-away aggregate here;
    // compare against the explicit two-step rewrite our lowering does
    val want = viaSql(
      """SELECT l_orderkey FROM (
        |  SELECT l_orderkey, sum(l_quantity) AS s, count(1) AS c
        |  FROM lineitem GROUP BY l_orderkey)
        |WHERE c > 5 ORDER BY s DESC, l_orderkey LIMIT 10""".stripMargin)
    assert(df.collect().toSeq == want)
  }

  test("MATCH branch containing an IN subquery") {
    val q = engine.prepare(
      """select c_custkey from customer
        |where match ?f with
        |  | buyers -> c_custkey in (select o_custkey from orders where o_totalprice > 400000.0)
        |  | all -> true
        |  end
        |order by c_custkey""".stripMargin)
    val buyers = q.bind(Map("f" -> Engine.Variant("buyers"))).count()
    val all = q.bind(Map("f" -> Engine.Variant("all"))).count()
    val wantBuyers = viaSql(
      """SELECT c_custkey FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)""".stripMargin).length
    val wantAll = viaSql("SELECT c_custkey FROM customer").length
    assert(buyers == wantBuyers && all == wantAll && buyers < all)
  }

  test("self-join with aliases keeps namespaces apart") {
    val df = engine.sql(
      """select a.n_name, b.n_name as other
        |from nation as a join nation as b on a.n_regionkey = b.n_regionkey
        |where a.n_nationkey < b.n_nationkey
        |order by a.n_name, b.n_name""".stripMargin)
    val want = viaSql(
      """SELECT a.n_name, b.n_name AS other
        |FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
        |WHERE a.n_nationkey < b.n_nationkey
        |ORDER BY a.n_name, b.n_name""".stripMargin)
    assert(df.collect().toSeq == want)
  }

  test("NOT IN with NULLs in the subquery keeps no rows (3VL)") {
    // every subquery value is NULL → x NOT IN (...) is never TRUE
    val df = engine.sql(
      """select c_custkey from customer
        |where not (c_custkey in (select nullif(o_custkey, o_custkey) from orders))
        |order by c_custkey""".stripMargin)
    val want = viaSql(
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT nullif(o_custkey, o_custkey) FROM orders)
        |ORDER BY c_custkey""".stripMargin)
    assert(want.isEmpty)
    assert(df.collect().toSeq == want)
  }

  test("NOT IN with a sometimes-NULL subquery column (3VL)") {
    val df = engine.sql(
      """select c_custkey from customer
        |where not (c_custkey in (select nullif(o_custkey, 370) from orders where o_totalprice > 400000.0))
        |order by c_custkey""".stripMargin)
    val want = viaSql(
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT nullif(o_custkey, 370) FROM orders WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin)
    assert(df.collect().toSeq == want)
  }

  test("nullable probe IN subquery under OR (3VL flag join)") {
    // nullif(c_custkey, 370): the probe itself is NULL for one row —
    // IN yields NULL there, which OR must propagate, not coalesce
    val df = engine.sql(
      """select c_custkey from customer
        |where (nullif(c_custkey, 370) in (select o_custkey from orders where o_totalprice > 400000.0))
        |   or c_acctbal < -900.0
        |order by c_custkey""".stripMargin)
    val want = viaSql(
      """SELECT c_custkey FROM customer
        |WHERE nullif(c_custkey, 370) IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |   OR c_acctbal < -900.0
        |ORDER BY c_custkey""".stripMargin)
    assert(df.collect().toSeq == want)
  }

  test("NOT of nullable-sub IN under OR propagates NULL (3VL flag join)") {
    val df = engine.sql(
      """select c_custkey from customer
        |where not (c_custkey in (select nullif(o_custkey, 370) from orders where o_totalprice > 400000.0))
        |   or c_acctbal < -900.0
        |order by c_custkey""".stripMargin)
    val want = viaSql(
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT nullif(o_custkey, 370) FROM orders WHERE o_totalprice > 400000.0)
        |   OR c_acctbal < -900.0
        |ORDER BY c_custkey""".stripMargin)
    assert(df.collect().toSeq == want)
  }

  test("EXISTS in WHERE lowers lazily: no count job at bind time") {
    // parquet reads at plan-building time may run tiny footer-read
    // jobs; the eager-EXISTS bug specifically ran a `count` action
    // per EXISTS during lowering — assert no such job fires
    val sites = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        sites.add(Option(j.properties)
          .map(p => String.valueOf(p.getProperty("callSite.short")))
          .getOrElse(""))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = engine.sql(
        """select o_orderkey from orders
          |where exists(select r_regionkey from region where r_name = 'ASIA')
          |  and not (exists(select r_regionkey from region where r_name = 'NOPE'))""".stripMargin)
      Thread.sleep(500) // listener bus is async
      val atBind = sites.toArray.mkString(", ")
      assert(!atBind.contains("count"),
        s"building the plan ran a count job: [$atBind]")
      assert(df.count() > 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("EXISTS over an empty subquery filters all rows (lazy gate)") {
    val df = engine.sql(
      """select o_orderkey from orders
        |where exists(select r_regionkey from region where r_name = 'NO_SUCH')""".stripMargin)
    assert(df.count() == 0)
  }

  test("IN subquery in a projection compiles to a flag column") {
    val df = engine.sql(
      """select c_custkey, (c_custkey in (select o_custkey from orders where o_totalprice > 400000.0)) as big
        |from customer order by c_custkey""".stripMargin)
    val want = viaSql(
      """SELECT c_custkey, c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0) AS big
        |FROM customer ORDER BY c_custkey""".stripMargin)
    assert(df.collect().toSeq == want)
  }

  test("IN subquery as a group key shares its flag with the projection") {
    val df = engine.sql(
      """select (c_custkey in (select o_custkey from orders where o_totalprice > 400000.0)) as big, count(1) as n
        |from customer
        |group by (c_custkey in (select o_custkey from orders where o_totalprice > 400000.0))
        |order by count(1)""".stripMargin)
    val want = viaSql(
      """SELECT c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0) AS big, count(1) AS n
        |FROM customer
        |GROUP BY c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |ORDER BY count(1)""".stripMargin)
    assert(df.collect().toSeq == want)
  }

  test("EXISTS in a projection evaluates to a boolean column") {
    val df = engine.sql(
      """select o_orderkey, exists(select r_regionkey from region where r_name = 'ASIA') as asia
        |from orders order by o_orderkey limit 5""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 5 && rows.forall(_.getBoolean(1)))
  }

  test("HAVING: aggregate conjunct AND IN-subquery conjunct") {
    val df = engine.sql(
      """select l_orderkey, sum(l_quantity) as total_qty
        |from lineitem group by l_orderkey
        |having sum(l_quantity) > 150.0
        |  and l_orderkey in (select o_orderkey from orders where o_totalprice > 300000.0)
        |order by l_orderkey""".stripMargin)
    val want = viaSql(
      """SELECT l_orderkey, sum(l_quantity) AS total_qty
        |FROM lineitem GROUP BY l_orderkey
        |HAVING sum(l_quantity) > 150.0
        |  AND l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000.0)
        |ORDER BY l_orderkey""".stripMargin)
    assert(want.nonEmpty)
    assert(df.collect().toSeq == want)
  }

  test("HAVING: count conjunct AND EXISTS conjunct (round-3 runtime trap)") {
    val nonEmptyGate = engine.sql(
      """select l_orderkey, count(1) as n
        |from lineitem group by l_orderkey
        |having count(1) > 5 and exists(select r_regionkey from region where r_name = 'ASIA')
        |order by l_orderkey""".stripMargin)
    val want = viaSql(
      """SELECT l_orderkey, count(1) AS n
        |FROM lineitem GROUP BY l_orderkey
        |HAVING count(1) > 5
        |ORDER BY l_orderkey""".stripMargin)
    assert(want.nonEmpty)
    assert(nonEmptyGate.collect().toSeq == want)
    val emptyGate = engine.sql(
      """select l_orderkey, count(1) as n
        |from lineitem group by l_orderkey
        |having count(1) > 5 and exists(select r_regionkey from region where r_name = 'NO_SUCH')
        |order by l_orderkey""".stripMargin)
    assert(emptyGate.count() == 0)
  }

  test("HAVING: aggregate probe inside the IN subquery conjunct") {
    // sum(l_quantity) is the probe — it must be lifted into a hidden
    // agg column before the post-aggregation flag join
    val df = engine.sql(
      """select l_orderkey from lineitem
        |group by l_orderkey
        |having sum(l_quantity) in (select l2.l_quantity from lineitem as l2 where l2.l_orderkey < 100)
        |order by l_orderkey""".stripMargin)
    val want = viaSql(
      """SELECT l_orderkey FROM lineitem
        |GROUP BY l_orderkey
        |HAVING sum(l_quantity) IN (SELECT l2.l_quantity FROM lineitem l2 WHERE l2.l_orderkey < 100)
        |ORDER BY l_orderkey""".stripMargin)
    assert(want.nonEmpty)
    assert(df.collect().toSeq == want)
  }

  test("grouped ORDER BY on an IN-subquery flag") {
    val df = engine.sql(
      """select l_orderkey, count(1) as n from lineitem
        |group by l_orderkey
        |order by (l_orderkey in (select o_orderkey from orders where o_totalprice > 400000.0)) desc, l_orderkey
        |limit 20""".stripMargin)
    // Spark SQL rejects IN-subqueries in ORDER BY outright; compare
    // against the explicit flag-column rewrite our lowering performs
    val want = viaSql(
      """SELECT l_orderkey, n FROM (
        |  SELECT l_orderkey, count(1) AS n,
        |         l_orderkey IN (SELECT o_orderkey FROM orders
        |                        WHERE o_totalprice > 400000.0) AS big
        |  FROM lineitem GROUP BY l_orderkey)
        |ORDER BY big DESC, l_orderkey LIMIT 20""".stripMargin)
    assert(df.collect().toSeq == want)
  }

  test("EXISTS in a projection lowers lazily: no count job at bind time") {
    val sites = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        sites.add(Option(j.properties)
          .map(p => String.valueOf(p.getProperty("callSite.short")))
          .getOrElse(""))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = engine.sql(
        """select o_orderkey, exists(select r_regionkey from region where r_name = 'ASIA') as asia
          |from orders""".stripMargin)
      Thread.sleep(500) // listener bus is async
      val atBind = sites.toArray.mkString(", ")
      assert(!atBind.contains("count"),
        s"building the plan ran a count job: [$atBind]")
      assert(df.count() > 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("IN subquery inside an inner-join ON condition") {
    val df = engine.sql(
      """select c_custkey, o_orderkey
        |from customer join orders
        |on c_custkey = o_custkey
        |  and o_orderkey in (select l2.l_orderkey from lineitem as l2 where l2.l_quantity > 45.0)
        |order by c_custkey, o_orderkey limit 50""".stripMargin)
    val want = viaSql(
      """SELECT c_custkey, o_orderkey
        |FROM customer JOIN orders
        |ON c_custkey = o_custkey
        |  AND o_orderkey IN (SELECT l2.l_orderkey FROM lineitem l2 WHERE l2.l_quantity > 45.0)
        |ORDER BY c_custkey, o_orderkey LIMIT 50""".stripMargin)
    assert(want.nonEmpty)
    assert(df.collect().toSeq == want)
  }

  test("LEFT JOIN ON with a right-side IN conjunct preserves left rows") {
    def run(threshold: String): (Seq[org.apache.spark.sql.Row],
        Seq[org.apache.spark.sql.Row]) = {
      val df = engine.sql(
        s"""select n_name, c_custkey
           |from nation left join customer
           |on c_nationkey = n_nationkey
           |  and c_custkey in (select o_custkey from orders where o_totalprice > $threshold)
           |order by n_name, c_custkey""".stripMargin)
      val want = viaSql(
        s"""SELECT n_name, c_custkey
           |FROM nation LEFT JOIN customer
           |ON c_nationkey = n_nationkey
           |  AND c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > $threshold)
           |ORDER BY n_name, c_custkey""".stripMargin)
      (df.collect().toSeq, want)
    }
    // matched case: plenty of qualifying customers
    val (gotLow, wantLow) = run("400000.0")
    assert(wantLow.nonEmpty && gotLow == wantLow)
    // empty-subquery case: EVERY nation survives null-extended
    val (gotHigh, wantHigh) = run("99999999.0")
    assert(wantHigh.nonEmpty && wantHigh.forall(_.isNullAt(1)))
    assert(gotHigh == wantHigh)
  }

  test("inner join whose ON is ONLY a subquery conjunct still works") {
    val df = engine.sql(
      """select r_name, n_name
        |from region join nation
        |on n_regionkey in (select r2.r_regionkey from region as r2 where r2.r_name = 'ASIA')
        |order by r_name, n_name""".stripMargin)
    val want = viaSql(
      """SELECT r_name, n_name
        |FROM region JOIN nation
        |ON n_regionkey IN (SELECT r2.r_regionkey FROM region r2 WHERE r2.r_name = 'ASIA')
        |ORDER BY r_name, n_name""".stripMargin)
    assert(want.nonEmpty)
    assert(df.collect().toSeq == want)
  }

  test("LEFT JOIN ON subquery conjunct probing both sides") {
    // the one ON shape with no single carrier side: lowered via the
    // inner pair frame + value-keyed left-anti restore
    def run(threshold: String) = {
      val df = engine.sql(
        s"""select n_name, c_custkey from nation left join customer
           |on c_nationkey = n_nationkey
           |  and (c_custkey + n_nationkey) in
           |    (select o_custkey from orders where o_totalprice > $threshold)
           |order by n_name, c_custkey""".stripMargin)
      // Spark SQL itself cannot express this ON shape
      // (UNSUPPORTED_CORRELATED_EXPRESSION_IN_JOIN_CONDITION), which is
      // why the engine lowers it manually; the reference result comes
      // from the standard expansion — matched pairs as an inner join
      // with the predicate in WHERE, re-joined on the unique left key
      val want = viaSql(
        s"""SELECT n_name, m.c_custkey FROM nation LEFT JOIN (
           |  SELECT n2.n_nationkey AS k, c_custkey FROM nation n2 JOIN customer
           |  ON c_nationkey = n2.n_nationkey
           |  WHERE (c_custkey + n2.n_nationkey) IN
           |    (SELECT o_custkey FROM orders WHERE o_totalprice > $threshold)
           |) m ON n_nationkey = m.k
           |ORDER BY n_name, m.c_custkey""".stripMargin)
      (df.collect().toSeq, want)
    }
    // matched case: some pairs survive, other nations null-extend
    val (gotLow, wantLow) = run("100000.0")
    assert(wantLow.nonEmpty && wantLow.exists(!_.isNullAt(1)) && gotLow == wantLow)
    // empty-subquery case: EVERY nation survives null-extended
    val (gotHigh, wantHigh) = run("99999999.0")
    assert(wantHigh.nonEmpty && wantHigh.forall(_.isNullAt(1)))
    assert(gotHigh == wantHigh)
  }

  test("LEFT JOIN ON mixes side-owned and both-sides subquery conjuncts") {
    // all three ON regimes at once: a left-owned IN (flag on left), a
    // plain right-owned conjunct, and a both-sides IN (pair frame +
    // anti restore)
    val df = engine.sql(
      """select n_name, c_custkey from nation left join customer
        |on c_nationkey = n_nationkey
        |  and n_regionkey in (select r_regionkey from region where r_name != 'ASIA')
        |  and c_acctbal > 0.0
        |  and (c_custkey + n_nationkey) in
        |    (select o_custkey from orders where o_totalprice > 100000.0)
        |order by n_name, c_custkey""".stripMargin)
    // same expansion as above: Spark SQL rejects both-sides subquery
    // probes in ON, so the reference is the inner-pairs + re-join form
    val want = viaSql(
      """SELECT n_name, m.c_custkey FROM nation LEFT JOIN (
        |  SELECT n2.n_nationkey AS k, c_custkey FROM nation n2 JOIN customer
        |  ON c_nationkey = n2.n_nationkey
        |  WHERE n2.n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name != 'ASIA')
        |    AND c_acctbal > 0.0
        |    AND (c_custkey + n2.n_nationkey) IN
        |      (SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0)
        |) m ON n_nationkey = m.k
        |ORDER BY n_name, m.c_custkey""".stripMargin)
    assert(want.nonEmpty && want.exists(!_.isNullAt(1)) && want.exists(_.isNullAt(1)))
    assert(df.collect().toSeq == want)
  }

  test("multi-column IN with NULLs is exact 3VL in flag positions") {
    // probe (nullif(n_nationkey,3), n_regionkey) against subquery rows
    // (r_regionkey, nullif(r_regionkey,2)) = (0,0),(1,1),(2,NULL),
    // (3,3),(4,4). Hand truth (confirmed against DuckDB, which applies
    // standard 3VL row comparison — Spark SQL has no multi-col IN
    // subquery to compare against):
    //   TRUE  for nations 0,1,4 (exact full-row match)
    //   NULL  for nation 2 (non-null probe null-matches (2,NULL))
    //         and nation 3 (NULL probe component, second matches)
    //   FALSE for every other nation
    val got = engine.sql(
      """select n_nationkey,
        |  ((nullif(n_nationkey, 3), n_regionkey) in
        |   (select r_regionkey, nullif(r_regionkey, 2) from region)) as f
        |from nation order by n_nationkey""".stripMargin)
      .collect().toSeq.map(r =>
        (r.getInt(0), if (r.isNullAt(1)) None else Some(r.getBoolean(1))))
    val want = (0 to 24).map { k =>
      (k, k match {
        case 0 | 1 | 4 => Some(true)
        case 2 | 3     => None
        case _         => Some(false)
      })
    }
    assert(got == want)
    // under OR in WHERE: NULL and FALSE both drop the row, TRUE keeps
    // it — and the other disjunct rescues one FALSE row (nation 20)
    val kept = engine.sql(
      """select n_nationkey from nation
        |where ((nullif(n_nationkey, 3), n_regionkey) in
        |       (select r_regionkey, nullif(r_regionkey, 2) from region))
        |   or n_name = 'NATION_20'
        |order by n_nationkey""".stripMargin)
      .collect().toSeq.map(_.getInt(0))
    assert(kept == Seq(0, 1, 4, 20))
    // NOT over the flag (kept under OR so it takes the flag path,
    // not the conjunct-position anti join): NOT(NULL)=NULL drops
    // nations 2 and 3 too — only definite non-matches survive
    val notKept = engine.sql(
      """select n_nationkey from nation
        |where ((not ((nullif(n_nationkey, 3), n_regionkey) in
        |       (select r_regionkey, nullif(r_regionkey, 2) from region)))
        |       or n_name = 'NO_SUCH')
        |  and n_nationkey < 6
        |order by n_nationkey""".stripMargin)
      .collect().toSeq.map(_.getInt(0))
    assert(notKept == Seq(5))
  }

  test("IN subquery in a grouped projection (not a group key)") {
    val df = engine.sql(
      """select l_orderkey, sum(l_quantity) as q,
        |  (l_orderkey in (select o_orderkey from orders where o_totalprice > 400000.0)) as big
        |from lineitem group by l_orderkey
        |order by l_orderkey limit 30""".stripMargin)
    val want = viaSql(
      """SELECT l_orderkey, sum(l_quantity) AS q,
        |  l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0) AS big
        |FROM lineitem GROUP BY l_orderkey
        |ORDER BY l_orderkey LIMIT 30""".stripMargin)
    assert(df.collect().toSeq == want)
  }

  test("same IN in WHERE-under-OR and grouped projection (memo must not leak)") {
    // the WHERE rewrite memoizes its flag on the pre-agg frame; the
    // projection under GROUP BY must NOT reuse it (not a group key) —
    // it computes its own post-aggregation flag instead
    val df = engine.sql(
      """select l_orderkey, count(1) as n,
        |  (l_orderkey in (select o_orderkey from orders where o_totalprice > 400000.0)) as big
        |from lineitem
        |where (l_orderkey in (select o_orderkey from orders where o_totalprice > 400000.0))
        |   or l_quantity > 0.0
        |group by l_orderkey
        |order by l_orderkey limit 30""".stripMargin)
    val want = viaSql(
      """SELECT l_orderkey, count(1) AS n,
        |  l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0) AS big
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000.0)
        |   OR l_quantity > 0.0
        |GROUP BY l_orderkey
        |ORDER BY l_orderkey LIMIT 30""".stripMargin)
    assert(df.collect().toSeq == want)
  }

  test("aggregate over an IN subquery in a grouped projection") {
    // count(nullif((k in sub), false)) counts the group's matches:
    // the subquery rewrites to a PRE-agg flag (aggregate arguments
    // evaluate pre-aggregation), count(nullif(flag, false)) is a
    // legal agg column. (min/max are NUMERIC-typed in the dialect,
    // so count/argMax are the aggregates that can see a BOOL.)
    val df = engine.sql(
      """select c_nationkey,
        |  count(nullif((c_custkey in (select o_custkey from orders where o_totalprice > 400000.0)), false)) as n_buyers
        |from customer group by c_nationkey
        |order by c_nationkey""".stripMargin)
    val want = viaSql(
      """SELECT c_nationkey,
        |  count(nullif(c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0), false)) AS n_buyers
        |FROM customer GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin)
    assert(want.exists(_.getLong(1) > 0))
    assert(df.collect().toSeq == want)
  }

  test("HAVING on an aggregate over an IN subquery") {
    val df = engine.sql(
      """select c_nationkey, count(1) as n
        |from customer group by c_nationkey
        |having count(nullif((c_custkey in (select o_custkey from orders where o_totalprice > 450000.0)), false)) > 0
        |order by c_nationkey""".stripMargin)
    val want = viaSql(
      """SELECT c_nationkey, count(1) AS n
        |FROM customer GROUP BY c_nationkey
        |HAVING count(nullif(c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0), false)) > 0
        |ORDER BY c_nationkey""".stripMargin)
    assert(want.nonEmpty)
    assert(df.collect().toSeq == want)
  }

  test("grouped HAVING and ORDER BY on a subquery that IS the group key") {
    // the group key's flag must be reused (a grouping column), not
    // re-lifted — lifting the raw probe into agg() would throw
    val in = "(c_custkey in (select o_custkey from orders where o_totalprice > 400000.0))"
    val df = engine.sql(
      s"""select $in as big, count(1) as n
         |from customer
         |group by $in
         |having $in
         |order by $in desc""".stripMargin)
    val want = viaSql(
      """SELECT big, n FROM (
        |  SELECT c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0) AS big,
        |         count(1) AS n
        |  FROM customer
        |  GROUP BY c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0))
        |WHERE big ORDER BY big DESC""".stripMargin)
    assert(want.length == 1 && want.head.getBoolean(0))
    assert(df.collect().toSeq == want)
  }

  test("EXISTS in a grouped projection computes post-aggregation") {
    val df = engine.sql(
      """select c_nationkey, count(1) as n,
        |  exists(select r_regionkey from region where r_name = 'ASIA') as asia,
        |  exists(select r_regionkey from region where r_name = 'NO_SUCH') as nope
        |from customer group by c_nationkey
        |order by c_nationkey""".stripMargin)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(2) && !r.getBoolean(3)))
    val plain = viaSql(
      """SELECT c_nationkey, count(1) AS n FROM customer
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
    assert(rows.map(r => (r.get(0), r.get(1))).toSeq ==
      plain.map(r => (r.get(0), r.get(1))).toSeq)
  }

  test("deeply nested open scopes (3 levels) with outer navigation") {
    val df = engine.sql(
      """select x.y.z.o_orderkey, x.(y.z.o_totalprice * 2.0)
        |from (select ... from (select ... from (select ... from orders) as z) as y) as x
        |order by x.y.z.o_orderkey limit 5""".stripMargin)
    val rows = df.collect()
    assert(rows.length == 5)
    val want = viaSql(
      "SELECT o_orderkey, o_totalprice * 2.0 FROM orders ORDER BY o_orderkey LIMIT 5")
    assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      want.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }
}
