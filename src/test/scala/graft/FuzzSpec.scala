package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.frontend.Engine

/** Randomized differential testing: generate random well-typed
  * queries from a small spec, render each BOTH as dialect text (run
  * through parse → analyze → lower) and as Spark SQL (run through
  * Spark's own parser/analyzer on temp views), and require identical
  * results. Seeded, so failures reproduce.
  */
class FuzzSpec extends SparkTestBase {

  lazy val engine: Engine = Catalog.engine(spark, sf)
  lazy val views: Unit =
    Tables.names.foreach(n =>
      Tables.load(spark, sf, n).createOrReplaceTempView(n))

  // ---- query spec ----

  // the dialect types binops against the FIRST operand (reference
  // analyze.ml:529-544), so INT and FLOAT expressions cannot mix —
  // the generator keeps each expression type-homogeneous
  case class Tbl(name: String, key: String, intCols: List[String],
      floatCols: List[String], strCols: List[String])
  val orders = Tbl("orders", "o_orderkey", List("o_custkey"),
    List("o_totalprice"), List("o_orderstatus", "o_orderpriority"))
  val customer = Tbl("customer", "c_custkey", List("c_nationkey"),
    List("c_acctbal"), List("c_name", "c_mktsegment"))
  val lineitem = Tbl("lineitem", "l_orderkey", Nil,
    List("l_quantity", "l_extendedprice", "l_discount"),
    List("l_returnflag", "l_linestatus"))

  /** A scalar expression rendered identically in both dialects. */
  case class E(dialect: String, sql: String)

  /** (expr, isFloat) with literals matching the column type. */
  def numExpr(t: Tbl): Gen[(E, Boolean)] = {
    val intBase = Gen.oneOf(t.intCols ++ List(t.key)).map(c => (E(c, c), false))
    val floatBase =
      if (t.floatCols.isEmpty) intBase
      else Gen.oneOf(t.floatCols).map(c => (E(c, c), true))
    def wrap(g: Gen[(E, Boolean)]): Gen[(E, Boolean)] = Gen.oneOf(
      g,
      for { (a, f) <- g; (b, _) <- g; op <- Gen.oneOf("+", "-", "*") }
        yield (E(s"(${a.dialect} $op ${b.dialect})",
          s"(${a.sql} $op ${b.sql})"), f),
      for { (a, f) <- g; n <- Gen.chooseNum(1, 9) }
        yield {
          val l = if (f) s"$n.0" else s"$n"
          (E(s"(${a.dialect} + $l)", s"(${a.sql} + $l)"), f)
        })
    // a whole expression is built from ONE column's type family
    Gen.oneOf(wrap(intBase), wrap(floatBase))
  }

  def boolExpr(t: Tbl): Gen[E] = {
    val cmp = for {
      (a, f) <- numExpr(t)
      op <- Gen.oneOf(">", "<", ">=", "<=", "=", "!=")
      v <- Gen.chooseNum(0, 200000)
    } yield {
      val l = if (f) s"$v.0" else s"$v"
      E(s"${a.dialect} $op $l", s"${a.sql} $op $l")
    }
    val strEq = for {
      c <- Gen.oneOf(t.strCols)
      neg <- Gen.oneOf(true, false)
    } yield {
      val d = s"$c != ''"
      if (neg) E(s"not ($d)", s"NOT ($c != '')") else E(d, s"$c != ''")
    }
    def combine(g: Gen[E]): Gen[E] = Gen.oneOf(
      g,
      for { a <- g; b <- g; op <- Gen.oneOf("and", "or") }
        yield E(s"(${a.dialect} $op ${b.dialect})",
          s"(${a.sql} ${op.toUpperCase} ${b.sql})"))
    combine(Gen.oneOf(cmp, strEq))
  }

  case class Q(dialect: String, sql: String)

  val genQuery: Gen[Q] = for {
    t <- Gen.oneOf(orders, customer, lineitem)
    kind <- Gen.chooseNum(0, 8)
    q <- kind match {
      case 0 => plainQuery(t)
      case 1 => groupedQuery(t)
      case 2 => joinQuery
      case 3 => havingSubQuery(t)
      case 4 => joinOnSubQuery
      case 5 => groupedProjInQuery(t)
      case 6 => combinedSubqueryQuery(t)
      case 7 => optionalJoinQuery
      case _ => inQuery(t)
    }
  } yield q

  /** Subqueries in projection AND HAVING AND ORDER BY of the SAME
    * grouped query — the full SubqueryFlags memo-interaction surface:
    * each position lowers against the pre- or post-aggregation frame
    * and the memoized flag joins must compose without clobbering each
    * other (ORDER BY either reuses the projection's flag — one join
    * must serve both positions — or brings its own subquery). Probes
    * are non-null group keys or aggregates over them, where Spark's
    * ExistenceJoin agrees with the standard.
    */
  def combinedSubqueryQuery(t: Tbl): Gen[Q] = for {
    subP <- boolExpr(orders)
    probeAggP <- Gen.oneOf(true, false)
    negP <- Gen.oneOf(true, false)
    subH <- boolExpr(orders)
    negH <- Gen.oneOf(true, false)
    withExists <- Gen.oneOf(true, false)
    exSub <- boolExpr(orders)
    aggCmp <- Gen.chooseNum(1, 4)
    reuseInOrder <- Gen.oneOf(true, false)
    subO <- boolExpr(orders)
    probeAggO <- Gen.oneOf(true, false)
  } yield {
    val key = t.key
    val subKey = if (t == customer) "o_custkey" else "o_orderkey"
    def in(probe: String, sub: E, neg: Boolean): (String, String) = {
      val d = s"$probe in (select $subKey from orders where ${sub.dialect})"
      val s = s"$probe IN (SELECT $subKey FROM orders WHERE ${sub.sql})"
      if (neg) (s"not ($d)", s"NOT ($s)") else (d, s)
    }
    val (pd, ps) = in(if (probeAggP) s"min($key)" else key, subP, negP)
    val (hd, hs) = in(if (probeAggP) key else s"max($key)", subH, negH)
    val exD = if (withExists)
      s" and exists(select o_orderkey from orders where ${exSub.dialect})" else ""
    val exS = if (withExists)
      s" AND EXISTS (SELECT o_orderkey FROM orders WHERE ${exSub.sql})" else ""
    if (reuseInOrder)
      // ORDER BY repeats the projection's subquery on the dialect
      // side (the memoized flag must serve both positions from one
      // join); the twin orders by the ALIAS — Spark's analyzer fails
      // to match the repeated sort subquery to the projection alias
      // when HAVING also carries an aggregate-probed subquery
      Q(s"select $key, count(1) as n, ($pd) as f from ${t.name} " +
          s"group by $key having count(1) >= $aggCmp and $hd$exD " +
          s"order by ($pd), $key limit 100",
        s"SELECT $key, count(1) AS n, ($ps) AS f FROM ${t.name} " +
          s"GROUP BY $key HAVING count(1) >= $aggCmp AND $hs$exS " +
          s"ORDER BY f, $key LIMIT 100")
    else {
      // a FRESH subquery in ORDER BY: Spark SQL cannot sort on an
      // IN-subquery expression directly (unsupported position), so
      // the twin projects it as a flag one level down and orders by
      // the resolved column — the engine lowers it the same way
      val (d, s) = in(if (probeAggO) s"min($key)" else key, subO, neg = false)
      Q(s"select $key, count(1) as n, ($pd) as f from ${t.name} " +
          s"group by $key having count(1) >= $aggCmp and $hd$exD " +
          s"order by ($d), $key limit 100",
        s"SELECT $key, n, f FROM (" +
          s"SELECT $key, count(1) AS n, ($ps) AS f, ($s) AS o " +
          s"FROM ${t.name} GROUP BY $key " +
          s"HAVING count(1) >= $aggCmp AND $hs$exS) __t " +
          s"ORDER BY o, $key LIMIT 100")
    }
  }

  /** IN subqueries inside a GROUPED projection — probing the group
    * key or an aggregate over it (the post-aggregation flag path with
    * restricted memo reuse). Probes and subquery are non-null, where
    * Spark's ExistenceJoin agrees with the standard.
    */
  def groupedProjInQuery(t: Tbl): Gen[Q] = for {
    sub <- boolExpr(orders)
    probeAgg <- Gen.oneOf(true, false)
    neg <- Gen.oneOf(true, false)
    alsoOrder <- Gen.oneOf(true, false)
  } yield {
    val key = t.key
    val subKey = if (t == customer) "o_custkey" else "o_orderkey"
    val probe = if (probeAgg) s"min($key)" else key
    val inD = s"$probe in (select $subKey from orders where ${sub.dialect})"
    val inS = s"$probe IN (SELECT $subKey FROM orders WHERE ${sub.sql})"
    val (fd, fs) = if (neg) (s"not ($inD)", s"NOT ($inS)") else (inD, inS)
    // optionally ALSO order by the same flag: the memoized flag must
    // serve both positions from one join
    val (od, os) = if (alsoOrder) (s"($fd), $key", s"($fs), $key")
      else (key, key)
    Q(s"select $key, count(1) as n, ($fd) as f from ${t.name} group by $key order by $od limit 100",
      s"SELECT $key, count(1) AS n, ($fs) AS f FROM ${t.name} GROUP BY $key ORDER BY $os LIMIT 100")
  }

  /** IN/EXISTS subquery conjuncts inside a join's ON — inner and LEFT,
    * probing the right side, the left side, or both. Spark SQL rejects
    * subqueries in join conditions outright, so the twin uses the
    * standard expansions: for inner joins an ON conjunct is a WHERE
    * conjunct; for LEFT joins the filtered inner pair frame is
    * re-joined on the (unique) left key — the same expansion the sq15
    * oracle uses.
    */
  def joinOnSubQuery: Gen[Q] = for {
    sub <- boolExpr(orders)
    probeKind <- Gen.chooseNum(0, 2) // 0 right-side, 1 left-side, 2 both
    outer <- Gen.oneOf(true, false)
    withExists <- Gen.oneOf(true, false)
    exSub <- boolExpr(orders)
    lim <- Gen.chooseNum(20, 80)
  } yield {
    // probe referencing the right input, the left input, or both
    val probe = probeKind match {
      case 0 => "o_custkey"
      case 1 => "c_custkey"
      case _ => "(c_nationkey + o_custkey)"
    }
    val inD = s"$probe in (select o_custkey from orders where ${sub.dialect})"
    def inS(leftQual: String): String = {
      val p = probeKind match {
        case 0 => "o_custkey"
        case 1 => s"$leftQual.c_custkey"
        case _ => s"($leftQual.c_nationkey + o_custkey)"
      }
      s"$p IN (SELECT o_custkey FROM orders WHERE ${sub.sql})"
    }
    val exD = if (withExists)
      s" and exists(select o_orderkey from orders where ${exSub.dialect})" else ""
    def exS: String = if (withExists)
      s" AND EXISTS (SELECT o_orderkey FROM orders WHERE ${exSub.sql})" else ""
    if (!outer)
      Q(s"select c_custkey, o_orderkey from customer join orders on o_custkey = c_custkey and $inD$exD order by c_custkey, o_orderkey limit $lim",
        s"SELECT c_custkey, o_orderkey FROM customer JOIN orders ON o_custkey = c_custkey WHERE ${inS("customer")}$exS ORDER BY c_custkey, o_orderkey LIMIT $lim")
    else
      Q(s"select c_custkey, o_orderkey from customer left join orders on o_custkey = c_custkey and $inD$exD order by c_custkey, o_orderkey limit $lim",
        s"""SELECT c_custkey, m.o_orderkey AS o_orderkey FROM customer LEFT JOIN (
           |  SELECT c2.c_custkey AS k, o_orderkey FROM customer c2 JOIN orders
           |  ON o_custkey = c2.c_custkey WHERE ${inS("c2")}$exS
           |) m ON c_custkey = m.k
           |ORDER BY c_custkey, m.o_orderkey LIMIT $lim""".stripMargin)
  }

  /** HAVING mixing an aggregate conjunct with IN / NOT IN / EXISTS
    * subquery conjuncts (the post-aggregation split): probes are the
    * group key or an aggregate over it, differentially checked against
    * Spark SQL's filter-position subqueries (standard 3VL there).
    */
  def havingSubQuery(t: Tbl): Gen[Q] = for {
    sub <- boolExpr(orders)
    neg <- Gen.oneOf(true, false)
    aggCmp <- Gen.chooseNum(1, 6)
    probeAgg <- Gen.oneOf(true, false)
    withExists <- Gen.oneOf(true, false)
    exSub <- boolExpr(orders)
  } yield {
    val key = t.key
    val subKey = if (t == customer) "o_custkey" else "o_orderkey"
    val probe = if (probeAgg) s"min($key)" else key
    val inD = s"$probe in (select $subKey from orders where ${sub.dialect})"
    val inS = s"$probe IN (SELECT $subKey FROM orders WHERE ${sub.sql})"
    val (pd, ps) = if (neg) (s"not ($inD)", s"NOT ($inS)") else (inD, inS)
    val exD = if (withExists)
      s" and exists(select o_orderkey from orders where ${exSub.dialect})" else ""
    val exS = if (withExists)
      s" AND EXISTS (SELECT o_orderkey FROM orders WHERE ${exSub.sql})" else ""
    Q(s"select $key, count(1) as n from ${t.name} group by $key having count(1) >= $aggCmp and $pd$exD order by $key limit 100",
      s"SELECT $key, count(1) AS n FROM ${t.name} GROUP BY $key HAVING count(1) >= $aggCmp AND $ps$exS ORDER BY $key LIMIT 100")
  }

  /** customer ⋈ orders equi-join with filters on either side. */
  def joinQuery: Gen[Q] = for {
    wc <- Gen.option(boolExpr(customer))
    wo <- Gen.option(boolExpr(orders))
    lim <- Gen.chooseNum(5, 60)
  } yield {
    val conds = wc.toList ++ wo.toList
    val wD = if (conds.isEmpty) ""
      else " where " + conds.map(_.dialect).mkString(" and ")
    val wS = if (conds.isEmpty) ""
      else " WHERE " + conds.map(_.sql).mkString(" AND ")
    Q(s"select o_orderkey, c_name, o_totalprice from customer join orders on o_custkey = c_custkey$wD order by o_orderkey limit $lim",
      s"SELECT o_orderkey, c_name, o_totalprice FROM customer JOIN orders ON o_custkey = c_custkey$wS ORDER BY o_orderkey LIMIT $lim")
  }

  /** key IN (filtered subquery) in three shapes — WHERE conjunct
    * (semi / null-aware anti join), under OR (flag join), projection
    * value (materialized flag) — with optional nullif-injected NULLs
    * on the probe and/or subquery side to exercise three-valued
    * semantics differentially against Spark SQL.
    */
  def inQuery(t: Tbl): Gen[Q] = for {
    sub <- boolExpr(orders)
    neg <- Gen.oneOf(true, false)
    nullSub0 <- Gen.oneOf(true, false)
    nullProbe0 <- Gen.frequency(3 -> false, 1 -> true)
    multi <- Gen.oneOf(true, false)
    shape <- Gen.chooseNum(0, 2)
    k <- Gen.chooseNum(1, 400)
  } yield {
    // NULL injection only in the WHERE-conjunct shape: there Spark's
    // null-aware anti join is standard 3VL like us (single- AND
    // multi-column). In projection / under-OR positions Spark SQL
    // itself is NON-standard (its ExistenceJoin treats `2 IN (1,
    // NULL)` as false where the standard, DuckDB, and the reference's
    // backends say NULL), so a Spark differential would flag OUR
    // standard behavior as wrong — those positions are oracle-checked
    // deterministically instead (sq3, sq16, EngineEdgeSpec 3VL suite).
    val nullSub = nullSub0 && shape == 0
    val nullProbe = nullProbe0 && shape == 0
    val keyCol = t match {
      case `customer` => "c_custkey"
      case `lineitem` => "l_orderkey"
      case _          => "o_orderkey"
    }
    val key2 = t match {
      case `customer` => "c_nationkey"
      case `lineitem` => "l_linenumber"
      case _          => "o_custkey"
    }
    val subKey = if (t == customer) "o_custkey" else "o_orderkey"
    val subExpr0 = if (nullSub) s"nullif($subKey, $k)" else subKey
    val probe0 = if (nullProbe) s"nullif($keyCol, $k)" else keyCol
    // multi-column probes pair the key with a second column; in the
    // WHERE-conjunct shape the second subquery column is ALSO
    // nullif-injected so the per-component NULL verdict (null-match
    // row comparison) is exercised — but ONLY there: in projection
    // position a NULL component makes Spark's ExistenceJoin return
    // false where the standard (and our mark join) says NULL, so an
    // injected second column would flag our standard answer as wrong
    // (found by soak seed 411)
    val probe = if (multi) s"($probe0, $key2)" else probe0
    val sub2 = if (nullSub) "nullif(o_custkey, 3)" else "o_custkey"
    val subExpr = if (multi) s"$subExpr0, $sub2" else subExpr0
    val inD = s"$probe in (select $subExpr from orders where ${sub.dialect})"
    val inS = s"$probe IN (SELECT $subExpr FROM orders WHERE ${sub.sql})"
    val (pd, ps) = if (neg) (s"not ($inD)", s"NOT ($inS)") else (inD, inS)
    shape match {
      case 0 =>
        Q(s"select $keyCol from ${t.name} where $pd order by $keyCol limit 80",
          s"SELECT $keyCol FROM ${t.name} WHERE $ps ORDER BY $keyCol LIMIT 80")
      case 1 =>
        Q(s"select $keyCol from ${t.name} where ($pd or $keyCol = $k) order by $keyCol limit 80",
          s"SELECT $keyCol FROM ${t.name} WHERE ($ps OR $keyCol = $k) ORDER BY $keyCol LIMIT 80")
      case _ =>
        Q(s"select $keyCol, ($pd) as f from ${t.name} order by $keyCol limit 80",
          s"SELECT $keyCol, ($ps) AS f FROM ${t.name} ORDER BY $keyCol LIMIT 80")
    }
  }

  /** LEFT OPTIONAL JOIN differential: nation is UNIQUE on
    * n_nationkey, so the optional join is genuinely row-preserving
    * and the Spark SQL twin is always a PLAIN LEFT JOIN — whether the
    * engine eliminates the join (right side unreferenced: projRight
    * and whereRight both false) or keeps it, results must be
    * identical. This is the semantic contract the author asserts when
    * writing OPTIONAL, fuzzed across random filters and projections.
    */
  def optionalJoinQuery: Gen[Q] = for {
    projRight <- Gen.oneOf(true, false)
    whereRight <- Gen.oneOf(true, false)
    wc <- Gen.option(boolExpr(customer))
    rk <- Gen.chooseNum(0, 4)
    lim <- Gen.chooseNum(5, 60)
  } yield {
    val proj = if (projRight) ", n_name" else ""
    // a right-side WHERE keeps the join AND filters null-extended
    // rows — both engines must agree on that interaction too
    val condsD = wc.map(_.dialect).toList ++
      (if (whereRight) List(s"n_regionkey >= $rk") else Nil)
    val condsS = wc.map(_.sql).toList ++
      (if (whereRight) List(s"n_regionkey >= $rk") else Nil)
    val wD = if (condsD.isEmpty) "" else " where " + condsD.mkString(" and ")
    val wS = if (condsS.isEmpty) "" else " WHERE " + condsS.mkString(" AND ")
    Q(s"select c_custkey$proj from customer left optional join nation on n_nationkey = c_nationkey$wD order by c_custkey limit $lim",
      s"SELECT c_custkey$proj FROM customer LEFT JOIN nation ON n_nationkey = c_nationkey$wS ORDER BY c_custkey LIMIT $lim")
  }

  def plainQuery(t: Tbl): Gen[Q] = for {
    proj <- Gen.someOf(t.intCols ++ t.floatCols ++ t.strCols).map(_.toList)
    where <- Gen.option(boolExpr(t))
    lim <- Gen.chooseNum(5, 60)
  } yield {
    val cols = (t.key :: proj).distinct
    val wD = where.map(w => s" where ${w.dialect}").getOrElse("")
    val wS = where.map(w => s" WHERE ${w.sql}").getOrElse("")
    Q(s"select ${cols.mkString(", ")} from ${t.name}$wD order by ${t.key} limit $lim",
      s"SELECT ${cols.mkString(", ")} FROM ${t.name}$wS ORDER BY ${t.key} LIMIT $lim")
  }

  def groupedQuery(t: Tbl): Gen[Q] = for {
    g <- Gen.oneOf(t.strCols)
    aggCol <- Gen.oneOf(t.intCols ++ t.floatCols)
    agg <- Gen.oneOf("min", "max", "count")
    where <- Gen.option(boolExpr(t))
    having <- Gen.oneOf(true, false)
  } yield {
    val aggD = if (agg == "count") "count(1)" else s"$agg($aggCol)"
    val wD = where.map(w => s" where ${w.dialect}").getOrElse("")
    val wS = where.map(w => s" WHERE ${w.sql}").getOrElse("")
    val hD = if (having) " having count(1) > 2" else ""
    val hS = if (having) " HAVING count(1) > 2" else ""
    Q(s"select $g, $aggD as a, count(1) as n from ${t.name}$wD group by $g$hD order by $g",
      s"SELECT $g, $aggD AS a, count(1) AS n FROM ${t.name}$wS GROUP BY $g$hS ORDER BY $g")
  }

  /** Randomized DML with IN subqueries in WHERE / SET / RETURNING:
    * run each statement through the managed engine against a seeded
    * table, then compare BOTH the final table state and the RETURNING
    * frame against a declarative Spark SQL twin over the immutable
    * seed view. Covers the round-5/6 positions (DML WHERE IN / NOT
    * IN, SET values containing IN subqueries, RETURNING) that example
    * specs pinned individually.
    */
  case class Dml(stmt: String, finalSql: String, returning: Option[String])

  def fzPred: Gen[E] = {
    val numCmp = for {
      c <- Gen.oneOf("id", "n")
      op <- Gen.oneOf(">", "<", ">=", "<=", "!=")
      v <- Gen.chooseNum(0, 400)
    } yield E(s"$c $op $v", s"$c $op $v")
    val strCmp = for (p <- Gen.oneOf("aa", "ff", "mm", "ss"))
      yield E(s"s > '$p'", s"s > '$p'")
    val base = Gen.oneOf(numCmp, strCmp)
    Gen.oneOf(base,
      for { a <- base; b <- base; op <- Gen.oneOf("and", "or") }
        yield E(s"(${a.dialect} $op ${b.dialect})",
          s"(${a.sql} ${op.toUpperCase} ${b.sql})"))
  }

  val genDml: Gen[Dml] = for {
    p <- fzPred
    p2 <- fzPred
    shape <- Gen.chooseNum(0, 6)
    d <- Gen.chooseNum(1, 9)
    k1 <- Gen.chooseNum(0, 119) // always present in the seed
    kf <- Gen.chooseNum(500, 900) // never present
  } yield {
    val inD = s"id in (select id from fz where ${p.dialect})"
    val inS = s"id IN (SELECT id FROM fzseed WHERE ${p.sql})"
    shape match {
      case 0 => Dml(
        s"delete from fz where $inD",
        s"SELECT id, n, s, b FROM fzseed WHERE NOT ($inS)", None)
      case 1 => Dml(
        s"update fz set s = 'zz' where $inD",
        s"SELECT id, n, CASE WHEN $inS THEN 'zz' ELSE s END AS s, b FROM fzseed",
        None)
      case 2 => Dml(
        s"update fz set b = ($inD) where ${p2.dialect}",
        s"SELECT id, n, s, CASE WHEN ${p2.sql} THEN $inS ELSE b END AS b FROM fzseed",
        None)
      case 3 => Dml(
        s"update fz set n = n + $d where $inD returning id, n",
        s"SELECT id, CASE WHEN $inS THEN n + $d ELSE n END AS n, s, b FROM fzseed",
        Some(s"SELECT id, n + $d AS n FROM fzseed WHERE $inS"))
      case 4 => Dml(
        s"delete from fz where not ($inD) returning id, s",
        s"SELECT id, n, s, b FROM fzseed WHERE $inS",
        Some(s"SELECT id, s FROM fzseed WHERE NOT ($inS)"))
      // upsert: one conflicting key (updates via existing+excluded)
      // and one fresh key (inserts); RETURNING covers both
      case 5 => Dml(
        s"insert into fz(id, n, s, b) values ($k1, $d, 'uu', true), " +
          s"($kf, $d, 'nn', false) " +
          "on conflict update set n = fz.n + excluded.n, s = excluded.s " +
          "returning id, n",
        s"SELECT id, CASE WHEN id = $k1 THEN n + $d ELSE n END AS n, " +
          s"CASE WHEN id = $k1 THEN 'uu' ELSE s END AS s, b FROM fzseed " +
          s"UNION ALL SELECT $kf, $d, 'nn', false",
        Some(s"SELECT id, n + $d AS n FROM fzseed WHERE id = $k1 " +
          s"UNION ALL SELECT $kf, $d"))
      // upsert whose SET carries an IN subquery over the
      // pre-statement table state
      case _ => Dml(
        s"insert into fz(id, n, s, b) values ($k1, 7, 'qq', true) " +
          s"on conflict update set b = (fz.id in " +
          s"(select id from fz where ${p.dialect}))",
        s"SELECT id, n, s, CASE WHEN id = $k1 THEN " +
          s"id IN (SELECT id FROM fzseed WHERE ${p.sql}) " +
          "ELSE b END AS b FROM fzseed",
        None)
    }
  }

  test("randomized DML with subqueries: managed state equals declarative twin") {
    val root = java.nio.file.Files.createTempDirectory("graft_fuzz_dml")
    val env = new graft.frontend.Analyzer.Env().addDecls(
      """create table fz (
        |  id int not null primary key, n int not null,
        |  s string not null, b bool not null)""".stripMargin)
    val catalog = new graft.frontend.ManagedCatalog(spark, root.toString, env)
    val managed = new graft.frontend.ManagedEngine(catalog,
      new Engine(spark, env, catalog.load _))
    val seed = Tables.load(spark, sf, "documents")
      .selectExpr("doc_id AS id", "n_chars AS n", "lang AS s",
        "n_chars > 250 AS b")
      .filter("id < 120")
    seed.createOrReplaceTempView("fzseed")
    val n = sys.props.getOrElse("graft.fuzz.dml.n", "10").toInt
    var checked = 0
    (0 until n).foreach { i =>
      genDml.apply(Gen.Parameters.default, Seed(1000L + i)).foreach { q =>
        catalog.overwrite("fz", seed)
        val ret = managed.exec(q.stmt)
        q.returning.foreach { rSql =>
          val mine = ret.collect().map(_.toString).sorted.toSeq
          val want = spark.sql(rSql).collect().map(_.toString).sorted.toSeq
          assert(mine == want, s"seed $i RETURNING\n stmt: ${q.stmt}")
        }
        val state = managed.exec("select id, n, s, b from fz order by id")
          .collect().map(_.toString).toSeq
        val want = spark.sql(q.finalSql + " ORDER BY id")
          .collect().map(_.toString).toSeq
        assert(state == want, s"seed $i\n stmt: ${q.stmt}\n twin: ${q.finalSql}")
        checked += 1
      }
    }
    info(s"$checked random DML statements matched")
    assert(checked >= n / 2)
  }

  // ---- composition-surface fuzz: the reference's crown jewels ----
  // fieldset splices, WITHSCOPE aliases, nav pushdown (single and
  // chained through two open levels), MATCH variant branches — each
  // generated query rendered as dialect text against a composition
  // env AND as plain Spark SQL with the composition hand-expanded.

  lazy val compEngine: Engine = {
    val env = Catalog.env().addDecls(
      """create query ostats as
        |  select o_custkey as k, with count(1) as n,
        |    with sum(o_totalprice) as st, with min(o_orderkey) as mo, ...
        |  from orders group by o_custkey;
        |create fieldset cinfo(from customer AS c) as
        |  select c.c_custkey as cid, c.c_name as cname;
        |create fieldset oinfo(from orders AS o) as
        |  select o.o_orderkey as oid, (o.o_totalprice * 2.0) as tp2;
        |""".stripMargin)
    new Engine(spark, env, name => Tables.load(spark, sf, name))
  }

  val ostatsCte =
    """SELECT o_custkey AS k, count(1) AS n, sum(o_totalprice) AS st,
      |       min(o_orderkey) AS mo, sum(o_totalprice) AS g,
      |       min(o_totalprice) AS gmin, max(o_totalprice) AS gmax
      |FROM orders GROUP BY o_custkey""".stripMargin

  /** Shape A: named query in FROM, random subset of its lazy fields
    * used, plus an optional nav-pushdown aggregate the named query
    * never declared.
    */
  def compNamedQuery: Gen[(Q, Map[String, Any])] = for {
    useN <- Gen.oneOf(true, false)
    useSt <- Gen.oneOf(true, false)
    useMo <- Gen.oneOf(true, false)
    nav <- Gen.oneOf(None, Some(("sum", "g")), Some(("min", "gmin")),
      Some(("max", "gmax")))
    pred <- boolExpr(customer)
    lim <- Gen.chooseNum(5, 40)
  } yield {
    val dFields = List(
      if (useN) Some("st.n") else None,
      if (useSt) Some("st.st") else None,
      if (useMo) Some("st.mo") else None,
      nav.map { case (f, _) => s"st.$f(o_totalprice)" }).flatten
    val sFields = List(
      if (useN) Some("st.n") else None,
      if (useSt) Some("st.st") else None,
      if (useMo) Some("st.mo") else None,
      nav.map { case (_, a) => s"st.$a" }).flatten
    (Q(
      s"""select c_custkey${dFields.map(", " + _).mkString}
         |from customer join ostats as st on c_custkey = st.k
         |where ${pred.dialect}
         |order by c_custkey limit $lim""".stripMargin,
      s"""WITH st AS ($ostatsCte)
         |SELECT c_custkey${sFields.map(", " + _).mkString}
         |FROM customer JOIN st ON c_custkey = st.k
         |WHERE ${pred.sql}
         |ORDER BY c_custkey LIMIT $lim""".stripMargin), Map.empty)
  }

  /** Shape B: nav pushdown CHAINED through two open levels — the
    * outer query navigates an aggregate into a subselect that itself
    * wraps the open grouped named query.
    */
  def compNavChain: Gen[(Q, Map[String, Any])] = for {
    useN <- Gen.oneOf(true, false)
    navF <- Gen.oneOf(("sum", "g"), ("min", "gmin"), ("max", "gmax"))
    v <- Gen.chooseNum(10, 400)
    lim <- Gen.chooseNum(5, 40)
  } yield {
    val (f, a) = navF
    (Q(
      s"""select z.k${if (useN) ", z.n" else ""}, z.st.$f(o_totalprice)
         |from (select st.k as k, with st.n as n, ... from ostats as st) as z
         |where z.k > $v
         |order by z.k limit $lim""".stripMargin,
      s"""WITH st AS ($ostatsCte)
         |SELECT k${if (useN) ", n" else ""}, $a
         |FROM st WHERE k > $v
         |ORDER BY k LIMIT $lim""".stripMargin), Map.empty)
  }

  /** Shape C: fieldset splice at a random projection position, eager,
    * against an aliased scope.
    */
  def compFieldset: Gen[(Q, Map[String, Any])] = for {
    onCustomer <- Gen.oneOf(true, false)
    lead <- Gen.oneOf(true, false)
    trail <- Gen.oneOf(true, false)
    pred <- boolExpr(if (onCustomer) customer else orders)
    lim <- Gen.chooseNum(5, 40)
  } yield {
    val q =
      if (onCustomer) Q(
        s"""select ${if (lead) "c_acctbal, " else ""}...cinfo(cx)${if (trail) ", c_mktsegment" else ""}
           |from customer as cx
           |where ${pred.dialect}
           |order by cx.c_custkey limit $lim""".stripMargin,
        s"""SELECT ${if (lead) "c_acctbal, " else ""}c_custkey, c_name${if (trail) ", c_mktsegment" else ""}
           |FROM customer WHERE ${pred.sql}
           |ORDER BY c_custkey LIMIT $lim""".stripMargin)
      else Q(
        s"""select ${if (lead) "o_orderstatus, " else ""}...oinfo(ox)${if (trail) ", o_custkey" else ""}
           |from orders as ox
           |where ${pred.dialect}
           |order by ox.o_orderkey limit $lim""".stripMargin,
        s"""SELECT ${if (lead) "o_orderstatus, " else ""}o_orderkey, o_totalprice * 2.0${if (trail) ", o_custkey" else ""}
           |FROM orders WHERE ${pred.sql}
           |ORDER BY o_orderkey LIMIT $lim""".stripMargin)
    (q, Map.empty)
  }

  /** Shape D: WITHSCOPE re-export, projecting through the alias
    * (ORDER BY stays on the original alias — it is analyzed before
    * the projection, same as the reference).
    */
  def compWithScope: Gen[(Q, Map[String, Any])] = for {
    extra <- Gen.oneOf(true, false)
    pred <- boolExpr(customer)
    lim <- Gen.chooseNum(5, 40)
  } yield (Q(
    s"""select withscope c as w, w.c_custkey, w.c_acctbal${if (extra) ", c.c_name" else ""}
       |from customer as c
       |where ${pred.dialect}
       |order by c.c_custkey limit $lim""".stripMargin,
    s"""SELECT c_custkey, c_acctbal${if (extra) ", c_name" else ""}
       |FROM customer WHERE ${pred.sql}
       |ORDER BY c_custkey LIMIT $lim""".stripMargin), Map.empty)

  /** Shape E: MATCH variant param — each generated query binds one
    * branch; one branch carries an IN subquery so per-branch plans
    * include the subquery machinery.
    */
  def compMatch: Gen[(Q, Map[String, Any])] = for {
    branch <- Gen.chooseNum(0, 2)
    x <- Gen.chooseNum(50000, 450000)
    lim <- Gen.chooseNum(5, 40)
  } yield {
    val dialect =
      s"""select o_orderkey, o_totalprice from orders
         |where match ?q with
         |  | all -> true
         |  | lo ?x -> o_totalprice < ?x: float
         |  | probe -> o_orderkey in
         |      (select l_orderkey from lineitem where l_quantity > 45.0)
         |  end
         |order by o_orderkey limit $lim""".stripMargin
    val (cond, params) = branch match {
      case 0 => ("true", Map[String, Any]("q" -> Engine.Variant("all")))
      case 1 => (s"o_totalprice < $x.0",
        Map[String, Any]("q" -> Engine.Variant("lo", x.toDouble)))
      case _ => ("o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45.0)",
        Map[String, Any]("q" -> Engine.Variant("probe")))
    }
    (Q(dialect,
      s"""SELECT o_orderkey, o_totalprice FROM orders
         |WHERE $cond
         |ORDER BY o_orderkey LIMIT $lim""".stripMargin), params)
  }

  val genCompQuery: Gen[(Q, Map[String, Any])] = Gen.chooseNum(0, 4).flatMap {
    case 0 => compNamedQuery
    case 1 => compNavChain
    case 2 => compFieldset
    case 3 => compWithScope
    case _ => compMatch
  }

  test("randomized composition: fieldsets, withscope, nav pushdown, MATCH equal Spark SQL") {
    views
    var checked = 0
    // soak knob: -Dgraft.fuzz.comp.n=800 for a deeper one-off sweep
    val n = sys.props.getOrElse("graft.fuzz.comp.n", "120").toInt
    (0 until n).foreach { i =>
      genCompQuery.apply(Gen.Parameters.default, Seed(5000L + i)).foreach {
        case (q, params) =>
          def run(side: String, f: => Seq[org.apache.spark.sql.Row]) =
            try f catch {
              case e: Throwable => fail(
                s"seed $i $side threw ${e.getClass.getSimpleName}: " +
                  s"${Option(e.getMessage).getOrElse("").linesIterator.toSeq.headOption.getOrElse("")}\n" +
                  s" dialect: ${q.dialect}\n sql: ${q.sql}")
            }
          val mine = run("engine", compEngine.sql(q.dialect, params).collect().toSeq)
          val ref = run("spark-sql twin", spark.sql(q.sql).collect().toSeq)
          assert(mine == ref,
            s"seed $i\n dialect: ${q.dialect}\n sql: ${q.sql}")
          checked += 1
      }
    }
    info(s"$checked random composition queries matched")
    assert(checked >= n / 2)
  }

  test("200 random queries: engine pipeline equals Spark SQL") {
    views
    var checked = 0
    // soak knob: -Dgraft.fuzz.n=1500 for a deeper one-off sweep
    val n = sys.props.getOrElse("graft.fuzz.n", "220").toInt
    (0 until n).foreach { i =>
      genQuery.apply(Gen.Parameters.default, Seed(i.toLong)).foreach { q =>
        // run each side under a seed-stamped wrapper: an exception
        // (not just a mismatch) must still report WHICH seed/query
        // produced it or the failure is undebuggable
        def run(side: String, f: => Seq[org.apache.spark.sql.Row]) =
          try f catch {
            case e: Throwable => fail(
              s"seed $i $side threw ${e.getClass.getSimpleName}: " +
                s"${Option(e.getMessage).getOrElse("").linesIterator.toSeq.headOption.getOrElse("")}\n" +
                s" dialect: ${q.dialect}\n sql: ${q.sql}")
          }
        val mine = run("engine", engine.sql(q.dialect).collect().toSeq)
        val ref = run("spark-sql twin", spark.sql(q.sql).collect().toSeq)
        assert(mine == ref,
          s"seed $i\n dialect: ${q.dialect}\n sql: ${q.sql}")
        checked += 1
      }
    }
    info(s"$checked random queries matched")
    assert(checked >= 200)
  }
}
