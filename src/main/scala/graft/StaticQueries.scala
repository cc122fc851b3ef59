package graft

import graft.frontend.{Analyzer, Parser}
import graft.frontend.Syntax.SqlppError

/** Build-time validation of statically embedded queries — the
  * Spark-free analogue of the reference's PPX compile gate
  * (reference sqlpp_ppx.ml:406-458, which rejects ill-typed queries
  * at OCaml compile time): every query an application embeds is
  * parsed + analyzed against the declared schema by the
  * `sbt validateQueries` task, which fails the build on any
  * parse/scope/type error before anything touches a cluster. The
  * analyzer needs no SparkSession, so the check costs one plain JVM.
  */
object StaticQueries {

  /** The application's statically embedded queries (the set a PPX
    * would have checked at compile time). Each entry also records the
    * inferred row type on success, printed for review.
    */
  val registry: Map[String, String] = Map(
    "top_orders" ->
      "select o_orderkey, o_totalprice from orders order by o_totalprice desc limit 10",
    "customer_balance" ->
      "select c_name, c_acctbal from customer where c_acctbal > ?minBal:float",
    "orders_by_status" ->
      "select o_orderstatus, count(1) as n, max(o_totalprice) as top from orders group by o_orderstatus",
    "region_nations" ->
      """select r.r_name, n.n_name
        |from region as r join nation as n on n.n_regionkey = r.r_regionkey
        |order by r.r_name, n.n_name""".stripMargin,
    "big_spenders" ->
      """select c_custkey from customer
        |where c_custkey in (select o_custkey from orders where o_totalprice > ?floor:float)
        |order by c_custkey""".stripMargin,
    "recent_events" ->
      "select event_id, event_type from events where ts > ?since:datetime order by event_id",
    "doc_sources" ->
      "select source, count(1) as n from documents group by source order by source",
  )

  /** Analyze every registered query; returns (name → error) for the
    * failures and prints inferred row types for the successes.
    */
  def validate(env: Analyzer.Env = Catalog.env(),
      quiet: Boolean = false): Map[String, String] =
    registry.toSeq.sortBy(_._1).flatMap { case (name, src) =>
      try {
        val info = Analyzer.analyzeQuery(env, Parser.parseQuery(src))
        if (!quiet)
          println(s"ok $name: " + info.row.map { case (n, t) =>
            s"$n ${t.show}" }.mkString(", "))
        None
      } catch {
        case e: SqlppError => Some(name -> e.msg)
      }
    }.toMap

  def main(args: Array[String]): Unit = {
    val failures = validate()
    failures.toSeq.sortBy(_._1).foreach { case (n, msg) =>
      System.err.println(s"FAIL $n: $msg")
    }
    if (failures.nonEmpty) sys.exit(1)
    println(s"${registry.size} static queries validated")
  }
}
