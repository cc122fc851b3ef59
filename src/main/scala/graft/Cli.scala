package graft

import org.apache.spark.sql.SparkSession
import graft.frontend.{Analyzer, Parser, Printer}

/** Manage CLI, mirroring the reference's verbs
  * (reference sqlpp_manage.ml:219-334):
  *
  *   query <sql>     run a query, print JSON rows (sqlpp-query)
  *   analyze <sql>   print the elaborated query + row/param types
  *                   (sqlpp-analyze)
  *   fmt <sql>       parse and pretty-print (sqlpp-fmt)
  *   plan <sql>      print the optimized Spark physical plan — the
  *                   backend artifact, standing in for sqlpp-sql
  *   tables          list declared tables
  *
  * Usage: runMain graft.Cli <verb> <sql...> [-sf <dir>]
  */
object Cli {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(2) }
    val sfIdx = args.indexOf("-sf")
    val sfDir = if (sfIdx >= 0 && sfIdx + 1 < args.length) args(sfIdx + 1)
      else "/root/testdata/sf0.001"
    val rest = if (sfIdx >= 0)
      args.patch(sfIdx, Nil, 2) else args
    val verb = rest(0)
    val sql = rest.drop(1).mkString(" ")

    verb match {
      case "fmt" =>
        println(Printer.query(Parser.parseQuery(sql)))
      case "analyze" =>
        val env = Catalog.env()
        val info = Analyzer.analyzeQuery(env, Parser.parseQuery(sql))
        println(Printer.elaboratedQuery(env, info))
        println("-- row: " + info.row.map { case (n, t) =>
          s"$n ${t.show}" }.mkString(", "))
        if (info.params.nonEmpty)
          println("-- params: " + info.params.map { case (n, p) =>
            s"?$n: $p" }.mkString(", "))
      case "query" | "plan" =>
        val spark = SparkSession.builder()
          .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        try {
          val df = Catalog.engine(spark, sfDir).sql(sql)
          if (verb == "plan") df.explain("formatted")
          else df.toJSON.collect().foreach(println)
        } finally spark.stop()
      case "tables" =>
        Catalog.env().decls.foreach {
          case (n, Analyzer.TEnv(_, ddl)) =>
            println(s"$n(${ddl.cols.map(c =>
              s"${c.name} ${c.ty.show.toLowerCase}").mkString(", ")})")
          case (n, _) => println(n)
        }
      case other =>
        System.err.println(s"unknown verb: $other"); usage(); sys.exit(2)
    }
  }

  private def usage(): Unit =
    System.err.println(
      "usage: graft.Cli <query|analyze|fmt|plan|tables> <sql...> [-sf dir]")
}
