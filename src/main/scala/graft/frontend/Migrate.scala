package graft.frontend

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StructType, StructField, StringType}

import Syntax._
import Analyzer._

/** Schema migrations over a ManagedCatalog with a `_migrate` journal
  * table, mirroring the reference's manage layer
  * (reference sqlpp_manage.ml:40-131, ddl.ml:1-26): each migration is
  * a named list of DDL actions; `apply` runs the ones the journal
  * hasn't seen, evolving both the Env and the backing parquet.
  */
object Migrate {

  sealed trait Action
  final case class CreateTable(ddlSource: String) extends Action
  final case class DropTable(name: String) extends Action
  final case class RenameTable(from: String, to: String) extends Action
  final case class AddColumn(table: String, column: ColumnDef) extends Action
  final case class DropColumn(table: String, column: String) extends Action
  final case class RenameColumn(table: String, from: String, to: String)
      extends Action
  /** Run a DML statement as part of a migration (data backfill). */
  final case class RunDml(sql: String) extends Action

  final case class Migration(name: String, actions: List[Action])

  /** Human-readable DDL rendering of one migration action — what the
    * reference's `migrate-show` prints as SQL
    * (reference sqlpp_manage.ml:244-255, Migrate.to_sql).
    */
  def describe(a: Action): String = a match {
    case CreateTable(src)        => src.linesIterator.map(_.trim)
      .mkString(" ") + ";"
    case DropTable(name)         => s"DROP TABLE $name;"
    case RenameTable(from, to)   => s"ALTER TABLE $from RENAME TO $to;"
    case AddColumn(table, c) =>
      val dflt = c.default.map(e => s" DEFAULT (${Printer.expr(e)})")
        .getOrElse("")
      s"ALTER TABLE $table ADD COLUMN ${c.name} ${c.ty.show}$dflt;"
    case DropColumn(table, c)    => s"ALTER TABLE $table DROP COLUMN $c;"
    case RenameColumn(table, from, to) =>
      s"ALTER TABLE $table RENAME COLUMN $from TO $to;"
    case RunDml(sql)             => sql.linesIterator.map(_.trim)
      .mkString(" ") + ";"
  }

  def describe(m: Migration): String =
    m.actions.map(describe).mkString("\n")

  private val journalTable = "_migrate"
  private val journalSchema = StructType(List(
    StructField("name", StringType, nullable = false)))

  final class Runner(catalog: ManagedCatalog, engine: ManagedEngine) {
    private def spark = catalog.spark
    private def env = catalog.env

    def applied(): Set[String] = {
      val p = catalog.tablePath(journalTable)
      if (new org.apache.hadoop.fs.Path(p).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
          .exists(new org.apache.hadoop.fs.Path(p)))
        spark.read.parquet(p).collect().map(_.getString(0)).toSet
      else Set.empty
    }

    private def journal(name: String): Unit = {
      val row = spark.createDataFrame(
        java.util.List.of(Row(name)), journalSchema)
      val p = catalog.tablePath(journalTable)
      row.write.mode("append").parquet(p)
    }

    /** Apply all unapplied migrations in order. Returns the names
      * applied in this run.
      */
    def apply(migrations: List[Migration]): List[String] = {
      val done = applied()
      migrations.filterNot(m => done(m.name)).map { m =>
        m.actions.foreach(applyAction)
        journal(m.name)
        m.name
      }
    }

    private def applyAction(a: Action): Unit = a match {
      case CreateTable(src) =>
        val decls = Parser.parseDecls(src)
        decls.foreach {
          case t: DeclTable =>
            env.addDecl(t)
            catalog.overwrite(t.name, spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row], catalog.schemaOf(t.name)))
          case other => env.addDecl(other)
        }
      case DropTable(name) =>
        env.decls.remove(name)
        catalog.drop(name)
      case RenameTable(from, to) =>
        env.decls.remove(from).foreach {
          case TEnv(scope, ddl) =>
            env.decls.put(to, TEnv(scope, ddl.copy(name = to)))
          case other => env.decls.put(to, other)
        }
        catalog.rename(from, to)
      case AddColumn(table, column) =>
        val TEnv(_, ddl) = env.decls(table): @unchecked
        val ddl2 = ddl.copy(cols = ddl.cols :+ column)
        reDeclare(table, ddl2)
        if (catalog.exists(table)) {
          val df = spark.read.parquet(catalog.tablePath(table))
          val withCol = column.default match {
            case Some(e) => df.withColumn(column.name,
              Lowering.compile(Lowering.Ctx(spark, env, catalog.load _,
                Map.empty), e).cast(Lowering.toSparkType(column.ty)))
            case None => df.withColumn(column.name,
              lit(null).cast(Lowering.toSparkType(column.ty)))
          }
          catalog.overwrite(table, withCol)
        }
      case DropColumn(table, colName) =>
        val TEnv(_, ddl) = env.decls(table): @unchecked
        reDeclare(table, ddl.copy(cols = ddl.cols.filterNot(_.name == colName)))
        if (catalog.exists(table))
          catalog.overwrite(table,
            spark.read.parquet(catalog.tablePath(table)).drop(colName))
      case RenameColumn(table, from, to) =>
        val TEnv(_, ddl) = env.decls(table): @unchecked
        reDeclare(table, ddl.copy(cols = ddl.cols.map(c =>
          if (c.name == from) c.copy(name = to) else c)))
        if (catalog.exists(table))
          catalog.overwrite(table,
            spark.read.parquet(catalog.tablePath(table))
              .withColumnRenamed(from, to))
      case RunDml(sql) =>
        engine.exec(sql)
    }

    /** Rebuild the table's env entry (scope prototype + ddl). */
    private def reDeclare(table: String, ddl: DeclTable): Unit = {
      env.decls.remove(table)
      env.addDecl(ddl)
    }
  }
}
