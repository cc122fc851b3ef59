package graft

import graft.frontend.{Migrate, Syntax}

/** The todo-app migration chain, shaped after the reference's sqlite
  * example app (reference test/sqlpp_sqlite/test.t:1-44, db.ml): the
  * registered migration set the manage CLI operates on, and the
  * fixture ManagedSpec drives its CRUD transcript against.
  */
object TodoApp {

  val migrations: List[Migrate.Migration] = List(
    Migrate.Migration("create todos", List(
      Migrate.CreateTable(
        """create table todos (
          |  id int not null primary key autoincrement,
          |  text string,
          |  created float not null,
          |  done bool not null)""".stripMargin))),
    Migrate.Migration("todos: done -> completed", List(
      Migrate.RenameColumn("todos", "done", "completed"))),
    Migrate.Migration("todos: text null -> text not null", List(
      Migrate.RenameColumn("todos", "text", "text_prev"),
      Migrate.AddColumn("todos", Syntax.ColumnDef("text",
        Syntax.nonNull(Syntax.STRING))),
      Migrate.RunDml("update todos set text = coalesce(text_prev, '')"),
      Migrate.DropColumn("todos", "text_prev"))),
    Migrate.Migration("create projects", List(
      Migrate.CreateTable(
        """create table projects (
          |  name string not null primary key,
          |  created float not null)""".stripMargin),
      Migrate.RunDml("insert into projects set name = 'default', created = 0.0"),
      Migrate.AddColumn("todos", Syntax.ColumnDef("project",
        Syntax.nonNull(Syntax.STRING),
        default = Some(Syntax.ELit(Syntax.LitString("default"))))))))
}
