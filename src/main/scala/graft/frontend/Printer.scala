package graft.frontend

import Syntax._
import Analyzer._

/** Dialect pretty-printer (the `sqlpp-fmt` / `sqlpp-analyze` surface
  * of the reference manage CLI, sqlpp_manage.ml:275-300): prints
  * surface or elaborated queries back as dialect text, re-inserting
  * parentheses from the same precedence table the parser uses
  * (reference printer.ml:107-128, syntax.ml:373-386).
  */
object Printer {

  private def prec(op: String): Int = op match {
    case "OR" => 10
    case "AND" => 20
    case "NOT" => 30
    case "=" | "!=" => 40
    case ">" | "<" | ">=" | "<=" => 50
    case "+" | "-" => 60
    case "*" | "/" => 70
    case _ => 100
  }

  private val binops =
    Set("OR", "AND", "=", "!=", ">", "<", ">=", "<=", "+", "-", "*", "/")

  def expr(e: Expr): String = expr(e, 0)

  private def expr(e: Expr, outer: Int): String = e match {
    case EApp(op, List(x, y)) if binops(op) =>
      val p = prec(op)
      val s = s"${expr(x, p)} $op ${expr(y, p + 1)}"
      if (p < outer) s"($s)" else s
    case EApp("NOT", List(x)) =>
      val s = s"NOT ${expr(x, 30)}"
      if (30 < outer) s"($s)" else s
    case EApp("-", List(x)) =>
      val inner = expr(x, 90)
      // "--" would lex as a line comment
      if (inner.startsWith("-")) s"- $inner" else s"-$inner"
    case EApp(op @ ("IS NULL" | "IS NOT NULL"), List(x)) =>
      val s = s"${expr(x, 41)} $op"
      if (40 < outer) s"($s)" else s
    case EApp(f, args) => s"$f(${args.map(expr(_, 0)).mkString(", ")})"
    case ELit(LitInt(v)) => v.toString
    case ELit(LitFloat(v)) => v.toString
    case ELit(LitString(v)) => "'" + v.replace("'", "\\'") + "'"
    case ELit(LitBool(v)) => if (v) "true" else "false"
    case EName(n) => n
    case ENav(s, e2) =>
      // the grammar admits only simple forms after '.', anything else
      // must ride in parens (which parseSimpleAfterDot accepts)
      val simple = e2 match {
        case EName(_) | ENav(_, _) | EParam(_) | EExists(_) |
            EMatch(_, _) => true
        case EApp(f, _) => f.headOption.exists(c =>
          c.isLetter || c == '_')
        case _ => false
      }
      if (simple) s"$s.${expr(e2, 100)}"
      else s"$s.(${expr(e2, 0)})"
    case EIn(List(x), sel) => s"${expr(x, 56)} IN (${select(sel)})"
    case EIn(es, sel) =>
      s"(${es.map(expr(_, 0)).mkString(", ")}) IN (${select(sel)})"
    case EExists(sel) => s"EXISTS (${select(sel)})"
    case EAscribe(e2, TyVal(t)) =>
      val s = s"${expr(e2, 81)}: ${t.show.toLowerCase}"
      if (80 < outer) s"($s)" else s
    case EAscribe(e2, TyExpr(t)) =>
      val s = s"${expr(e2, 81)}: ${t.show.toLowerCase} expr"
      if (80 < outer) s"($s)" else s
    case EParam(n) => s"?$n"
    case EMatch(p, cases) =>
      val cs = cases.map { c =>
        val args = c.args match {
          case Nil => ""
          case List(a) => s" ?$a"
          case as => as.map("?" + _).mkString("(", ", ", ")")
        }
        s"| ${c.tag}$args -> ${expr(c.body, 0)}"
      }
      s"MATCH ?$p WITH ${cs.mkString(" ")} END"
    case ENull => "NULL"
  }

  def field(f: SelectField): String = f match {
    case FieldE(None, e, true) => expr(e)
    case FieldE(Some(n), e, true) => s"${expr(e)} AS $n"
    case FieldE(None, e, false) => s"WITH ${expr(e)}"
    case FieldE(Some(n), e, false) => s"WITH ${expr(e)} AS $n"
    case FieldWithScope(path, n) =>
      s"WITHSCOPE ${path.mkString(".")} AS $n"
    case FieldFieldset(n, args, used) =>
      val a = if (args.isEmpty) ""
        else args.map(_.mkString(".")).mkString("(", ", ", ")")
      val splice = s"...$n$a"
      if (used) splice else s"WITH $splice"
  }

  def fromOne(f: FromOne): String = f match {
    case FromTable(t, None) => t
    case FromTable(t, Some(a)) => s"$t AS $a"
    case FromSelect(sel, a) => s"(${select(sel)}) AS $a"
  }

  def from(f: From): String = f match {
    case FromSingle(one) => fromOne(one)
    case FromJoin(l, r, k, cond) =>
      val kw = k match {
        case JoinInner      => "JOIN"
        case JoinLeft       => "LEFT JOIN"
        case JoinLeftOpt(_) => "LEFT OPTIONAL JOIN"
      }
      s"${from(l)} $kw ${fromOne(r)} ON ${expr(cond)}"
  }

  /** Print a surface select (all projection fields as written). */
  def select(s: Select): String = {
    val parts = List.newBuilder[String]
    val proj = s.proj.map(field) ++ (if (s.isOpen) List("...") else Nil)
    parts += s"SELECT ${proj.mkString(", ")}"
    s.from.foreach(f => parts += s"FROM ${from(f)}")
    s.where.foreach(w => parts += s"WHERE ${expr(w)}")
    s.groupBy.foreach {
      case Nil => parts += "GROUP BY ()"
      case gs  => parts += s"GROUP BY ${gs.map(expr).mkString(", ")}"
    }
    s.having.foreach(h => parts += s"HAVING ${expr(h)}")
    s.orderBy.foreach { obs =>
      parts += "ORDER BY " + obs.map {
        case (e, Asc)  => s"${expr(e)} ASC"
        case (e, Desc) => s"${expr(e)} DESC"
      }.mkString(", ")
    }
    s.limit.foreach(l => parts += s"LIMIT ${expr(l)}")
    s.offset.foreach(o => parts += s"OFFSET ${expr(o)}")
    s.ascription.foreach(a => parts += s":- ${sty(a)}")
    parts.result().mkString(" ")
  }

  def sty(s: Sty): String = s match {
    case StyName(n) => n
    case StyStruct(elems) =>
      elems.map {
        case (n, StyElemTy(t)) => s"$n ${t.show}"
        case (n, StyElemScope(StyName(m))) if m == n => s"FROM $m"
        case (n, StyElemScope(inner)) => s"FROM ${sty(inner)} AS $n"
      }.mkString("(", ", ", ")")
  }

  def query(q: Query): String = q match {
    case QSelect(s) => select(s)
    case QInsert(i) =>
      val sb = new StringBuilder(s"INSERT INTO ${i.table}")
      sb ++= i.columns.mkString("(", ", ", ")")
      i.from match {
        case InsertValues(rows) =>
          sb ++= " VALUES "
          sb ++= rows.map(_.map(expr).mkString("(", ", ", ")"))
            .mkString(", ")
        case InsertSelect(s) => sb ++= s" ${select(s)}"
      }
      i.onConflict.foreach {
        case ConflictIgnore  => sb ++= " ON CONFLICT IGNORE"
        case ConflictReplace => sb ++= " ON CONFLICT REPLACE"
        case ConflictUpdate(set) =>
          sb ++= " ON CONFLICT UPDATE SET "
          sb ++= set.map { case (n, e) => s"$n = ${expr(e)}" }
            .mkString(", ")
      }
      if (i.returning.nonEmpty)
        sb ++= s" RETURNING ${i.returning.map(field).mkString(", ")}"
      sb.result()
    case QUpdate(u) =>
      val sb = new StringBuilder(s"UPDATE ${u.table} SET ")
      sb ++= u.set.map { case (n, e) => s"$n = ${expr(e)}" }.mkString(", ")
      u.from.foreach(f => sb ++= s" FROM ${from(f)}")
      u.where.foreach(w => sb ++= s" WHERE ${expr(w)}")
      if (u.returning.nonEmpty)
        sb ++= s" RETURNING ${u.returning.map(field).mkString(", ")}"
      sb.result()
    case QDelete(d) =>
      val sb = new StringBuilder(s"DELETE FROM ${d.table}")
      d.where.foreach(w => sb ++= s" WHERE ${expr(w)}")
      if (d.returning.nonEmpty)
        sb ++= s" RETURNING ${d.returning.map(field).mkString(", ")}"
      sb.result()
  }

  /** Print an ELABORATED select showing what will actually execute:
    * the emission columns (used projection + generated-and-used scope
    * fields), the reference `sqlpp-analyze` view (printer.ml:180-194).
    */
  def elaborated(env: Env, scope: Scope, s: Select): String = {
    val parts = List.newBuilder[String]
    val cols = emission(scope, s.proj).map { case (n, e) =>
      s"${expr(e)} AS $n"
    }
    parts += s"SELECT ${cols.mkString(", ")}"
    s.from.foreach(f => parts += s"FROM ${fromElaborated(env, scope, f)}")
    s.where.foreach(w => parts += s"WHERE ${expr(w)}")
    s.groupBy.foreach {
      case Nil => parts += "GROUP BY ()"
      case gs  => parts += s"GROUP BY ${gs.map(expr).mkString(", ")}"
    }
    s.having.foreach(h => parts += s"HAVING ${expr(h)}")
    s.orderBy.foreach { obs =>
      parts += "ORDER BY " + obs.map {
        case (e, Asc)  => s"${expr(e)} ASC"
        case (e, Desc) => s"${expr(e)} DESC"
      }.mkString(", ")
    }
    s.limit.foreach(l => parts += s"LIMIT ${expr(l)}")
    s.offset.foreach(o => parts += s"OFFSET ${expr(o)}")
    parts.result().mkString(" ")
  }

  private def fromElaborated(env: Env, scope: Scope, f: From): String =
    f match {
      case FromSingle(one) => fromOneElaborated(env, scope, one)
      case FromJoin(l, r, k, cond) =>
        val kw = k match {
          case JoinInner      => "INNER JOIN"
          case JoinLeft       => "LEFT JOIN"
          case JoinLeftOpt(_) => "LEFT OPTIONAL JOIN"
        }
        s"${fromElaborated(env, scope, l)} $kw ${fromOneElaborated(env, scope, r)} ON ${expr(cond)}"
    }

  private def fromOneElaborated(env: Env, scope: Scope,
      one: FromOne): String = one match {
    case FromTable(t, None) => t
    case FromTable(t, Some(a)) => s"$t AS $a"
    case FromSelect(sel, a) =>
      val sub = Scope.subscope(scope, a).getOrElse(
        fail(s"no scope for $a"))
      s"(${elaborated(env, sub, sel)}) AS $a"
  }

  def elaboratedQuery(env: Env, info: QueryInfo): String = info.query match {
    case QSelect(s) => elaborated(env, info.scope, s)
    case other      => query(other)
  }
}
