package graft.frontend

/** sqlpp dialect types and AST.
  *
  * Semantics follow the reference (andreypopp/sqlpp) surface syntax and
  * type system: reference syntax.ml:50-251 (types, nullability lattice,
  * AST forms). This is a fresh Scala design: no positions are tracked
  * (errors carry names, not spans) and structural case-class equality
  * replaces the reference's hash-consed Eq_class nodes.
  */
object Syntax {

  /** Analysis error (reference report.ml). */
  final case class SqlppError(msg: String) extends RuntimeException(msg)
  def fail(msg: String): Nothing = throw SqlppError(msg)

  // ---------------- types ----------------

  /** Core (non-null-qualified) type: a named atom or a union
    * (reference syntax.ml:74-89).
    */
  sealed trait TyCore {
    def show: String = this match {
      case TyName(n)                => n
      case TyOneOf(Some(label), _)  => label
      case TyOneOf(None, ns)        => ns.mkString(" | ")
    }
  }
  final case class TyName(name: String) extends TyCore
  final case class TyOneOf(label: Option[String], names: List[String])
      extends TyCore

  /** A type with nullability; bare types are nullable
    * (reference parser.mly:384-387).
    */
  final case class Ty(core: TyCore, nullable: Boolean) {
    def show: String = if (nullable) core.show else s"${core.show} NOT NULL"
    def asNullable: Ty = copy(nullable = true)
    def asNonNull: Ty = copy(nullable = false)
  }

  val BOOL: TyCore = TyName("BOOL")
  val STRING: TyCore = TyName("STRING")
  val INT: TyCore = TyName("INT")
  val FLOAT: TyCore = TyName("FLOAT")
  val DATETIME: TyCore = TyName("DATETIME")
  val DATE: TyCore = TyName("DATE")
  val TIME: TyCore = TyName("TIME")
  val INTERVAL: TyCore = TyName("INTERVAL")
  val NUMERIC: TyCore = TyOneOf(Some("NUMERIC"), List("INT", "FLOAT"))

  def nonNull(c: TyCore): Ty = Ty(c, nullable = false)
  def nullT(c: TyCore): Ty = Ty(c, nullable = true)

  /** Null-propagating nullability join (reference syntax.ml:58-64):
    * result takes b's core, null if either is null.
    */
  def nullableLub(aNullable: Boolean, b: Ty): Ty =
    b.copy(nullable = aNullable || b.nullable)

  /** Type least-upper-bound: union the cores (reference syntax.ml:103-115). */
  def tyLub(a: Ty, b: Ty): Ty = {
    val core = (a.core, b.core) match {
      case (TyName(x), TyName(y)) if x == y => b.core
      case (TyName(x), TyName(y))           => TyOneOf(None, List(x, y))
      case (TyName(x), TyOneOf(_, ys)) =>
        TyOneOf(None, if (ys.contains(x)) ys else x :: ys)
      case (TyOneOf(_, xs), TyName(y)) =>
        TyOneOf(None, if (xs.contains(y)) xs else xs :+ y)
      case (TyOneOf(la, xs), TyOneOf(lb, ys)) =>
        // keep the label on a no-op union (lub idempotence on NUMERIC)
        if (xs == ys && la == lb) b.core
        else TyOneOf(None, xs ++ ys.filterNot(xs.contains))
    }
    Ty(core, a.nullable || b.nullable)
  }

  /** Type greatest-lower-bound: intersect cores; error on disjoint
    * (reference syntax.ml:117-135). Non-null wins on nullability.
    */
  def tyGlb(a: Ty, b: Ty): Ty = {
    def noMatch(): Nothing =
      fail(s"types do not match ${a.show} and ${b.show}")
    val core = (a.core, b.core) match {
      case (TyName(x), TyName(y)) if x == y => b.core
      case (TyName(_), TyName(_))           => noMatch()
      case (TyName(x), TyOneOf(_, ys)) =>
        if (!ys.contains(x)) noMatch() else a.core
      case (TyOneOf(_, xs), TyName(y)) =>
        if (!xs.contains(y)) noMatch() else b.core
      case (TyOneOf(la, xs), TyOneOf(lb, ys)) =>
        xs.filter(ys.contains) match {
          case Nil      => noMatch()
          case t :: Nil => TyName(t)
          // keep the label when the intersection is the same union
          // (makes glb idempotent on labeled unions like NUMERIC)
          case ts if ts == ys && la == lb => b.core
          case ts       => TyOneOf(None, ts)
        }
    }
    Ty(core, a.nullable && b.nullable)
  }

  /** Subsumption check: ty usable where sup expected; returns ty
    * (reference analyze.ml:58-75). Errors otherwise.
    */
  def subsumes(ty: Ty, sup: Ty): Ty = {
    def unexpected(): Nothing =
      fail(s"expected ${sup.show} but got ${ty.show}")
    if (ty.nullable && !sup.nullable) unexpected()
    val ok = (ty.core, sup.core) match {
      case (TyName(t), TyName(s))        => t == s
      case (TyName(t), TyOneOf(_, ss))   => ss.contains(t)
      case (TyOneOf(_, _), TyName(_))    => false
      case (TyOneOf(_, ts), TyOneOf(_, ss)) => ts.forall(ss.contains)
    }
    if (!ok) unexpected()
    ty
  }

  // ---------------- scope types (fieldset args) ----------------

  sealed trait Sty
  final case class StyName(name: String) extends Sty
  final case class StyStruct(elems: List[(String, StyElem)]) extends Sty
  sealed trait StyElem
  final case class StyElemTy(ty: Ty) extends StyElem
  final case class StyElemScope(sty: Sty) extends StyElem

  // ---------------- literals & expressions ----------------

  sealed trait Lit
  final case class LitInt(v: Long) extends Lit
  final case class LitString(v: String) extends Lit
  final case class LitBool(v: Boolean) extends Lit
  /** Deliberate extension: the reference grammar has no float literals
    * (reference lexer.ml:183-184 lexes integers only); we accept
    * `12.5` as FLOAT NOT NULL.
    */
  final case class LitFloat(v: Double) extends Lit

  sealed trait TyOrExpr
  final case class TyVal(ty: Ty) extends TyOrExpr
  final case class TyExpr(ty: Ty) extends TyOrExpr

  sealed trait Expr
  final case class EApp(func: String, args: List[Expr]) extends Expr
  final case class ELit(lit: Lit) extends Expr
  final case class EName(name: String) extends Expr
  final case class ENav(scope: String, expr: Expr) extends Expr
  final case class EIn(exprs: List[Expr], select: Select) extends Expr
  final case class EExists(select: Select) extends Expr
  final case class EAscribe(expr: Expr, ty: TyOrExpr) extends Expr
  final case class EParam(name: String) extends Expr
  final case class EMatch(param: String, cases: List[MatchCase]) extends Expr
  case object ENull extends Expr

  final case class MatchCase(tag: String, args: List[String], body: Expr)

  /** Innermost name of a nav chain, used for auto-naming projections
    * (reference syntax.ml:367-371).
    */
  def fieldNameOf(e: Expr): Option[String] = e match {
    case EName(n)    => Some(n)
    case ENav(_, e2) => fieldNameOf(e2)
    case _           => None
  }

  def exprToString(e: Expr): String = e match {
    case EApp(f, List(x)) if f == "-" || f == "NOT" =>
      s"$f ${exprToString(x)}"
    case EApp(f, List(x)) if f == "IS NULL" || f == "IS NOT NULL" =>
      s"${exprToString(x)} $f"
    case EApp(f, List(x, y))
        if Set("+", "-", "*", "/", "=", "!=", ">", "<", ">=", "<=", "AND",
          "OR").contains(f) =>
      s"${exprToString(x)} $f ${exprToString(y)}"
    case EApp(f, args)  => s"$f(${args.map(exprToString).mkString(", ")})"
    case ELit(LitInt(v))    => v.toString
    case ELit(LitFloat(v))  => v.toString
    case ELit(LitString(v)) => s"'$v'"
    case ELit(LitBool(v))   => v.toString.toUpperCase
    case EName(n)           => n
    case ENav(s, e2)        => s"$s.${exprToString(e2)}"
    case EIn(es, _)   => s"(${es.map(exprToString).mkString(", ")}) IN (...)"
    case EExists(_)   => "EXISTS (...)"
    case EAscribe(e2, TyVal(t))  => s"${exprToString(e2)}: ${t.show}"
    case EAscribe(e2, TyExpr(t)) => s"${exprToString(e2)}: ${t.show} expr"
    case EParam(n)    => s"?$n"
    case EMatch(p, _) => s"MATCH ?$p WITH ... END"
    case ENull        => "NULL"
  }

  // ---------------- select & DML ----------------

  sealed trait SelectField
  final case class FieldE(name: Option[String], expr: Expr, isUsed: Boolean)
      extends SelectField
  final case class FieldWithScope(path: List[String], name: String)
      extends SelectField
  final case class FieldFieldset(name: String, args: List[List[String]],
      isUsed: Boolean) extends SelectField

  sealed trait Dir
  case object Asc extends Dir
  case object Desc extends Dir

  sealed trait JoinKind
  case object JoinInner extends JoinKind
  case object JoinLeft extends JoinKind
  /** `LEFT OPTIONAL JOIN` — the reference README's "(todo) optional
    * joins" heading (README.md:193, a bare heading with no content or
    * implementation in the reference; semantics defined here): the
    * author asserts the join is row-preserving (left rows are never
    * duplicated — in practice, the ON condition hits a unique key of
    * the right side), so when NOTHING outside the join's own ON
    * condition uses the right scope, the join is eliminated at
    * lowering and the right source is never scanned. This is the
    * join-elimination contract BI dialects build on LEFT JOIN +
    * uniqueness; making it author-asserted keeps analysis local.
    *
    * `condDeps` is analyzer output (empty when freshly parsed): the
    * ON condition's field dependencies, recorded WITHOUT marking them
    * used — the analyzer defers those marks so "is the right scope
    * used" means "used by anything except the ON condition itself".
    * When the join survives, lowering applies the deferred marks so
    * scan pruning still sees the join keys.
    *
    * Conservative edges (all spec-pinned in PlanSpec): an eager
    * (non-WITH) projection field referencing the right side keeps the
    * join even if no outer query reads the field (eager projection IS
    * demand); a subselect right side keeps the join unless ALL its
    * fields are lazy `WITH` fields (a plain subselect projection is
    * born used); a kept join whose ON references another optional
    * join's right scope resurrects that join too (outer joins decide
    * first, so the deferred-mark replay cascades inward).
    */
  final case class JoinLeftOpt(
      condDeps: List[(Option[String], String)] = Nil) extends JoinKind

  sealed trait FromOne
  final case class FromTable(table: String, alias: Option[String])
      extends FromOne
  final case class FromSelect(select: Select, alias: String) extends FromOne

  sealed trait From
  final case class FromSingle(one: FromOne) extends From
  final case class FromJoin(left: From, right: FromOne, kind: JoinKind,
      cond: Expr) extends From

  final case class Select(
      proj: List[SelectField],
      from: Option[From],
      where: Option[Expr],
      groupBy: Option[List[Expr]],
      having: Option[Expr],
      orderBy: Option[List[(Expr, Dir)]],
      limit: Option[Expr],
      offset: Option[Expr],
      isOpen: Boolean,
      /** `:- STY` scope/row ascription (reference README.md:103-186 —
        * documented there but never implemented in the reference; an
        * analysis-time assertion with no runtime effect).
        */
      ascription: Option[Sty] = None)

  sealed trait InsertFrom
  final case class InsertValues(rows: List[List[Expr]]) extends InsertFrom
  final case class InsertSelect(select: Select) extends InsertFrom

  sealed trait OnConflict
  case object ConflictIgnore extends OnConflict
  case object ConflictReplace extends OnConflict
  /** `ON CONFLICT UPDATE SET col = expr, ...` — partial-column upsert
    * (the standard-SQL `DO UPDATE` the reference's own backend
    * printer targets, surfaced in the dialect; sqlpp only exposes
    * IGNORE/REPLACE, printer.ml:289-290). SET expressions see the
    * existing row as `<table>.<col>` and the incoming row as
    * `excluded.<col>`. Because both carry every table column, an
    * unqualified column name is ambiguous and must be qualified —
    * the dialect's uniform ambiguity rule, a documented divergence
    * from PostgreSQL's bind-unqualified-to-existing convention.
    */
  final case class ConflictUpdate(set: List[(String, Expr)])
    extends OnConflict

  final case class Insert(
      table: String,
      columns: List[String],
      from: InsertFrom,
      onConflict: Option[OnConflict],
      returning: List[SelectField])

  final case class Update(
      table: String,
      set: List[(String, Expr)],
      from: Option[From],
      where: Option[Expr],
      returning: List[SelectField])

  final case class Delete(
      table: String,
      where: Option[Expr],
      returning: List[SelectField])

  sealed trait Query
  final case class QSelect(select: Select) extends Query
  final case class QInsert(insert: Insert) extends Query
  final case class QUpdate(update: Update) extends Query
  final case class QDelete(delete: Delete) extends Query

  // ---------------- declarations ----------------

  final case class Fieldset(
      args: List[(String, Sty)],
      exprs: List[(String, Expr)])

  /** Table column DDL (reference ddl.ml:19-26): nullability lives in ty;
    * primaryKey/autoincrement/default feed the INSERT missing-column
    * check (reference analyze.ml:882-894) and DML key matching.
    */
  final case class ColumnDef(
      name: String,
      ty: Ty,
      primaryKey: Boolean = false,
      autoincrement: Boolean = false,
      default: Option[Expr] = None)

  sealed trait Decl
  final case class DeclTable(name: String, cols: List[ColumnDef])
      extends Decl
  final case class DeclQuery(name: String, query: Query) extends Decl
  final case class DeclFieldset(name: String, fieldset: Fieldset) extends Decl
}
