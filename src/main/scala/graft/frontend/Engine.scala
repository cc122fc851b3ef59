package graft.frontend

import org.apache.spark.sql.{DataFrame, SparkSession, Dataset, Encoder}

import Syntax._
import Analyzer._

/** Public query API: parse once, analyze once, bind params per call,
  * lower to a Spark DataFrame.
  *
  * Plays the role of the reference's two embedding surfaces: the typed
  * PPX (reference sqlpp_ppx.ml:406-458 — here `fetchList[T]` over a
  * product encoder) and the dynamic API (reference sqlpp.ml:372-402 —
  * here `sql`/`execJson`).
  */
final class Engine(
    val spark: SparkSession,
    val env: Env,
    val load: String => DataFrame) {

  def prepare(src: String): Prepared =
    Prepared(this, analyzeQuery(env, Parser.parseQuery(src)))

  /** Dynamic API: analyze + bind + lower in one call. */
  def sql(src: String, params: Map[String, Any] = Map.empty): DataFrame =
    prepare(src).bind(params)

  /** Typed API: rows decoded to a case class via its product encoder
    * (Option fields ⇔ nullable columns, mirroring the reference's
    * 'a option convention, sqlpp_ppx.ml:260-271).
    */
  /** Typed API returning a distributed Dataset (no collect). */
  def fetch[T: Encoder](src: String,
      params: Map[String, Any] = Map.empty): Dataset[T] =
    prepare(src).bind(params).as[T]

  def fetchList[T: Encoder](src: String,
      params: Map[String, Any] = Map.empty): List[T] =
    fetch[T](src, params).collect().toList

  /** Typed streaming fold: step the result row-at-a-time without ever
    * materializing it driver-side — the reference's core runtime
    * contract (`let fold ~init ~f db q`, reference sqlpp/sqlpp.ml:332;
    * row-by-row stepping sqlpp_sqlite.ml:142-155). `toLocalIterator`
    * pulls result partitions back one at a time, so peak driver
    * memory is one partition, not the result set — a fold over a
    * huge typed result streams where `fetchList` would OOM.
    */
  def fold[T: Encoder, A](src: String,
      params: Map[String, Any] = Map.empty)(init: A)(f: (A, T) => A): A = {
    val it = fetch[T](src, params).toLocalIterator()
    var acc = init
    while (it.hasNext) acc = f(acc, it.next())
    acc
  }

  def fetchOption[T: Encoder](src: String,
      params: Map[String, Any] = Map.empty): Option[T] =
    prepare(src).bind(params).as[T].take(2).toList match {
      case Nil      => None
      case x :: Nil => Some(x)
      case _        => fail("fetchOption: more than one row returned")
    }

  /** Dynamic JSON result (reference Dynamic.exec → json rows). */
  def execJson(src: String,
      params: Map[String, Any] = Map.empty): List[String] =
    sql(src, params).toJSON.collect().toList
}

object Engine {
  /** Variant param value for MATCH ?p WITH ... END queries. */
  final case class Variant(tag: String, args: Any*)
  /** Expression-typed param value: a dialect expression string parsed
    * and analyzed at bind time in the recorded scope
    * (reference sqlpp.ml:360-367).
    */
  final case class ExprParam(src: String)
}

final case class Prepared(engine: Engine, info: QueryInfo) {

  def row: List[(String, Ty)] = info.row
  def paramTypes: Map[String, Pty] = info.params

  /** Bind params and produce the DataFrame. Structure-affecting params
    * (MATCH variants, expr-typed) are resolved here; scalar params
    * lower to typed literals during compilation.
    */
  def bind(params: Map[String, Any] = Map.empty): DataFrame = {
    Binder.validate(info, params)
    val (query2, params2) = Binder.resolve(engine.env, info, params)
    info.query match {
      case QSelect(_) =>
        val QSelect(sel) = query2: @unchecked
        Lowering.lowerQuery(engine.spark, engine.env,
          info.copy(query = QSelect(sel)), engine.load, params2)
      case _ =>
        fail("DML execution requires a ManagedCatalog; use Engine.exec")
    }
  }
}

/** Bind-time resolution of structure-affecting params. */
object Binder {

  /** Up-front check that every inferred param has a shape-compatible
    * value, so callers get one clear error instead of a deep lowering
    * failure (the typed-API analogue of the reference PPX's
    * labelled-argument signature, sqlpp_ppx.ml:406-458).
    */
  def validate(info: QueryInfo, params: Map[String, Any]): Unit = {
    def tyOk(ty: Ty, v: Any): Boolean = (ty.core, v) match {
      case (_, None)               => ty.nullable
      case (_, Some(x))            => tyOk(ty.asNonNull, x)
      case (TyName("INT"), _: Int | _: Long)      => true
      case (TyName("FLOAT"), _: Double | _: Float) => true
      case (TyName("STRING"), _: String)           => true
      case (TyName("BOOL"), _: Boolean)            => true
      case (TyName("DATETIME"), _: java.sql.Timestamp) => true
      case (TyName("DATE"), _: java.sql.Date)          => true
      case (TyOneOf(_, ns), _) =>
        ns.exists(n => tyOk(Ty(TyName(n), ty.nullable), v))
      case _ => false
    }
    info.params.foreach { case (name, pty) =>
      params.get(name) match {
        case None => fail(s"missing value for param ?$name")
        case Some(v) => (pty, v) match {
          case (PtyTy(ty), value) =>
            if (!tyOk(ty, value))
              fail(s"param ?$name expects ${ty.show} but got " +
                s"${value.getClass.getSimpleName}")
          case (PtyVariant(cases), Engine.Variant(tag, args @ _*)) =>
            cases.find(_._1 == tag) match {
              case None =>
                fail(s"param ?$name: no MATCH case for tag `$tag` " +
                  s"(expected one of ${cases.map(_._1).mkString(", ")})")
              case Some((_, argTys)) =>
                if (argTys.length != args.length)
                  fail(s"param ?$name tag `$tag` expects ${argTys.length} args but got ${args.length}")
            }
          case (PtyVariant(_), other) =>
            fail(s"param ?$name is a variant param; pass Engine.Variant, got ${other.getClass.getSimpleName}")
          case (PtyExpr(_, _), Engine.ExprParam(_)) => ()
          case (PtyExpr(_, _), other) =>
            fail(s"param ?$name is expression-typed; pass Engine.ExprParam, got ${other.getClass.getSimpleName}")
          case (PtyUnknown, _) => ()
        }
      }
    }
  }

  def resolve(env: Env, info: QueryInfo,
      params: Map[String, Any]): (Query, Map[String, Any]) = {
    var extended = params
    def rewrite(e: Expr): Expr = e match {
      case EMatch(p, cases) =>
        params.get(p) match {
          case Some(Engine.Variant(tag, args @ _*)) =>
            val c = cases.find(_.tag == tag).getOrElse(
              fail(s"param ?$p: no MATCH case for tag `$tag`"))
            if (c.args.length != args.length)
              fail(s"param ?$p tag `$tag` expects ${c.args.length} args but got ${args.length}")
            extended = extended ++ c.args.zip(args)
            rewrite(c.body)
          case Some(other) =>
            fail(s"param ?$p is a variant param; pass Engine.Variant, got $other")
          case None => fail(s"missing value for param ?$p")
        }
      case EParam(name) =>
        (info.params.get(name), params.get(name)) match {
          case (Some(PtyExpr(ty, scope)), Some(Engine.ExprParam(src))) =>
            val parsed = Parser.parseExpr(src)
            analyzeExpr(env, scope, parsed, Some(ty))
          case (Some(PtyExpr(_, _)), Some(other)) =>
            fail(s"param ?$name is expression-typed; pass Engine.ExprParam, got $other")
          case _ => e
        }
      case EApp(f, args)     => EApp(f, args.map(rewrite))
      case EAscribe(x, t)    => EAscribe(rewrite(x), t)
      case ENav(n, x)        => ENav(n, rewrite(x))
      case EIn(es, s)        => EIn(es.map(rewrite), rewriteSelect(s))
      case EExists(s)        => EExists(rewriteSelect(s))
      case other             => other
    }
    def rewriteField(f: SelectField): SelectField = f match {
      case FieldE(n, e, u) => FieldE(n, rewrite(e), u)
      case other           => other
    }
    def rewriteSelect(s: Select): Select = {
      val s2 = s.copy(
        proj = s.proj.map(rewriteField),
        from = s.from.map(rewriteFrom),
        where = s.where.map(rewrite),
        groupBy = s.groupBy.map(_.map(rewrite)),
        having = s.having.map(rewrite),
        orderBy = s.orderBy.map(_.map { case (e, d) => (rewrite(e), d) }),
        limit = s.limit.map(rewrite),
        offset = s.offset.map(rewrite))
      // keep the recorded scope reachable from the rewritten node
      val sc = env.subSelectScopes.get(s)
      if (sc != null) env.subSelectScopes.put(s2, sc)
      s2
    }
    def rewriteFrom(f: From): From = f match {
      case FromSingle(o)            => FromSingle(rewriteFromOne(o))
      case FromJoin(l, r, k, c) =>
        FromJoin(rewriteFrom(l), rewriteFromOne(r), k, rewrite(c))
    }
    def rewriteFromOne(o: FromOne): FromOne = o match {
      case FromSelect(s, a) => FromSelect(rewriteSelectKeepScope(s, a), a)
      case t                => t
    }
    def rewriteSelectKeepScope(s: Select, alias: String): Select =
      rewriteSelect(s)

    val q2 = info.query match {
      case QSelect(sel) => QSelect(rewriteSelect(sel))
      case QInsert(i) => QInsert(i.copy(
        from = i.from match {
          case InsertValues(rows) => InsertValues(rows.map(_.map(rewrite)))
          case InsertSelect(s)    => InsertSelect(rewriteSelect(s))
        },
        returning = i.returning.map(rewriteField)))
      case QUpdate(u) => QUpdate(u.copy(
        set = u.set.map { case (n, e) => (n, rewrite(e)) },
        from = u.from.map(rewriteFrom),
        where = u.where.map(rewrite),
        returning = u.returning.map(rewriteField)))
      case QDelete(d) => QDelete(d.copy(
        where = d.where.map(rewrite),
        returning = d.returning.map(rewriteField)))
    }
    (q2, extended)
  }
}
