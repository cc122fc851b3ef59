package graft.frontend

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, BooleanType, StringType,
  LongType, DoubleType, TimestampType, DateType, DayTimeIntervalType}

import Syntax._
import Analyzer._

/** Lowers an analyzed sqlpp query to a Spark `DataFrame` program.
  *
  * Plays the role the SQL printer plays in the reference
  * (reference printer.ml:167-248), but emits a Catalyst logical plan
  * instead of SQL text. Design:
  *
  *  - Within a SELECT, each FROM source with alias `a` contributes
  *    columns renamed to `a__col`, so elaborated navigations
  *    `ENav(a, EName(col))` compile to unambiguous column refs and
  *    self-joins need no deduplication tricks.
  *  - Scans are pruned to the analyzer's used-fields (the reference's
  *    dead-field elimination, analyze.ml:254-269, realized as column
  *    pruning at the source — on parquet this reaches the reader via
  *    Catalyst's ColumnPruning).
  *  - Aggregation compiles to `groupBy(...).agg(...)`; HAVING and
  *    ORDER BY expressions over aggregates become hidden agg columns
  *    that are filtered/sorted on and then dropped.
  *  - Uncorrelated IN subqueries in WHERE conjuncts lower to
  *    left-semi joins (NOT IN → null-aware left-anti, SQL 3VL); in
  *    other positions (under OR/NOT, projection, group keys, ORDER
  *    BY, HAVING, join ON, DML SET/RETURNING/VALUES) they become
  *    materialized flag columns fed by distinct left-outer joins —
  *    on the pre-aggregation frame where that frame is legal, on the
  *    post-aggregation frame for grouped HAVING/ORDER BY/projection
  *    positions, and on the probe-owning side for join ON conjuncts.
  *    Uncorrelated EXISTS in WHERE is a lazy broadcast gate join
  *    against its limit(1) subquery — no job runs until the caller
  *    executes the plan.
  */
object Lowering {

  /** Spark type for a dialect type (SURVEY §1.2 mapping). */
  def toSparkType(ty: Ty): DataType = ty.core match {
    case TyName("BOOL")     => BooleanType
    case TyName("STRING")   => StringType
    case TyName("INT")      => LongType
    case TyName("FLOAT")    => DoubleType
    case TyName("DATETIME") => TimestampType
    case TyName("DATE")     => DateType
    case TyName("TIME")     => LongType
    case TyName("INTERVAL") => DayTimeIntervalType()
    case _ => fail(s"type ${ty.show} must resolve to a concrete type")
  }

  final case class Ctx(
      spark: SparkSession,
      env: Env,
      load: String => DataFrame,
      params: Map[String, Any])

  private def ns(alias: String, colName: String): String =
    s"${alias}__$colName"

  // ---------------- expression compilation ----------------

  def compile(ctx: Ctx, e: Expr): Column = e match {
    case ENav(a, EName(f)) => col(ns(a, f))
    case EName(n)          => col(n)
    case ELit(LitInt(v))    => lit(v)
    case ELit(LitFloat(v))  => lit(v)
    case ELit(LitString(v)) => lit(v)
    case ELit(LitBool(v))   => lit(v)
    case ENull              => lit(null)
    case EAscribe(e2, TyVal(ty)) => e2 match {
      case ENull => lit(null).cast(toSparkType(ty))
      case _     => compile(ctx, e2)
    }
    case EAscribe(e2, _) => compile(ctx, e2)
    case EParam(name) => ctx.params.get(name) match {
      case Some(v) => litOf(v)
      case None    => fail(s"missing value for param ?$name")
    }
    case EMatch(_, _) =>
      fail("MATCH must be resolved at bind time before lowering")
    case EIn(_, _) =>
      // every position with a carrier frame rewrites INs to flag
      // columns before compile sees one: SELECT positions (projection,
      // WHERE, group keys, ORDER BY, HAVING — grouped queries defer
      // non-group-key subqueries to the post-aggregation frame), DML
      // WHERE / SET / RETURNING / non-constant VALUES, and join ON
      // conditions (each conjunct's flag lives on the side owning its
      // probes; probes spanning both sides go post-join for inner
      // joins). The only remaining island is a LEFT JOIN ON conjunct
      // probing both sides (no carrier frame — lowerFrom fails it with
      // a position-specific message), so this arm is a defensive
      // backstop
      fail("IN subquery is not supported in this position")
    case EExists(sel) =>
      // uncorrelated EXISTS as a lazy subquery expression — no job
      // runs at bind time in any position
      lowerTopSelect(ctx, sel).exists()
    case EApp(f, args) => compileApp(ctx, f, args)
  }

  private def litOf(v: Any): Column = v match {
    case None            => lit(null)
    case Some(x)         => litOf(x)
    case x: Int          => lit(x.toLong)
    case x               => lit(x)
  }

  private def compileApp(ctx: Ctx, f: String, args: List[Expr]): Column = {
    def a(i: Int): Column = compile(ctx, args(i))
    (f, args) match {
      case ("count", List(ELit(_)))   => count(lit(1))
      case ("count", _)               => count(a(0))
      case ("sum", _)                 => sum(a(0))
      case ("min", _)                 => min(a(0))
      case ("max", _)                 => max(a(0))
      case ("argMax", _)              => max_by(a(0), a(1))
      case ("=", _)                   => a(0) === a(1)
      case ("!=", _)                  => a(0) =!= a(1)
      case (">", _)                   => a(0) > a(1)
      case (">=", _)                  => a(0) >= a(1)
      case ("<", _)                   => a(0) < a(1)
      case ("<=", _)                  => a(0) <= a(1)
      case ("AND", _)                 => a(0) && a(1)
      case ("OR", _)                  => a(0) || a(1)
      case ("NOT", _)                 => !a(0)
      case ("-", List(_))             => negate(a(0))
      case ("+", _)                   => a(0) + a(1)
      case ("-", _)                   => a(0) - a(1)
      case ("*", _)                   => a(0) * a(1)
      case ("/", _)                   => a(0) / a(1)
      case ("nullif", _) =>
        when(a(0) === a(1), lit(null)).otherwise(a(0))
      case ("coalesce", _)            => coalesce(args.map(compile(ctx, _)): _*)
      case ("IS NULL", _)             => a(0).isNull
      case ("IS NOT NULL", _)         => a(0).isNotNull
      case ("now", _)                 => current_timestamp()
      case ("toString", _)            => a(0).cast(StringType)
      case ("datetime", List(ELit(LitString(d)))) =>
        lit(java.sql.Timestamp.valueOf(d.replace('T', ' ')))
      case ("datetime", _)            => a(0).cast(TimestampType)
      case ("date", List(ELit(LitString(d)))) =>
        lit(java.sql.Date.valueOf(d))
      case ("date", _)                => a(0).cast(DateType)
      case _ => fail(s"no such function $f")
    }
  }

  /** Aggregate function names — the analyzer's set, not a copy. */
  private def aggFuncNames: Set[String] = Analyzer.aggFuncs

  private[frontend] def containsSubquery(e: Expr): Boolean = e match {
    case EIn(_, _) | EExists(_) => true
    case EApp(_, args)    => args.exists(containsSubquery)
    case EAscribe(e2, _)  => containsSubquery(e2)
    case ENav(_, e2)      => containsSubquery(e2)
    case _                => false
  }

  // ---------------- FROM ----------------

  /** Lower a FROM tree; each source's columns arrive as `alias__col`. */
  private def lowerFrom(ctx: Ctx, scope: Scope, from: From): DataFrame =
    from match {
      case FromSingle(one) => lowerFromOne(ctx, scope, one)
      case FromJoin(left, right, JoinLeftOpt(condDeps), cond) =>
        // optional-join elimination (Syntax.JoinLeftOpt): the ON
        // condition's field uses were deferred at analysis, so ANY
        // used field in the right scope here means something besides
        // the condition needs the join. isUsed state is final by
        // lowering time (all composition/outer-query marking happened
        // during analysis), so the decision is sound for named-query
        // inlining and lazy WITH fields alike — the same guarantee
        // scan pruning relies on.
        val rname = aliasOf(right)
        val rsub = Scope.subscope(scope, rname).getOrElse(
          fail(s"lowerFrom: no scope for optional join $rname"))
        if (!rsub.fields.values.exists(_.isUsed)) lowerFrom(ctx, scope, left)
        else {
          // join survives: replay the deferred ON marks so the right
          // (and left) scans keep the join keys, then lower as a
          // plain LEFT JOIN
          condDeps.foreach { dep =>
            val (s2, f2) = Analyzer.resolveFieldDependency(scope, dep)
            Analyzer.markFieldUsedRec(s2, f2)
          }
          lowerFrom(ctx, scope, FromJoin(left, right, JoinLeft, cond))
        }
      case FromJoin(left, right, kind, cond) =>
        val l = lowerFrom(ctx, scope, left)
        val r = lowerFromOne(ctx, scope, right)
        val joinType = kind match {
          case JoinInner      => "inner"
          case JoinLeft       => "left_outer"
          case JoinLeftOpt(_) => "left_outer" // rewritten above; defensive
        }
        if (!containsSubquery(cond)) l.join(r, compile(ctx, cond), joinType)
        else {
          // IN/EXISTS conjuncts in ON: rewrite each to a flag column
          // on the side that owns its probe columns (an uncorrelated
          // EXISTS, probing nothing, goes on the right) — the flag is
          // then an ordinary boolean conjunct of the ON, so the
          // planner still sees the equi keys and LEFT JOIN matching
          // semantics are preserved. Only a conjunct probing BOTH
          // sides needs the joined frame: post-join filter for inner
          // joins; for left joins the matched pairs are computed the
          // same way on the inner pair frame, then left rows with no
          // surviving pair are restored null-extended (value-keyed
          // left-anti — duplicate left rows are indistinguishable and
          // match identically, so value equality is row identity here).
          var lf = l
          var rf = r
          val onConds = List.newBuilder[Column]
          val post = List.newBuilder[Expr]
          var (li, ri) = (0, 0)
          conjuncts(cond).foreach { c =>
            if (!containsSubquery(c)) onConds += compile(ctx, c)
            else {
              val refs = exprColumns(c)
              if (refs.subsetOf(rf.columns.toSet)) {
                val (df2, cc) = predicateWithSubqueries(ctx, rf, c,
                  s"__in_flag_r${ri}_")
                ri += 1
                rf = df2
                onConds += coalesce(cc, lit(false))
              } else if (refs.subsetOf(lf.columns.toSet)) {
                val (df2, cc) = predicateWithSubqueries(ctx, lf, c,
                  s"__in_flag_l${li}_")
                li += 1
                lf = df2
                onConds += coalesce(cc, lit(false))
              } else post += c
            }
          }
          val postConjs = post.result()
          val onCond =
            onConds.result().reduceOption(_ && _).getOrElse(lit(true))
          if (postConjs.isEmpty)
            dropSubqueryFlags(lf.join(rf, onCond, joinType))
          else {
            val pred = postConjs.reduce((a, b) => EApp("AND", List(a, b)))
            val pairs = lf.join(rf, onCond, "inner")
            val (withPred, c) = predicateWithSubqueries(ctx, pairs, pred)
            val matched =
              dropSubqueryFlags(withPred.filter(coalesce(c, lit(false))))
            kind match {
              case JoinInner => matched
              case JoinLeft | JoinLeftOpt(_) =>
                // Restore unmatched left rows. The left side is scanned
                // twice (pair join + anti restore) — the cost of the one
                // ON shape with no single carrier side; both scans keep
                // their pushed filters and the anti join is a hash join
                // on the left row's columns.
                val leftCols = l.columns.toIndexedSeq
                val matchedKeys = matched.select(
                  leftCols.map(c0 => col(c0).as(s"__lj_$c0")): _*)
                val antiCond = leftCols
                  .map(c0 => col(c0) <=> col(s"__lj_$c0"))
                  .reduce(_ && _)
                val unmatched =
                  dropSubqueryFlags(lf.join(matchedKeys, antiCond, "left_anti"))
                    .select(leftCols.map(col) ++ r.schema.fields.toIndexedSeq
                      .map(f => lit(null).cast(f.dataType).as(f.name)): _*)
                matched.union(unmatched.select(
                  matched.columns.toIndexedSeq.map(col): _*))
            }
          }
        }
    }

  private def aliasOf(one: FromOne): String = one match {
    case FromTable(t, a)  => a.getOrElse(t)
    case FromSelect(_, a) => a
  }

  private def lowerFromOne(ctx: Ctx, scope: Scope,
      one: FromOne): DataFrame = {
    val alias = aliasOf(one)
    val sub = Scope.subscope(scope, alias).getOrElse(
      fail(s"lowerFromOne: no scope for $alias"))
    one match {
      case FromTable(table, _) =>
        // prune the scan to used fields (dead-field elimination)
        val used = sub.fields.values.filter(_.isUsed).map(_.name).toSeq
        val df = ctx.load(table)
        val cols = used.map(c => col(c).as(ns(alias, c)))
        if (cols.isEmpty) df.select() else df.select(cols: _*)
      case FromSelect(sel, _) =>
        val inner = lowerSelect(ctx, sub, sel)
        inner.select(inner.columns.toIndexedSeq.map(c => col(c).as(ns(alias, c))): _*)
    }
  }

  // ---------------- WHERE with subquery predicates ----------------

  private[frontend] def conjuncts(e: Expr): List[Expr] = e match {
    case EApp("AND", List(x, y)) => conjuncts(x) ++ conjuncts(y)
    case _                       => List(e)
  }

  /** Extracts IN/EXISTS subqueries from expressions into materialized
    * boolean flag columns on a carried DataFrame — the subquery joins
    * stay lazy Catalyst joins, and the flag column holds the final
    * truth value, so a rewritten expression compiles with the plain
    * `compile` anywhere (WHERE remainder, projection, group keys,
    * aggregate arguments, ORDER BY).
    *
    * INs over nullable data get exact three-valued flags:
    * single-column via the uncorrelated has-null/non-empty scalars,
    * multi-column via a null-tolerant ExistenceJoin for the NULL
    * verdict (matching the 3VL row comparison the reference's
    * backends apply). Flags are memoized per structural expression,
    * so a group key and a projection mentioning the same IN share
    * one flag.
    */
  private final class SubqueryFlags(ctx: Ctx, var df: DataFrame,
      prefix: String = "__in_flag_") {
    private var flagIdx = 0
    private val memo = scala.collection.mutable.Map[Expr, EName]()

    private def nextFlag(): String = {
      val f = s"$prefix$flagIdx"
      flagIdx += 1
      f
    }

    /** Substitute ONLY already-memoized subqueries (no new joins). */
    def rewriteMemoized(e: Expr): Expr = e match {
      case in @ EIn(_, _)   => memo.getOrElse(in, in)
      case ex @ EExists(_)  => memo.getOrElse(ex, ex)
      case EApp(f, as)      => EApp(f, as.map(rewriteMemoized))
      case EAscribe(x, t)   => EAscribe(rewriteMemoized(x), t)
      case other            => other
    }

    /** Rewrite for a projection field under GROUP BY. Inside agg(),
      * a pre-aggregation flag column is only legal where Spark's
      * grouping check allows it, so:
      *  - a subquery UNDER an aggregate function rewrites to a
      *    pre-agg flag (aggregate arguments evaluate on the pre-agg
      *    frame — `max(k in (sub))` becomes `max(flag)`);
      *  - a subquery that IS a whole group key reuses that key's
      *    flag (the flag is a grouping column);
      *  - anything else is left in place for the caller to compute
      *    on the post-aggregation frame.
      * WHERE-memoized flags must NOT leak in here: they live on the
      * pre-agg frame but are not grouping columns, so only flags in
      * `groupKeyFlags` substitute outside aggregate arguments.
      */
    def rewriteForGroupedProjection(e: Expr,
        groupKeyFlags: Set[String]): Expr = e match {
      case in @ EIn(_, _) =>
        memo.get(in).filter(f => groupKeyFlags(f.name)).getOrElse(in)
      case ex @ EExists(_) =>
        memo.get(ex).filter(f => groupKeyFlags(f.name)).getOrElse(ex)
      case EApp(f, as) if aggFuncNames(f) => EApp(f, as.map(rewrite))
      case EApp(f, as) =>
        EApp(f, as.map(rewriteForGroupedProjection(_, groupKeyFlags)))
      case EAscribe(x, t) =>
        EAscribe(rewriteForGroupedProjection(x, groupKeyFlags), t)
      case other => other
    }

    def lowerInDf(es: List[Expr], sel: Select): (DataFrame, Column) = {
      val sub = lowerTopSelect(ctx, sel)
      val renamed = sub.toDF(sub.columns.toIndexedSeq
        .map(c => s"__in${flagIdx}_$c"): _*)
      val cond = es.zip(renamed.columns).map { case (e, c) =>
        compile(ctx, e) === col(c)
      }.reduce(_ && _)
      (renamed, cond)
    }

    /** A lazy one-row [true] DataFrame that is empty iff `sel` is. */
    def existsFlagDf(sel: Select, flag: String): DataFrame =
      broadcast(lowerTopSelect(ctx, sel).limit(1)
        .select(lit(true).as(flag)))

    def rewrite(e: Expr): Expr = e match {
      case in @ EIn(es, sel) => memo.getOrElseUpdate(in, {
        val (sub, cond) = lowerInDf(es, sel)
        val flag = nextFlag()
        val raw = s"${flag}_raw"
        val probes = es.map(x => compile(ctx, x))
        val probeNullable = es.exists(x =>
          df.select(compile(ctx, x)).schema.head.nullable)
        val subNullable = sub.schema.exists(_.nullable)
        val distinctSub = sub.distinct()
        df = df.join(distinctSub.withColumn(raw, lit(true)), cond,
          "left_outer").drop(sub.columns.toIndexedSeq: _*)
        val value =
          if (!probeNullable && !subNullable)
            // no NULL can arise: unmatched ⇒ definitely false
            coalesce(col(raw), lit(false))
          else if (es.length == 1) {
            // exact 3VL: TRUE on a definite match; NULL when the probe
            // is null and the subquery is non-empty, or the subquery
            // contains a null; FALSE otherwise. Non-emptiness and
            // has-a-null are set properties, so the stats aggregate
            // runs over the SAME distinct frame the join probes (one
            // lowering, provably consistent with the joined set); the
            // subquery still scans twice in the physical plan —
            // DeduplicateRelations re-ids one branch, which defeats
            // ReuseExchange — but both scans carry the subquery's
            // pushed filters, and the path only engages for
            // single-column INs over nullable data
            val n = s"${flag}_n"
            val nn = s"${flag}_nn"
            val stats = broadcast(distinctSub.agg(
              count(lit(1)).as(n),
              count(col(distinctSub.columns.head)).as(nn)))
            df = df.join(stats, lit(true), "left_outer")
            when(col(raw), lit(true))
              .when(probes.head.isNull && col(n) > 0,
                lit(null).cast("boolean"))
              .when(col(nn) < col(n), lit(null).cast("boolean"))
              .otherwise(lit(false))
          } else {
            // exact 3VL for multi-column IN: TRUE on a definite
            // full-row match (the equi join above); else NULL when
            // some subquery row NULL-MATCHES the probe — no component
            // definitely differs, i.e. per component either side is
            // NULL or they are equal — else FALSE. The null-match
            // verdict is an ExistenceJoin (Dataset.exists + outer
            // refs): a mark join sets one boolean per probe row, so
            // the one-to-many null-tolerant comparison can never
            // duplicate probe rows. The condition is non-equi, so the
            // planner uses a broadcast nested-loop against the
            // DISTINCT subquery rows — engages only for multi-column
            // INs over nullable data.
            val probeCols = probes.zipWithIndex.map { case (p, i) =>
              (s"${flag}_p$i", p)
            }
            df = probeCols.foldLeft(df) { case (d, (n, p)) =>
              d.withColumn(n, p)
            }
            val nmPred = probeCols.map(_._1).zip(
              distinctSub.columns.toIndexedSeq).map { case (pn, sc) =>
              val p = col(pn).outer()
              p.isNull || col(sc).isNull || (p === col(sc))
            }.reduce(_ && _)
            val nm = s"${flag}_nm"
            df = df.withColumn(nm, distinctSub.where(nmPred).exists())
            when(col(raw), lit(true))
              .when(col(nm), lit(null).cast("boolean"))
              .otherwise(lit(false))
          }
        df = df.withColumn(flag, value)
        EName(flag)
      })
      case ex @ EExists(sel) => memo.getOrElseUpdate(ex, {
        val flag = nextFlag()
        val raw = s"${flag}_raw"
        df = df.join(existsFlagDf(sel, raw), lit(true), "left_outer")
          .withColumn(flag, coalesce(col(raw), lit(false)))
        EName(flag)
      })
      case EApp(f, as)    => EApp(f, as.map(rewrite))
      case EAscribe(x, t) => EAscribe(rewrite(x), t)
      case other          => other
    }

    /** Drop every helper column this extractor added. */
    def dropFlags(out: DataFrame): DataFrame = {
      val flags = out.columns.filter(_.startsWith("__in_flag_")).toIndexedSeq
      if (flags.isEmpty) out else out.drop(flags: _*)
    }
  }

  /** Apply WHERE: IN conjuncts become semi joins, NOT IN conjuncts
    * become null-aware anti joins (SQL three-valued semantics: a NULL
    * probe or a NULL in the subquery keeps no row), EXISTS conjuncts
    * become lazy one-row gate joins, nested INs/EXISTS become
    * materialized flag joins; the remainder compiles to one filter.
    */
  private def applyWhere(ctx: Ctx, df0: DataFrame, where: Expr,
      flags: SubqueryFlags): DataFrame = {
    flags.df = df0
    val parts = conjuncts(where)
    val plain = List.newBuilder[Expr]
    parts.foreach {
      case EIn(es, sel) =>
        val (sub, cond) = flags.lowerInDf(es, sel)
        flags.df = flags.df.join(sub, cond, "left_semi")
      case EApp("NOT", List(EIn(es, sel))) =>
        // null-aware anti join: a probe row is dropped when any
        // subquery row compares equal OR null-compares (3VL: such a
        // row can never be definitely not-in)
        val (sub, cond) = flags.lowerInDf(es, sel)
        flags.df = flags.df.join(sub, cond || isnull(cond), "left_anti")
      case EExists(sel) =>
        // lazy gate: left-semi against a broadcast one-row flag —
        // no job until the caller executes the plan
        flags.df = flags.df.join(flags.existsFlagDf(sel, "__ex_gate"),
          lit(true), "left_semi")
      case EApp("NOT", List(EExists(sel))) =>
        flags.df = flags.df.join(flags.existsFlagDf(sel, "__ex_gate"),
          lit(true), "left_anti")
      case other => plain += other
    }
    val rest = plain.result()
    if (rest.nonEmpty) {
      val cond = rest.map(flags.rewrite).map(compile(ctx, _)).reduce(_ && _)
      flags.df = flags.df.filter(cond)
    }
    flags.df
  }

  /** DML-facing predicate compiler: rewrites IN/EXISTS subqueries in
    * `pred` into flag columns materialized on `df` (same machinery as
    * SELECT positions) and returns the augmented frame plus the
    * compiled predicate over it. Callers filter on the predicate and
    * then strip the helpers with [[dropSubqueryFlags]].
    */
  private[frontend] def predicateWithSubqueries(ctx: Ctx, df: DataFrame,
      pred: Expr, prefix: String = "__in_flag_"): (DataFrame, Column) = {
    val flags = new SubqueryFlags(ctx, df, prefix)
    val rewritten = flags.rewrite(pred)
    (flags.df, compile(ctx, rewritten))
  }

  /** Column names (namespaced form) an expression references OUTSIDE
    * its subselects — used to decide which join side can carry a
    * subquery conjunct's flag rewrite.
    */
  private def exprColumns(e: Expr): Set[String] = e match {
    case ENav(a, EName(f)) => Set(ns(a, f))
    case EName(n)          => Set(n)
    case EIn(es, _)        => es.flatMap(exprColumns).toSet
    case EExists(_)        => Set.empty
    case EApp(_, args)     => args.flatMap(exprColumns).toSet
    case EAscribe(x, _)    => exprColumns(x)
    case _                 => Set.empty
  }

  /** Drop every helper column a [[predicateWithSubqueries]] rewrite
    * added (all share the `__in_flag_` prefix).
    */
  private[frontend] def dropSubqueryFlags(df: DataFrame): DataFrame = {
    val helpers = df.columns.filter(_.startsWith("__in_flag_")).toIndexedSeq
    if (helpers.isEmpty) df else df.drop(helpers: _*)
  }

  /** Project named expressions over `df`, rewriting IN/EXISTS
    * subqueries in them to flag columns first — the final select
    * keeps only the named outputs, so the helpers vanish with it.
    * Serves the DML projection islands (RETURNING, non-constant
    * INSERT VALUES rows).
    */
  private[frontend] def projectWithSubqueries(ctx: Ctx, df: DataFrame,
      cols: Seq[(String, Expr)]): DataFrame = {
    val flags = new SubqueryFlags(ctx, df)
    val rewritten = cols.map { case (n, e) => (n, flags.rewrite(e)) }
    flags.df.select(rewritten.map { case (n, e) =>
      compile(ctx, e).as(n) }: _*)
  }

  /** Add named computed columns to `df` with the same subquery
    * rewrite, then strip the helpers (UPDATE SET's island).
    */
  private[frontend] def withColumnsWithSubqueries(ctx: Ctx, df: DataFrame,
      cols: Seq[(String, Expr)]): DataFrame = {
    val flags = new SubqueryFlags(ctx, df)
    val rewritten = cols.map { case (n, e) => (n, flags.rewrite(e)) }
    val out = rewritten.foldLeft(flags.df) { case (d, (n, e)) =>
      d.withColumn(n, compile(ctx, e))
    }
    flags.dropFlags(out)
  }

  // ---------------- SELECT ----------------

  /** Lower an elaborated select in its scope; output columns are the
    * emission list's names in order.
    */
  def lowerSelect(ctx: Ctx, scope: Scope, sel: Select): DataFrame = {
    val base: DataFrame = sel.from match {
      case Some(f) => lowerFrom(ctx, scope, f)
      case None =>
        // SELECT without FROM: a single unit row
        ctx.spark.range(1).select()
    }
    val flags = new SubqueryFlags(ctx, base)
    sel.where.foreach(w => applyWhere(ctx, flags.df, w, flags))
    // IN/EXISTS in group keys become flag columns materialized on the
    // pre-aggregation frame. Projection subqueries pre-rewrite fully
    // in the ungrouped case; under GROUP BY a pre-agg flag is only
    // legal inside agg() where Spark's grouping check allows it, so a
    // field either (a) IS a group-expression occurrence after memo
    // substitution (legal wholesale), or (b) goes through the
    // restricted rewrite: subqueries under aggregates → pre-agg
    // flags, whole-group-key subqueries → their grouping flag,
    // anything else deferred to the post-aggregation frame
    val groups2 = sel.groupBy.map(_.map(flags.rewrite))
    val groupKeyFlags: Set[String] = groups2.getOrElse(Nil)
      .collect { case EName(n) => n }.toSet
    val fields = emission(scope, sel.proj).map { case (n, e) =>
      val e2 = groups2 match {
        case None => flags.rewrite(e)
        case Some(groups) =>
          val subst = flags.rewriteMemoized(e)
          if (groups.contains(subst)) subst
          else flags.rewriteForGroupedProjection(e, groupKeyFlags)
      }
      (n, e2)
    }
    // same split for ORDER BY: pre-agg rewrite only when ungrouped.
    // NOTE: the pre-aggregation frame is read as `flags.df` at each
    // use site below, never captured early — the grouped branch keeps
    // adding pre-agg flag joins (aggregate-argument subqueries) while
    // building its agg column list
    val orderBy2 =
      if (groups2.isDefined) sel.orderBy
      else sel.orderBy.map(_.map { case (e, d) => (flags.rewrite(e), d) })

    groups2 match {
      case Some(groups) =>
        val groupCols = groups.map(compile(ctx, _))
        // projection fields still carrying subqueries after the memo
        // substitution are computed on the post-aggregation frame
        val (subFields, plainFields) = fields.partition {
          case (_, e) => containsSubquery(e)
        }
        val hidden = List.newBuilder[(String, Column)]
        // HAVING splits by conjunct: subquery-free conjuncts compile
        // into one hidden agg column and filter right after the
        // aggregation; conjuncts carrying IN/EXISTS are rewritten on
        // the POST-aggregation frame — their aggregate/group-key parts
        // are lifted into hidden agg columns first, then the
        // subqueries become flag joins against the aggregated rows.
        // HAVING/ORDER BY conjuncts go through the same restricted
        // rewrite as projection fields first: a subquery that IS a
        // group key becomes its grouping flag, aggregate-argument
        // subqueries become pre-agg flags — only what remains needs
        // the post-aggregation frame
        val (havingSub, havingPlain) = sel.having
          .map(h => conjuncts(h)
            .map(flags.rewriteForGroupedProjection(_, groupKeyFlags))
            .partition(containsSubquery))
          .getOrElse((Nil, Nil))
        if (havingPlain.nonEmpty)
          hidden += ("__having" ->
            havingPlain.map(compile(ctx, _)).reduce(_ && _))
        var hsqIdx = 0
        def lift(c: Column): Expr = {
          val n = s"__hsq_$hsqIdx"
          hsqIdx += 1
          hidden += (n -> c)
          EName(n)
        }
        // every expression entering this lift already went through
        // rewriteForGroupedProjection, so aggregate arguments carry no
        // subqueries here (they were rewritten to pre-agg flags) —
        // what remains is lifted around the surviving subquery nodes
        def liftNonSubquery(e: Expr): Expr =
          if (!containsSubquery(e)) lift(compile(ctx, e))
          else e match {
            case EIn(es, s2)    => EIn(es.map(liftNonSubquery), s2)
            case EApp(f, as)    => EApp(f, as.map(liftNonSubquery))
            case EAscribe(x, t) => EAscribe(liftNonSubquery(x), t)
            case other          => other // EExists: independent subplan
          }
        val havingSub2 = havingSub.map(liftNonSubquery)
        // ORDER BY expressions get the same two-stage treatment:
        // restricted rewrite first (group-key flags, pre-agg flags for
        // aggregate arguments), then anything still carrying a
        // subquery is computed after the aggregation
        val obPost = List.newBuilder[(Int, Expr)]
        orderBy2.getOrElse(Nil).zipWithIndex.foreach { case ((e0, _), i) =>
          val e = flags.rewriteForGroupedProjection(e0, groupKeyFlags)
          if (containsSubquery(e)) obPost += (i -> liftNonSubquery(e))
          else hidden += (s"__ob_$i" -> compile(ctx, e))
        }
        val obPost2 = obPost.result()
        val subFields2 = subFields.map { case (n, e) =>
          (n, liftNonSubquery(e))
        }
        val aggCols =
          plainFields.map { case (n, e) => compile(ctx, e).as(n) } ++
            hidden.result().map { case (n, c) => c.as(n) }
        val agged = aggCols match {
          case Nil => flags.df.groupBy(groupCols: _*)
            .agg(count(lit(1)).as("__dummy"))
          case head :: tail =>
            flags.df.groupBy(groupCols: _*).agg(head, tail: _*)
        }
        val plainFiltered =
          if (havingPlain.nonEmpty) agged.filter(col("__having")) else agged
        val havinged =
          if (havingSub2.isEmpty && obPost2.isEmpty && subFields2.isEmpty)
            plainFiltered
          else {
            val postFlags = new SubqueryFlags(ctx, plainFiltered)
            val havingConds = havingSub2.map(postFlags.rewrite)
              .map(compile(ctx, _))
            val obCols = obPost2.map { case (i, e) =>
              (i, compile(ctx, postFlags.rewrite(e)))
            }
            val projCols = subFields2.map { case (n, e) =>
              (n, compile(ctx, postFlags.rewrite(e)))
            }
            var out = havingConds.reduceOption(_ && _) match {
              case Some(c) => postFlags.df.filter(c)
              case None    => postFlags.df
            }
            obCols.foreach { case (i, c) =>
              out = out.withColumn(s"__ob_$i", c)
            }
            projCols.foreach { case (n, c) =>
              out = out.withColumn(n, c)
            }
            postFlags.dropFlags(out)
          }
        val ordered = orderBy2 match {
          case Some(obs) =>
            havinged.orderBy(obs.zipWithIndex.map {
              case ((_, Asc), i)  => col(s"__ob_$i").asc
              case ((_, Desc), i) => col(s"__ob_$i").desc
            }: _*)
          case None => havinged
        }
        val limited = applyLimitOffset(ctx, ordered, sel)
        limited.select(fields.map { case (n, _) => col(n) }: _*)

      case None =>
        val ordered = orderBy2 match {
          case Some(obs) =>
            flags.df.orderBy(obs.map {
              case (e, Asc)  => compile(ctx, e).asc
              case (e, Desc) => compile(ctx, e).desc
            }: _*)
          case None => flags.df
        }
        val limited = applyLimitOffset(ctx, ordered, sel)
        limited.select(fields.map { case (n, e) =>
          compile(ctx, e).as(n)
        }: _*)
    }
  }

  private def applyLimitOffset(ctx: Ctx, df: DataFrame,
      sel: Select): DataFrame = {
    def asInt(e: Expr): Int = e match {
      case ELit(LitInt(v)) => v.toInt
      case EParam(n) => ctx.params.get(n) match {
        case Some(v: Int)  => v
        case Some(v: Long) => v.toInt
        case _ => fail(s"limit/offset param ?$n must be an integer")
      }
      case EAscribe(e2, _) => asInt(e2)
      case _ => fail("limit/offset must be an integer literal or param")
    }
    val off = sel.offset.map(asInt)
    val lim = sel.limit.map(asInt)
    val d1 = off match { case Some(n) => df.offset(n); case None => df }
    lim match { case Some(n) => d1.limit(n); case None => d1 }
  }

  /** Lower an IN/EXISTS subselect using the scope the analyzer
    * recorded for it on the Env.
    */
  private def lowerTopSelect(ctx: Ctx, sel: Select): DataFrame = {
    val scope = ctx.env.subSelectScopes.get(sel)
    if (scope == null) fail("no recorded scope for subselect")
    lowerSelect(ctx, scope, sel)
  }

  /** FROM lowering for DML (UPDATE ... FROM): same namespacing. */
  def lowerFromForDml(ctx: Ctx, scope: Analyzer.Scope,
      from: From): DataFrame = lowerFrom(ctx, scope, from)

  // ---------------- queries ----------------

  def lowerQuery(spark: SparkSession, env: Env, info: QueryInfo,
      load: String => DataFrame,
      params: Map[String, Any] = Map.empty): DataFrame = {
    val ctx = Ctx(spark, env, load, params)
    info.query match {
      case QSelect(sel) => lowerSelect(ctx, info.scope, sel)
      case _ => fail("DML lowering is handled by ManagedTables")
    }
  }
}
