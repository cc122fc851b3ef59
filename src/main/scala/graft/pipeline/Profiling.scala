package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus profiling: the "know your data" pass a pipeline runs before
  * and after every transformation (did the filter skew the length
  * distribution? did dedup drop a source?).
  */
object Profiling {

  /** Per-column numeric profile — row count, null count, exact
    * distinct count, min/max, quartiles — as one row per column.
    *
    * Scale shape, `approx = true` (the 100 TB path): ONE wide
    * aggregation over a single scan — one `approx_percentile` sketch
    * per column (all three quantiles read from the same
    * bounded-memory digest, error <= 1/accuracy in rank) and a
    * HyperLogLog++ distinct count (default ~5% relative error) —
    * every aggregation buffer bounded, then a driver-free unpivot of
    * the single result row via explode.
    *
    * Scale shape, `approx = false` (exact mode, rewritten in the r12
    * optimization round): rows collapse to per-column (value, count)
    * frames via ONE partial (map-side combined) aggregation per
    * column — the quartiles, distinct count, min/max and null count
    * are all derived from those value counts, so no row-scale data
    * ever sits in an aggregation buffer. The old shape planned the
    * multi-column countDistinct through Expand (k+1 copies of every
    * row) and buffered each column's FULL value-count map inside a
    * single-row `percentile` aggregate whose final merge was one
    * thread; the value-count shape shuffles only distinct values,
    * sorts them per column inside a keyed window (guide §2.3
    * "aggregate before you shuffle"), and reproduces Spark's
    * `percentile` interpolation arithmetic exactly — bit-for-bit the
    * same output, pinned by spec against `percentile` itself. State
    * is O(distinct values per column) — the same bound the old exact
    * mode had, now spread across the cluster instead of concentrated
    * in one merge. Exact mode remains the attestable-profiling choice
    * for bounded corpora; `approx` remains the unbounded-cardinality
    * path.
    */
  def numericProfile(df: DataFrame, cols: Seq[String],
      approx: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    // a duplicated name would silently double every count in exact
    // mode (the per-column branches union into one frame keyed only
    // by col_name), where the wide-agg shape failed fast on ambiguous
    // aliases — reject it up front in both modes (r12 ADVICE)
    require(cols.distinct.size == cols.size,
      s"numericProfile got duplicate columns: ${cols.mkString(", ")}")
    val qs = Seq(0.25, 0.5, 0.75)
    if (!approx) return exactProfileFromValueCounts(df, cols, qs)
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        count(col(c)).as(s"${c}__nn"),
        // the distinct count is sketched: exact countDistinct keeps
        // O(distinct) aggregation state per column, the one unbounded
        // buffer this path exists to avoid
        approx_count_distinct(col(c)).as(s"${c}__nd"),
        min(col(c).cast("double")).as(s"${c}__min"),
        max(col(c).cast("double")).as(s"${c}__max"),
        // ONE quantile aggregate per column taking the percentage
        // ARRAY: three scalar calls each buffer the column's digest
        // independently — 3x the aggregation memory and CPU for
        // identical values
        approx_percentile(col(c).cast("double"),
          array(qs.map(lit): _*), lit(accuracy)).as(s"${c}__pq"))
    }
    // the partial aggregation is CPU-heavy per row (per-column
    // sketch buffers); lift a low-parallelism local scan to cluster
    // parallelism first (no-op on multi-split inputs)
    val wide = Dedup.spread(df).agg(aggs.head, aggs.tail: _*)
    def quant(c: String, i: Int) = element_at(col(s"${c}__pq"), i + 1)
    val structs = array(cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"${c}__n").as("n_rows"),
        (col(s"${c}__n") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_v"),
        col(s"${c}__max").as("max_v"),
        quant(c, 0).as("p25"),
        quant(c, 1).as("median"),
        quant(c, 2).as("p75"))
    }: _*)
    wide.select(explode(structs).as("s")).select("s.*")
  }

  /** Exact [[numericProfile]] from per-column value counts (see the
    * scale-shape doc there). Grouping is on the ORIGINAL column value
    * — identical distinct semantics to `countDistinct(col)` — with
    * the double cast applied only for ordering, output and
    * interpolation, exactly where Spark's `percentile` applies it.
    * Each column is its own branch (a single-column parquet scan
    * reads the same bytes as its slice of a combined scan), and the
    * three downstream aggregates over a branch share its shuffle via
    * exchange reuse.
    *
    * Quantile arithmetic replicates `Percentile.getPercentile`:
    * position p = q·(nn−1); with `lo = ⌊p⌋`, `hi = ⌈p⌉` and loV/hiV
    * the values at those 0-based row positions of the sorted non-null
    * column, the result is loV when loV = hiV (Spark returns the key
    * directly — no float round-trip), else (hi−p)·loV + (p−lo)·hiV.
    *
    * Known divergence at the precision edge (r12 ADVICE): the
    * loV = hiV short-circuit here compares the post-cast DOUBLES,
    * while Spark's `percentile` compares the ORIGINAL keys. Two
    * distinct originals that collapse to one double — adjacent longs
    * beyond 2^53, or decimals past double precision — are interpolated
    * by Spark ((hi−p)·d + (p−lo)·d, which can land 1 ulp off d) but
    * returned directly here. Columns whose values exceed double's
    * exact-integer range lose the bit-for-bit guarantee by that 1 ulp;
    * every gate fixture (and any column that survives a double cast
    * losslessly) is unaffected.
    */
  private def exactProfileFromValueCounts(df: DataFrame,
      cols: Seq[String], qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val base = Dedup.spread(df)
    // one (value, count) branch per column; union tags rows by name
    val vc = cols.map { c =>
      base.groupBy(col(c).as("__ov")).agg(count(lit(1)).as("__c"))
        .select(lit(c).as("col_name"),
          col("__ov").cast("double").as("__v"), col("__c"))
    }.reduce(_ unionByName _)
    val nulls = vc.filter(col("__v").isNull)
      .groupBy("col_name").agg(sum("__c").as("__nulls"))
    val nonNull = vc.filter(col("__v").isNotNull)
    val stats = nonNull.groupBy("col_name").agg(
      sum("__c").as("__nn"), count(lit(1)).as("__nd"),
      min("__v").as("__min"), max("__v").as("__max"))
    // running row count over the sorted distinct values, per column —
    // value at 0-based row position r is the unique row with
    // __lt <= r < __cum
    val wcum = Window.partitionBy("col_name").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = nonNull.withColumn("__cum", sum("__c").over(wcum))
      .withColumn("__lt", col("__cum") - col("__c"))
    val withN = cum.join(
      broadcast(stats.select(col("col_name"), col("__nn"))), "col_name")
    def posOf(q: Double) = lit(q) * (col("__nn") - 1L).cast("double")
    val pickAggs = qs.zipWithIndex.flatMap { case (q, i) =>
      val loP = floor(posOf(q))
      val hiP = ceil(posOf(q))
      Seq( // exactly one row matches each position; max() selects it
        max(when(col("__lt") <= loP && col("__cum") > loP, col("__v")))
          .as(s"__lo$i"),
        max(when(col("__lt") <= hiP && col("__cum") > hiP, col("__v")))
          .as(s"__hi$i"))
    }
    val picked = withN.groupBy("col_name")
      .agg(pickAggs.head, pickAggs.tail: _*)
    // every requested column emits a row even when all-null or empty
    val seed = spark.createDataset(cols)(
      org.apache.spark.sql.Encoders.STRING).toDF("col_name")
    val joined = seed
      .join(broadcast(nulls), Seq("col_name"), "left")
      .join(broadcast(stats), Seq("col_name"), "left")
      .join(broadcast(picked), Seq("col_name"), "left")
    def quantile(i: Int) = {
      val p = posOf(qs(i))
      val loP = floor(p).cast("double")
      val hiP = ceil(p).cast("double")
      val (loV, hiV) = (col(s"__lo$i"), col(s"__hi$i"))
      when(coalesce(col("__nn"), lit(0L)) === 0L,
        lit(null).cast("double"))
        .when(loV === hiV, loV)
        .otherwise((hiP - p) * loV + (p - loP) * hiV)
    }
    joined.select(col("col_name"),
      (coalesce(col("__nn"), lit(0L)) + coalesce(col("__nulls"), lit(0L)))
        .as("n_rows"),
      coalesce(col("__nulls"), lit(0L)).as("n_nulls"),
      coalesce(col("__nd"), lit(0L)).as("n_distinct"),
      col("__min").as("min_v"), col("__max").as("max_v"),
      quantile(0).as("p25"), quantile(1).as("median"),
      quantile(2).as("p75"))
  }

  /** The approx profile (`numericProfile(approx = true)`) with an
    * in-plan rank-tolerance attestation — the 100 TB profiling path,
    * made externally checkable without asking another engine to
    * reproduce Spark's sketches bit-for-bit (it can't: sketch
    * internals differ across engines).
    *
    * Output per column: the EXACT fields (`n_rows`, `n_nulls`,
    * `min_v`, `max_v` — an oracle recomputes and hash-matches these
    * directly) plus one boolean verdict per quantile, true iff the
    * value the sketch returned has TRUE rank within `rankTol` of the
    * requested quantile. The rank check is tie-robust: a value v is
    * accepted for quantile q iff the closed rank interval
    * [count(x < v), count(x <= v)] / n intersects [q-rankTol,
    * q+rankTol] — with heavy ties (a 50-distinct-value column at
    * 100 TB) the cdf jumps across v, and demanding cdf(v) ~= q would
    * reject a perfect sketch. `approx_percentile`'s guarantee is rank
    * error <= 1/accuracy, so the default 1% tolerance is 100x the
    * sketch bound at accuracy=10000 — the verdicts are deterministic,
    * not flaky.
    *
    * Scale shape: two scans, every aggregation buffer bounded. Scan 1
    * is the approx profile (sketches only); scan 2 re-reads the data
    * cross-joined against the BROADCAST k-row profile and computes
    * the conditional rank sums — no Expand, no O(distinct) state
    * anywhere (contrast exact mode's countDistinct + percentile).
    * The HLL distinct count is excluded from the checked output (its
    * accuracy is spec-attested against exact counts at test scale);
    * checking it in-plan would need exact countDistinct — the very
    * unbounded buffer this path exists to avoid.
    */
  def approxProfileChecked(df: DataFrame, cols: Seq[String],
      accuracy: Int = 10000, rankTol: Double = 0.01): DataFrame = {
    val prof = numericProfile(df, cols, approx = true, accuracy)
    // scan 2: each data row meets the k profile rows (broadcast —
    // k = #cols, never data-sized), contributes to the rank sums of
    // its own column's row only
    val joined = Dedup.spread(df).crossJoin(broadcast(prof))
    val v = cols.foldLeft(lit(null).cast("double")) { (acc, c) =>
      when(col("col_name") === c, col(c).cast("double")).otherwise(acc)
    }
    def rankOk(q: Double, qv: org.apache.spark.sql.Column) = {
      val n = count(v)
      val below = sum(when(v < qv, 1L).otherwise(0L))
      val atOrBelow = sum(when(v <= qv, 1L).otherwise(0L))
      // an all-NULL column has no ranks to violate: 0/0 would give
      // NaN and a spuriously FALSE verdict for a sketch that did
      // nothing wrong (approx_percentile legitimately returns NULL)
      when(n === 0, lit(true)).otherwise(
        (below.cast("double") / n <= q + rankTol) &&
          (atOrBelow.cast("double") / n >= q - rankTol))
    }
    joined
      .groupBy("col_name", "n_rows", "n_nulls", "min_v", "max_v",
        "p25", "median", "p75")
      .agg(
        rankOk(0.25, col("p25")).as("p25_rank_ok"),
        rankOk(0.50, col("median")).as("median_rank_ok"),
        rankOk(0.75, col("p75")).as("p75_rank_ok"))
      .select("col_name", "n_rows", "n_nulls", "min_v", "max_v",
        "p25_rank_ok", "median_rank_ok", "p75_rank_ok")
  }

  /** Pairwise Pearson correlation matrix over numeric columns, in ONE
    * wide aggregation over a single scan.
    *
    * Correlations are derived from EXACT sums, not floating
    * accumulation: each value is scaled to an integer (`round(x *
    * scale)`) and summed as DECIMAL(38,0), so the aggregation is
    * order-independent — the same exact sums on any cluster, any
    * partitioning. The Pearson formula then runs once per pair in the
    * projection on doubles cast from those exact sums; every IEEE op
    * is deterministic, making the result attestable bit-for-bit by an
    * external engine computing the same sums. Aggregation state is
    * O(k^2) decimals for k columns — bounded at any data size; rows
    * with a NULL in any profiled column are excluded (pairwise-common
    * support, same row set for every pair).
    */
  def corrProfile(df: DataFrame, cols: Seq[String],
      scale: Int = 100): DataFrame = {
    require(cols.size >= 2, "corrProfile needs at least two columns")
    val clean = Dedup.spread(df.na.drop(cols))
    def v(c: String) =
      round(col(c).cast("double") * scale, 0).cast("decimal(18,0)")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs =
      Seq(count(lit(1)).as("__n")) ++
        cols.flatMap { c =>
          Seq(sum(v(c)).as(s"${c}__s"), sum(v(c) * v(c)).as(s"${c}__ss"))
        } ++
        pairs.map { case (a, b) => sum(v(a) * v(b)).as(s"${a}__${b}__sp") }
    val wide = clean.agg(aggs.head, aggs.tail: _*)
    val nD = col("__n").cast("double")
    def corrExpr(a: String, b: String) = {
      val (sx, sy) = (col(s"${a}__s").cast("double"), col(s"${b}__s").cast("double"))
      val (sxx, syy) = (col(s"${a}__ss").cast("double"), col(s"${b}__ss").cast("double"))
      val sxy = col(s"${a}__${b}__sp").cast("double")
      (nD * sxy - sx * sy) / (sqrt(nD * sxx - sx * sx) * sqrt(nD * syy - sy * sy))
    }
    val structs = array(pairs.map { case (a, b) =>
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        col("__n").as("n_rows"), corrExpr(a, b).as("pearson_r"))
    }: _*)
    wide.select(explode(structs).as("s")).select("s.*")
  }

  /** Z-score outlier rows: rows whose column value sits more than
    * `z` standard deviations from the mean, with the z-score
    * attached. Mean and standard deviation come from ONE scan of
    * exact grid-scaled DECIMAL sums (the [[corrProfile]] trick:
    * ×`scale` integers summed in DECIMAL(38,0)), so the thresholds —
    * and therefore the flagged set — are identical on any cluster
    * and partitioning, where a double sum's fold order would make
    * outlier membership nondeterministic at the boundary. The
    * one-row stats frame joins back as a lazy broadcast cross: two
    * scans total, bounded state, no driver action.
    */
  def zOutliers(df: DataFrame, idCol: String, colName: String,
      z: Double = 3.0, scale: Long = 100L): DataFrame = {
    require(z > 0, s"zOutliers needs z > 0, got $z")
    val v = round(col(colName).cast("double") * scale, 0)
      .cast("decimal(38,0)")
    val clean = df.filter(col(colName).isNotNull)
    val stats = clean.agg(
      count(lit(1)).as("__n"),
      sum(v).as("__s"),
      sum(v * v).as("__ss"))
    val sD = (col("__s").cast("double") / scale) / col("__n")
    val ssD = (col("__ss").cast("double") / (scale * scale)) / col("__n")
    val withStats = clean.crossJoin(broadcast(stats))
      .withColumn("__mean", sD)
      .withColumn("__std", sqrt(ssD - sD * sD))
    withStats
      .withColumn("z_score",
        (col(colName).cast("double") - col("__mean")) / col("__std"))
      .filter(abs(col("z_score")) > z)
      .select(col(idCol), col(colName), col("z_score"))
  }

  /** Fixed-domain equi-width histogram of a numeric column: `bins`
    * buckets over [lo, hi), NULLs dropped, out-of-range values
    * clamped into the edge buckets (so the counts always sum to the
    * non-null row count — a histogram that silently drops outliers
    * hides exactly the rows a profile exists to surface). The domain
    * is explicit rather than scanned: profiling pipelines already
    * know it (or take it from [[numericProfile]]'s min/max), and an
    * explicit domain keeps this a SINGLE scan + one partial+final
    * aggregation of at most `bins` groups — no pre-pass, bounded
    * state, any corpus size. Empty buckets are absent from the
    * output (bin edges are reconstructable from the bin index).
    */
  def histogram(df: DataFrame, colName: String, bins: Int,
      lo: Double, hi: Double): DataFrame = {
    require(bins > 0, s"histogram needs bins > 0, got $bins")
    require(lo < hi, s"histogram needs lo < hi, got [$lo, $hi)")
    val width = (hi - lo) / bins
    val bin = least(greatest(
        floor((col(colName).cast("double") - lo) / width), lit(0.0)),
      lit((bins - 1).toDouble)).cast("long")
    df.filter(col(colName).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("bin_lo", lit(lo) + col("bin") * width)
      .withColumn("bin_hi", lit(lo) + (col("bin") + 1) * width)
      .select("bin", "bin_lo", "bin_hi", "n_rows")
  }

  /** Exact percentile rank of every non-NULL row:
    * pct_rank = rows_below / (n − 1) with rows_below = count of rows
    * with STRICTLY smaller value (ties share a rank — SQL
    * percent_rank with min-rank semantics). The normalization step
    * for combining quality signals on different scales before a
    * weighted mix (each signal mapped onto [0,1] by corpus position).
    *
    * Scale shape — no global window ever touches raw rows:
    *   1. rows collapse to (bucket, value) counts via ONE partial
    *      aggregation; all window state from here on is bounded by
    *      DISTINCT values, not row count.
    *   2. range buckets come from an `approx_percentile` sketch
    *      (lazy one-row broadcast — the sketch's error moves WORK
    *      between buckets, never the answer; per-row bucket lookup is
    *      a codegen fold over the ≤`buckets`-element split array).
    *   3. within-bucket running sums order by value inside each
    *      bucket partition; bucket offsets are a second running sum
    *      over the ≤`buckets`-row totals frame. Offset + in-bucket
    *      sum = exact global rows_below (the sm5 two-level prefix-sum
    *      shape, keyed by value range instead of draw order).
    *   4. ranks join back to the id frame on value (fixed-width), and
    *      n arrives as a lazy broadcast one-row count.
    * The one division is IEEE double of two exact integers — an
    * oracle computing rank()−1 over the same data matches bit-exact.
    * NULL values are excluded (absent from the result); NaN is the
    * caller's to filter (its ordering differs between engines).
    */
  def percentileRank(df: DataFrame, idCol: String, colName: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"percentileRank needs buckets >= 1, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val v = col(colName)
    val nonNull = df.select(col(idCol), v).filter(v.isNotNull)
    val bucketed =
      if (buckets == 1) nonNull.withColumn("__b", lit(0))
      else {
        val splits = nonNull.agg(percentile_approx(v,
          lit((1 until buckets).map(_.toDouble / buckets).toArray),
          lit(10000)).as("__splits"))
        nonNull.crossJoin(broadcast(splits))
          .withColumn("__b", aggregate(col("__splits"), lit(0),
            (acc, s) => acc + when(v >= s, 1).otherwise(0)))
      }
    val vc = bucketed.groupBy(col("__b"), v)
      .agg(count(lit(1)).as("__c"))
    val inBucket = Window.partitionBy("__b").orderBy(colName)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withIn = vc.withColumn("__below_in",
      coalesce(sum("__c").over(inBucket), lit(0L)))
    val acrossBuckets = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = vc.groupBy("__b").agg(sum("__c").as("__bt"))
      .withColumn("__off", coalesce(sum("__bt").over(acrossBuckets), lit(0L)))
      .select("__b", "__off")
    val ranks = withIn.join(offsets, "__b")
      .select(v.as("__v"), (col("__off") + col("__below_in")).as("rows_below"))
    val n = nonNull.agg(count(lit(1)).as("__n"))
    nonNull.join(ranks, v === col("__v")).crossJoin(broadcast(n))
      .select(col(idCol), v,
        col("rows_below"),
        when(col("__n") > 1,
          col("rows_below").cast("double") / (col("__n") - 1).cast("double"))
          .otherwise(lit(0.0)).as("pct_rank"))
  }

  /** Per-source "data card": the one-frame corpus summary every
    * dataset release ships (doc/char/token volumes, language spread,
    * exact-duplicate rate, short-doc share) — composed as ONE
    * declarative plan over ONE scan family so a 100 TB corpus pays a
    * single read, not a profiling job per statistic.
    *
    * Shape: per-doc features are map-only (md5, token count, length
    * flags); duplicates roll up through a (source, content-hash)
    * partial agg, languages through a (source, lang) partial agg, and
    * the two |sources|-row summaries meet in one tiny join. No
    * windows, no Expand-based multi-distinct — the countDistinct
    * discipline used everywhere in this repo.
    */
  def corpusCard(docs: DataFrame, srcCol: String, langCol: String,
      textCol: String, shortChars: Int = 100): DataFrame = {
    val base = docs.select(col(srcCol).as("source"),
      col(langCol).as("__lang"),
      md5(col(textCol).cast("binary")).as("__h"),
      length(col(textCol)).cast("long").as("__chars"),
      size(split(col(textCol), " +")).cast("long").as("__toks"))
    val byHash = base
      .groupBy(col("source"), col("__h"))
      .agg(count(lit(1)).as("__n"), sum("__chars").as("__c"),
        sum("__toks").as("__t"),
        sum(when(col("__chars") < shortChars, 1L).otherwise(0L))
          .as("__short"))
      .groupBy("source")
      .agg(sum("__n").as("n_docs"),
        count(lit(1)).as("n_unique"),
        (sum("__n") - count(lit(1))).as("dup_docs"),
        sum("__c").as("total_chars"),
        sum("__t").as("total_tokens"),
        sum("__short").as("short_docs"))
    val byLang = base.groupBy(col("source"), col("__lang"))
      .agg(count(lit(1)).as("__ln"))
      .groupBy("source").agg(count(lit(1)).as("n_langs"))
    byHash.join(byLang, "source")
  }
}
