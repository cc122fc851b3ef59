package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: a coarse k-means
  * quantizer assigns every vector to its nearest centroid cell;
  * queries probe only the `nprobe` nearest cells and rerank
  * exactly inside them.
  *
  * Scale shape: training runs Lloyd iterations with centroids held on
  * the driver (k × dims doubles — at corpus scale you train on a
  * sample, which is what `trainCentroids`' `sampleLimit` is for);
  * assignment and search are single map passes plus an equi-join on
  * cell id, so the corpus is never pairwise-joined.
  */
object Ivf {

  /** Squared-L2-to-centroid as a Column: ||x||² − 2·x·c + ||c||²
    * (the per-row ||x||² term is shared across all centroids).
    */
  private def dotLit(vec: Column, c: Array[Double]): Column = {
    val lits = array(c.toIndexedSeq.map(lit): _*)
    aggregate(zip_with(transform(vec, x => x.cast("double")), lits,
      (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
  }

  private def xx(vec: Column): Column =
    aggregate(transform(vec, x => x.cast("double")),
      lit(0.0d), (acc, v) => acc + v * v)

  /** The (distance, index) struct of the nearest centroid — a
    * struct-min so distance ties break on the lower index, exactly
    * like the oracle's `ORDER BY d, j`.
    */
  private[pipeline] def nearestCellStruct(vec: Column,
      centroids: Array[Array[Double]]): Column = {
    val x2 = xx(vec)
    val cands = centroids.zipWithIndex.map { case (c, j) =>
      val c2 = c.map(v => v * v).sum
      struct((x2 - lit(2.0) * dotLit(vec, c) + lit(c2)).as("d"),
        lit(j).as("j"))
    }
    least(cands.toIndexedSeq: _*)
  }

  /** Nearest-centroid id via a struct-min over (distance, index). */
  def nearestCell(vec: Column, centroids: Array[Array[Double]]): Column =
    nearestCellStruct(vec, centroids).getField("j")

  // ------------- exact ×10⁶-per-coordinate integer grid -------------
  //
  // Rounding the *final* double distance to a grid only fixes
  // cross-partition fold order; it does not make the per-row value
  // cross-engine stable (a d·10⁹ within an ulp of a rounding boundary
  // flips between Spark's lambda fold and DuckDB's list_dot_product —
  // the r9 km1/pq1 hash reds). The exact discipline (same as the
  // integer PageRank in Graph.scala) quantizes each COORDINATE first:
  // q = floor(x·10⁶ + 0.5) is one IEEE multiply + add + floor on the
  // same double in every engine, bit-identical. Every downstream term
  // of d = Σq² − 2Σ(q·qc) + Σqc² is then an integer-valued double:
  // with 64-dim unit-ish data the largest intermediate is ~10¹⁴ ≪ 2⁵³,
  // so every add/multiply is exact in ANY fold order and d is the
  // same integer in Spark, on the driver, and in DuckDB.

  /** floor(x·10⁶ + 0.5) per coordinate (floor+0.5, not round — no
    * half-even ambiguity, mirroring Quantize's int8 scheme).
    */
  private[graft] def gridVec(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(1e6d) + lit(0.5d)))

  /** The same grid applied to a driver-held centroid. */
  private[graft] def gridCentroid(c: Array[Double]): Array[Double] =
    c.map(v => math.floor(v * 1e6 + 0.5))

  /** Per-cell cluster profile over a fixed quantizer: member count,
    * representative (minimum) id, and the EXACT sum of squared-L2
    * distances to the assigned centroid on the ×10⁶-per-coordinate
    * integer grid — k-means diagnostics (cell balance, within-cluster
    * scatter) as ONE map-side assignment plus ONE partial-aggregated
    * groupBy.
    *
    * Both the argmin and the scatter sum run on the integer grid, so
    * the whole result is associative-exact AND cross-engine exact
    * (`sum_d12` = Σ d in units of 10⁻¹² of the squared distance,
    * carried as DECIMAL(38,0)). Result size = centroid count —
    * driver-tiny at any corpus size.
    */
  def clusterProfile(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val base = corpus.withColumn("__qv", gridVec(col(vecCol)))
    val a = nearestCellStruct(col("__qv"), centroids.map(gridCentroid))
    base
      .select(col(idCol), a.getField("j").as("cell"),
        a.getField("d").as("__d"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"), min(col(idCol)).as("min_id"),
        sum(col("__d").cast("decimal(38,0)")).as("sum_d12"))
  }

  /** `nprobe` nearest centroid ids as an array column. */
  def probeCells(vec: Column, centroids: Array[Array[Double]],
      nprobe: Int): Column = {
    val x2 = xx(vec)
    val cands = centroids.zipWithIndex.map { case (c, j) =>
      val c2 = c.map(v => v * v).sum
      struct((x2 - lit(2.0) * dotLit(vec, c) + lit(c2)).as("d"),
        lit(j).as("j"))
    }
    slice(transform(array_sort(array(cands.toIndexedSeq: _*)),
      s => s.getField("j")), 1, nprobe)
  }

  /** Partition-invariant bounded sample: keep rows whose portable
    * md5 hash of `prefix:seed:id` lands under a ppm threshold sized
    * for ~`limit` rows out of `n` — a map-side filter (no sort/limit
    * funnel) whose per-row decision depends only on the id, unlike
    * `df.sample`'s per-partition draw. The oracle replays it as
    * `md5-hex-prefix % 1e6 < ceil(limit/n·1e6)` (km2Sql) — keep the
    * two in lockstep.
    */
  private def ppmSample(df: DataFrame, idCol: String, prefix: String,
      seed: Long, limit: Int, n: Long): DataFrame =
    if (n <= limit) df
    else {
      val ppm = math.min(1000000L,
        math.ceil(limit.toDouble / n * 1e6).toLong)
      df.filter(
        PortableHash.hash60(concat(lit(s"$prefix:$seed:"),
          col(idCol).cast("string"))) % 1000000L < ppm)
    }

  /** Lloyd's k-means with deterministic seeded init (hash-ordered
    * sample). Centroid updates aggregate per (cell, dimension) —
    * a posexplode + groupBy, shuffle-friendly at any corpus size.
    *
    * PARTITION-INVARIANT: the training sample is a per-row portable-
    * hash ppm threshold on the id (`df.sample` draws per-PARTITION,
    * so a repartitioned rerun used to change the sample and therefore
    * the centroids — the r10 verdict's determinism caveat), and the
    * init pick is a (hash, id)-ordered global top-k. Same corpus +
    * same seed → the same centroids on any cluster layout.
    */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 3, seed: Long = 42L,
      sampleLimit: Int = 100000): Array[Array[Double]] = {
    val n = corpus.count()
    val sample = ppmSample(corpus, idCol, "ivf", seed, sampleLimit, n)
      .select(col(idCol), col(vecCol))
      .cache()
    var centroids: Array[Array[Double]] = sample
      .orderBy(xxhash64(col(idCol), lit(seed + 1)), col(idCol))
      .limit(k)
      .select(vecCol)
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    (1 to iters).foreach { _ =>
      val assigned = sample.withColumn("__cell",
        nearestCell(col(vecCol), centroids))
      val updated = assigned
        .select(col("__cell"), posexplode(col(vecCol)).as(Seq("__pos", "__v")))
        .groupBy("__cell", "__pos")
        .agg(avg(col("__v").cast("double")).as("__m"))
        .collect()
      val next = centroids.map(_.clone())
      updated.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      centroids = next
    }
    sample.unpersist()
    centroids
  }

  /** Integer-grid Lloyd: the trained-quantizer twin of
    * `trainCentroids` that is not merely deterministic but
    * ORACLE-REPLAYABLE — every step is exact integer arithmetic a SQL
    * engine reproduces bit-for-bit:
    *   - vectors quantized to the ×10⁶ coordinate grid first;
    *   - the training sample is the portable-md5 ppm threshold
    *     (partition-invariant, SQL: md5-hex-prefix mod 1e6 < ppm);
    *   - init picks the k (md5-hash, id)-smallest sample vectors;
    *   - assignment is the integer-grid argmin (ties to lower index);
    *   - the centroid update keeps cells ON the grid:
    *     c' = floor(Σq / n) per dimension — one IEEE division + floor
    *     on integer-valued doubles, identical in any engine; an empty
    *     cell keeps its previous centroid.
    * Returns centroids in GRID units (integer-valued doubles); divide
    * by 1e6 for original-scale consumers (`gridCentroid` then recovers
    * the exact integers, so `clusterProfile` composes losslessly).
    * Same shuffle shape as `trainCentroids`: per-(cell,dim) partial
    * aggs, k×dims driver state.
    */
  def trainCentroidsGrid(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int = 2, seed: Long = 42L,
      sampleLimit: Int = 100000): Array[Array[Double]] = {
    val n = corpus.count()
    // Spark floor() yields BIGINT elements; carry the grid as doubles
    // (exact — values are integral and ≪ 2^53)
    val base = corpus.select(col(idCol),
      gridVec(col(vecCol)).cast("array<double>").as("__qv"))
    val sample = ppmSample(base, idCol, "ivfx", seed, sampleLimit, n)
      .cache()
    var cents: Array[Array[Double]] = sample
      .orderBy(PortableHash.hash60(concat(lit(s"ivfxinit:$seed:"),
        col(idCol).cast("string"))), col(idCol))
      .limit(k)
      .select("__qv")
      .collect()
      .map(_.getSeq[Double](0).toArray)
    (1 to iters).foreach { _ =>
      val assigned = sample.select(
        nearestCellStruct(col("__qv"), cents).getField("j").as("__cell"),
        col("__qv"))
      val updated = assigned
        .select(col("__cell"),
          posexplode(col("__qv")).as(Seq("__pos", "__v")))
        .groupBy("__cell", "__pos")
        // Spark floor(double) yields BIGINT; back to double for the
        // centroid array (value unchanged — it's grid-integral)
        .agg(floor(sum(col("__v")) / count(lit(1))).cast("double").as("__m"))
        .collect()
      val next = cents.map(_.clone()) // absent (empty) cells keep theirs
      updated.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      }
      cents = next
    }
    sample.unpersist()
    cents
  }

  /** Deterministic, training-free centroid pick: the corpus vectors at
    * evenly spaced ids (vec_id = j·⌊N/nlist⌋ for j < nlist). No Lloyd
    * refinement — cells are still a valid inverted file, and the pick
    * is reproducible by the correctness oracle (trainCentroids is the
    * quality path; this is the attestable one).
    */
  def staticCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int): Array[Array[Double]] = {
    val n = corpus.count()
    val step = math.max(n / nlist, 1L)
    val picked = corpus
      .filter(col(idCol) % step === 0 && col(idCol) < step * nlist)
      .orderBy(col(idCol))
      .select(vecCol)
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    // the evenly-spaced pick assumes dense 0-based ids; with sparse or
    // offset ids the filter can select nothing, and an empty centroid
    // array would only surface later as a plan-time least() failure
    if (picked.isEmpty) throw new IllegalArgumentException(
      s"staticCentroids picked 0 of $nlist centroids (n=$n, step=$step): " +
        s"'$idCol' must be dense and 0-based; use trainCentroids for " +
        "arbitrary id spaces")
    picked
  }

  /** IVF top-k over a given quantizer: assign corpus cells once, probe
    * `nprobe` cells per query, rerank exactly with the native cosine.
    * Per-query top-k runs as a partial aggregation (no full-candidate
    * single-task window).
    */
  def ivfTopKWith(centroids: Array[Array[Double]], queries: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int): DataFrame = {
    val cb = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("neighbor_vec"),
      nearestCell(col(vecCol), centroids).as("cell"))
    val qb = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec"),
      explode(probeCells(col(vecCol), centroids, nprobe)).as("cell")))
    val scored = qb.join(cb, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("query_vec"), col("neighbor_vec")).as("cosine"))
    Similarity.topKPerQuery(scored, k)
  }

  /** Hard-negative mining at scale: IVF candidate generation feeding
    * the [lo, hi) cosine band + top-k rerank of
    * [[Similarity.hardNegatives]] — the composed form that replaces
    * ss4's exact O(|Q|·N) broadcast scan at billion-vector scale.
    * Candidates meet ONLY inside a probed-cell equi-join (a broadcast
    * HASH join on cell id — never a nested-loop scan), so per-query
    * work is the nprobe probed cells, not the corpus. Recall against
    * the exact baseline is what you tune nprobe with (the ss2-vs-ss1
    * pattern; PipelineSpec pins it on the gate fixture).
    *
    * A mined set can only MISS a hard negative whose cell was not
    * probed — a candidate inside the band is reranked by the same
    * exact cosine as the baseline, so precision is 1 by construction
    * and the k results per query are exact within the probed cells.
    */
  def ivfHardNegatives(centroids: Array[Array[Double]], queries: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String,
      lo: Double, hi: Double, k: Int, nprobe: Int): DataFrame = {
    require(lo < hi, s"empty band [$lo, $hi)")
    val cb = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("neighbor_vec"),
      nearestCell(col(vecCol), centroids).as("cell"))
    val qb = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("query_vec"),
      explode(probeCells(col(vecCol), centroids, nprobe)).as("cell")))
    val scored = qb.join(cb, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(col("query_vec"), col("neighbor_vec"))
          .as("cosine"))
      .filter(col("cosine") >= lo && col("cosine") < hi)
    Similarity.topKPerQuery(scored, k)
  }

  /** IVF top-k with a freshly trained k-means quantizer. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      iters: Int = 3, seed: Long = 42L): DataFrame =
    ivfTopKWith(trainCentroids(corpus, idCol, vecCol, nlist, iters, seed),
      queries, corpus, idCol, vecCol, k, nprobe)
}
