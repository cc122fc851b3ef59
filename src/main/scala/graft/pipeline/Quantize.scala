package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization: at 100 TB the embedding column IS the
  * dataset, and int8 storage is a 4× cut in scan bytes, shuffle bytes
  * and cache footprint. Symmetric per-vector scheme: scale = max |v|,
  * q_d = floor(v_d · 127 / scale + 0.5) ∈ [-127, 127] stored as
  * tinyint. All arithmetic is plain double ops with floor rounding,
  * so the correctness oracle reproduces it bit-for-bit (no
  * round-half banker's ambiguity).
  */
object Quantize {

  private def absMax(vecd: Column): Column =
    aggregate(vecd, lit(0.0d), (acc, x) => greatest(acc, abs(x)))

  /** Adds `qvec array<tinyint>` and `scale double` next to the
    * original vector column.
    */
  def quantize(df: DataFrame, vecCol: String): DataFrame = {
    val vd = transform(col(vecCol), x => x.cast("double"))
    val scale = absMax(vd)
    df.withColumn("scale", scale)
      .withColumn("qvec",
        when(col("scale") === 0.0d,
          transform(col(vecCol), _ => lit(0).cast("byte")))
          .otherwise(transform(vd, x =>
            floor(x * lit(127.0d) / col("scale") + lit(0.5d)).cast("byte"))))
  }

  /** Reconstruct a double vector from (qvec, scale). */
  def dequantize(qvec: Column, scale: Column): Column =
    transform(qvec, q => (q.cast("double") * scale) / lit(127.0d))

  // ---------------- product quantization ----------------

  /** Deterministic PQ codebooks: subspace `j`'s codebook is the j-th
    * slice of the evenly-spaced corpus pick `Ivf.staticCentroids`
    * makes (k whole-vector picks, sliced m ways) — training-free and
    * replayable by the SQL oracle, like the IVF quantizer. Returns
    * codebooks(j)(code) = the (dims/m)-dim sub-centroid.
    *
    * Why PQ at 100 TB: a 256-dim float embedding is 1 KB/vector —
    * 100 B vectors don't fit anything; PQ stores m single-byte-ish
    * codes (16-64 B) and searches with table-lookup (ADC) distances,
    * the standard billion-scale ANN memory layout (Jégou et al.,
    * "Product Quantization for Nearest Neighbor Search", TPAMI 2011).
    */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int): Array[Array[Array[Double]]] = {
    val picks = Ivf.staticCentroids(corpus, idCol, vecCol, k)
    val dims = picks.head.length
    require(m >= 1 && dims % m == 0,
      s"dims=$dims must divide into m=$m subspaces")
    val sub = dims / m
    Array.tabulate(m)(j => picks.map(c => c.slice(j * sub, (j + 1) * sub)))
  }

  /** The per-subspace (subspace, code, d) assignment structs, with
    * each subvector materialized ONCE per row (referencing a slice
    * from inside the k-centroid struct-min would re-slice per
    * centroid). Shared by encode and profile so they cannot drift.
    *
    * Assignment runs on the ×10⁶-per-coordinate integer grid (see
    * Ivf.gridVec): the distance is an integer-valued double, so both
    * the argmin (codes) and the profile's scatter sum are
    * cross-engine exact — the oracle replays the same arithmetic
    * bit-for-bit. PipelineSpec pins that the grid argmin picks the
    * same codes as the double-distance argmin on the fixture.
    */
  private def withSubAssignments(df: DataFrame, vecCol: String,
      codebooks: Array[Array[Array[Double]]])(
      finish: (DataFrame, Seq[Column]) => DataFrame): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val based = df.withColumn("__qv", Ivf.gridVec(col(vecCol)))
    val sliced = (0 until m).foldLeft(based) { (acc, j) =>
      acc.withColumn(s"__sv$j", slice(col("__qv"), j * sub + 1, sub))
    }
    val assigns = (0 until m).map(j =>
      Ivf.nearestCellStruct(col(s"__sv$j"),
        codebooks(j).map(Ivf.gridCentroid)))
    finish(sliced, assigns)
  }

  /** PQ-encode: adds `codes array<int>`, one nearest-sub-centroid
    * code per subspace — map-only, one pass, no shuffle. Downstream
    * storage/search carries m small ints instead of dims floats.
    */
  def pqEncode(df: DataFrame, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    pqEncodeWithGrid(df, vecCol, codebooks).drop("__grid")

  /** [[pqEncode]], retaining the ×10⁶ grid vector as `__grid`: a
    * caller that also needs a coarse-cell assignment on the SAME grid
    * (IVFADC) reuses it instead of re-gridding the corpus — the
    * per-coordinate floor transform is the scan's dominant per-row
    * cost, and Catalyst cannot share it across the projection
    * boundary once dropped.
    */
  def pqEncodeWithGrid(df: DataFrame, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    withSubAssignments(df, vecCol, codebooks) { (sliced, assigns) =>
      sliced.withColumn("codes",
          array(assigns.map(_.getField("j")): _*))
        .withColumnRenamed("__qv", "__grid")
        .drop(codebooks.indices.map(j => s"__sv$j"): _*)
    }

  /** The m per-subspace ADC distance columns shared by flat ADC and
    * IVFADC: query subvector columns `<qPrefix>j` against the
    * code-picked row of `codebooks(j)` — one place, so a distance fix
    * cannot apply to one search path and silently skip the other.
    */
  private def adcSubDists(qPrefix: String,
      codebooks: Array[Array[Array[Double]]]): Seq[Column] =
    codebooks.indices.map { j =>
      val cb = array(codebooks(j).toIndexedSeq.map(cvec =>
        array(cvec.toIndexedSeq.map(lit): _*)): _*)
      val picked = element_at(cb, element_at(col("codes"), j + 1) + 1)
      aggregate(zip_with(col(s"$qPrefix$j"), picked,
        (a, b) => (a - b) * (a - b)), lit(0.0d), (acc, v) => acc + v)
    }

  /** Per-(subspace, code) codebook profile: member count and the
    * EXACT integer-grid scatter (same ×10⁶-per-coordinate discipline
    * as `Ivf.clusterProfile`; `sum_d12` is in units of 10⁻¹² of the
    * squared distance) — the balance/distortion diagnostic run
    * after building a codebook. Result size = m × k rows.
    */
  def pqProfile(df: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Double]]]): DataFrame =
    withSubAssignments(df, vecCol, codebooks) { (sliced, assigns) =>
      val entries = array(assigns.zipWithIndex.map { case (a, j) =>
        struct(lit(j).as("subspace"), a.getField("j").as("code"),
          a.getField("d").as("d"))
      }: _*)
      sliced.select(explode(entries).as("e"))
        .groupBy(col("e.subspace").as("subspace"), col("e.code").as("code"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("e.d").cast("decimal(38,0)")).as("sum_d12"))
    }

  /** ADC (asymmetric distance) top-k over PQ codes: every corpus row
    * costs m sub-distance computations against the query's
    * subvectors — the scan reads CODES (m ints), never the original
    * vectors; queries ride along broadcast. Per-query top-k is the
    * same partial aggregation the brute-force path uses (≤ k rows
    * per query per partition reach the shuffle). Returns
    * (query_id, neighbor_id, adc_dist, rank), nearest first.
    */
  def pqAdcTopK(queries: DataFrame, encoded: DataFrame, idCol: String,
      vecCol: String, codebooks: Array[Array[Array[Double]]],
      k: Int): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val q0 = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qvec"))
    val qs = (0 until m).foldLeft(q0) { (acc, j) =>
      acc.withColumn(s"__qv$j", transform(
        slice(col("qvec"), j * sub + 1, sub), x => x.cast("double")))
    }
    val c = encoded.select(col(idCol).as("neighbor_id"), col("codes"))
    val subDists = adcSubDists("__qv", codebooks)
    val scored = broadcast(qs).join(c,
        col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (-subDists.reduce(_ + _)).as("cosine"))
    Similarity.topKPerQuery(scored, k)
      .select(col("query_id"), col("neighbor_id"),
        (-col("cosine")).as("adc_dist"), col("rank"))
  }

  /** IVFADC (Jégou et al., TPAMI 2011, §IV): the coarse quantizer
    * prunes the corpus to `nprobe` probed cells per query, and ADC
    * reranks INSIDE the probed cells from PQ codes alone. This is the
    * composition [[pqAdcTopK]] deliberately skips: flat ADC pays a
    * full-corpus code scan per query (a broadcast NLJ), the right
    * baseline but not the billion-scale layout — here the scan
    * becomes an EQUI-JOIN on cell id, so a query touches ~nprobe/nlist
    * of the corpus and the join parallelizes by cell like any other
    * key join. Corpus-side storage is (id, cell, codes): 4+4m bytes a
    * row, never the vectors.
    *
    * Every distance (coarse assignment, probe order, ADC) runs on the
    * ×10⁶-per-coordinate integer grid, so cells, codes, candidate
    * sets AND ranks are cross-engine exact — the oracle replays the
    * whole index from SQL. `adc_d12` is the integer squared ADC
    * distance in 10⁻¹² units (long); ranks ascend by (adc_d12,
    * neighbor_id). Per-query top-k is the same partial aggregation
    * as the brute path (≤ k rows per query per partition shuffle).
    */
  def ivfAdcTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, centroids: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]], k: Int,
      nprobe: Int): DataFrame = {
    val m = codebooks.length
    val sub = codebooks(0)(0).length
    val gcents = centroids.map(Ivf.gridCentroid)
    val gcbs = codebooks.map(_.map(Ivf.gridCentroid))
    // corpus index: one map pass assigns the coarse cell + m codes —
    // the cell assignment reuses the encoder's own grid vector
    // instead of re-gridding the corpus (the dominant per-row cost)
    val enc = pqEncodeWithGrid(corpus.select(col(idCol), col(vecCol)),
      vecCol, codebooks)
    val cb = enc.select(col(idCol).as("neighbor_id"),
      Ivf.nearestCellStruct(col("__grid"), gcents).getField("j").as("cell"),
      col("codes"))
    // queries: gridded subvectors ride along the broadcast; probed
    // cells explode into (query, cell) rows for the equi-join
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("__gq", Ivf.gridVec(col("qvec")))
    val qs = (0 until m).foldLeft(q0) { (acc, j) =>
        acc.withColumn(s"__gq$j", slice(col("__gq"), j * sub + 1, sub))
      }
      .withColumn("cell", explode(Ivf.probeCells(col("__gq"), gcents, nprobe)))
      .drop("qvec", "__gq")
    val subDists = adcSubDists("__gq", gcbs)
    // each neighbor lives in exactly ONE cell and probed cells are
    // distinct, so (query, neighbor) appears at most once — no dedup
    val scored = broadcast(qs).join(cb, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (-subDists.reduce(_ + _)).as("cosine"))
    Similarity.topKPerQuery(scored, k)
      .select(col("query_id"), col("neighbor_id"),
        (-col("cosine")).cast("long").as("adc_d12"), col("rank"))
  }

  /** Quantize→dequantize fidelity: cosine between the original and
    * the reconstructed vector (≈0.999+ for 64-dim unit-ish data).
    */
  def fidelity(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    // materialize the cast vector, the scale and the reconstruction
    // ONCE per row: referencing the absMax fold from inside the
    // per-element lambda re-runs the whole 64-element fold per
    // element (O(dims²) per row — measured ~50x slowdown on the
    // benched entry before this was lifted out)
    val vd = transform(col(vecCol), x => x.cast("double"))
    val dv = transform(col("__vd"), x =>
      (floor(x * lit(127.0d) / col("scale") + lit(0.5d)) * col("scale"))
        / lit(127.0d))
    // composed cosine: the native expression is array<float>-only,
    // and the reconstructed vector is array<double>; the composed fold
    // is bit-identical (PipelineSpec asserts so)
    df.withColumn("__vd", vd)
      .withColumn("scale", absMax(col("__vd")))
      .withColumn("__dv", dv)
      .select(col(idCol), col("scale"),
        Similarity.cosineComposed(col(vecCol), col("__dv")).as("fidelity"))
  }
}
