package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column, built the
  * way a 100 TB corpus forces: the ONLY corpus-linear work is a
  * single one-pass Gram/moment aggregation (a typed Aggregator whose
  * state is the d(d+1)/2 upper-triangle plus the d coordinate sums —
  * a few KB per partition, partial-aggregated map-side); the
  * eigen-decomposition runs on the driver over the resulting d×d
  * matrix (trivial at any corpus size — the matrix does not grow with
  * rows), and the projection back over the corpus is map-only.
  *
  * Exactness: coordinates are quantized to the ×10⁶ integer grid
  * (one IEEE multiply+add+floor per value, the Ivf/Quantize
  * discipline) BEFORE any product, so every accumulated term is an
  * exact long and the final sums are fold-order- and cross-engine-
  * identical — the pc1 oracle replays them value-for-value.
  *
  * Overflow budget: |q| ≤ 10⁶·max|x|; per-shard products q_i·q_j sum
  * in longs, so a shard holds up to 2⁶³ / (10⁶·max|x|)² rows —
  * ~9.2 M rows per shard at max|x| = 1. The shard count is the
  * scale knob (shards ≈ rows / 10⁶ keeps three orders of headroom);
  * cross-shard reduction is DECIMAL(38,0), exact at any scale.
  */
object Pca {

  /** One-pass Gram accumulator over gridded coordinate arrays.
    * State layout: [n, s_0..s_{d-1}, s_ij for 0 ≤ i ≤ j < d
    * row-major]. Input rows are (shard, q) pairs; the shard key is
    * consumed by groupByKey, the Aggregator ignores it.
    */
  final class GramAgg(d: Int)
      extends Aggregator[(Int, Array[Long]), Array[Long], Array[Long]] {
    private val size = 1 + d + d * (d + 1) / 2
    def zero: Array[Long] = new Array[Long](size)
    def reduce(b: Array[Long], in: (Int, Array[Long])): Array[Long] = {
      val q = in._2
      b(0) += 1L
      var i = 0
      var t = 1 + d
      while (i < d) {
        b(1 + i) += q(i)
        var j = i
        while (j < d) { b(t) += q(i) * q(j); t += 1; j += 1 }
        i += 1
      }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < size) { a(i) += b(i); i += 1 }
      a
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
  }

  /** Exact second-moment sums of the ×10⁶-gridded coordinates: one
    * row per (i, j), i ≤ j, with the vector count `n`, marginal sums
    * `s_i`/`s_j` and the product sum `s_ij`, all DECIMAL(38,0).
    * Rows whose vector length differs from `dim` are dropped (a
    * malformed row must not crash a corpus-scale pass).
    *
    * Plan shape: map-only gridding → groupByKey(shard) with the
    * typed Aggregator (partial agg, `shards` rows out) → posexplode
    * of the per-shard state (shards × d(d+1)/2 rows — thousands, not
    * corpus-sized) → exact decimal reduce per (i, j).
    */
  def gramSums(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      shards: Int = 32): DataFrame = {
    require(dim >= 1 && dim <= 4096, s"gramSums needs 1 <= dim <= 4096, got $dim")
    require(shards >= 1, s"gramSums needs shards >= 1, got $shards")
    val sp = df.sparkSession
    import sp.implicits._
    val ds = df
      .filter(size(col(vecCol)) === lit(dim))
      .select(
        pmod(col(idCol), lit(shards)).cast("int").as("shard"),
        transform(col(vecCol), x =>
          floor(x.cast("double") * lit(1e6d) + lit(0.5d)).cast("long"))
          .as("q"))
      .as[(Int, Array[Long])]
    val perShard = ds.groupByKey(_._1)
      .agg(new GramAgg(dim).toColumn.name("g"))
      .toDF("shard", "g")
    val m = dim * (dim + 1) / 2
    val pairs = for { i <- 0 until dim; j <- i until dim } yield (i, j)
    val iiLit = array(pairs.map(p => lit(p._1)): _*)
    val jjLit = array(pairs.map(p => lit(p._2)): _*)
    perShard
      .select(col("g"), posexplode(slice(col("g"), 2 + dim, m)))
      .select(
        element_at(iiLit, col("pos") + 1).as("i"),
        element_at(jjLit, col("pos") + 1).as("j"),
        col("g").getItem(0).as("n_part"),
        element_at(col("g"), element_at(iiLit, col("pos") + 1) + 2)
          .as("si_part"),
        element_at(col("g"), element_at(jjLit, col("pos") + 1) + 2)
          .as("sj_part"),
        col("col").as("sij_part"))
      .groupBy("i", "j")
      .agg(sum(col("n_part").cast("decimal(38,0)")).as("n"),
        sum(col("si_part").cast("decimal(38,0)")).as("s_i"),
        sum(col("sj_part").cast("decimal(38,0)")).as("s_j"),
        sum(col("sij_part").cast("decimal(38,0)")).as("s_ij"))
      .orderBy("i", "j")
  }

  /** Dense covariance from [[gramSums]] output, grid units undone:
    * cov(i,j) = (s_ij/n − s_i·s_j/n²) / 10¹². Collects d(d+1)/2 rows
    * — bounded by the dimension, never the corpus.
    */
  def covarianceMatrix(gram: DataFrame, dim: Int): Array[Array[Double]] = {
    val c = Array.ofDim[Double](dim, dim)
    gram.select(col("i"), col("j"), col("n").cast("double"),
      col("s_i").cast("double"), col("s_j").cast("double"),
      col("s_ij").cast("double"))
      .collect().foreach { r =>
        val (i, j) = (r.getInt(0), r.getInt(1))
        val n = r.getDouble(2)
        val v = (r.getDouble(5) / n -
          r.getDouble(3) * r.getDouble(4) / (n * n)) / 1e12
        c(i)(j) = v
        c(j)(i) = v
      }
    c
  }

  /** Power iteration for the dominant eigenpair of a small symmetric
    * matrix (driver-side — the d×d covariance, not data).
    */
  def powerIteration(mat: Array[Array[Double]],
      iters: Int = 200): (Double, Array[Double]) = {
    val d = mat.length
    var v = Array.tabulate(d)(i => 1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(d) { i =>
        var s = 0.0; var j = 0
        while (j < d) { s += mat(i)(j) * v(j); j += 1 }
        s
      }
      val norm = math.sqrt(w.map(x => x * x).sum)
      if (norm == 0.0) return (0.0, v)
      v = w.map(_ / norm)
      lambda = norm
      it += 1
    }
    // Rayleigh quotient is the accurate eigenvalue estimate
    val cv = Array.tabulate(d) { i =>
      var s = 0.0; var j = 0
      while (j < d) { s += mat(i)(j) * v(j); j += 1 }
      s
    }
    (v.zip(cv).map { case (a, b) => a * b }.sum, v)
  }

  /** Map-only projection of the corpus onto a driver-held component
    * (mean-centered, original float units). The component is d
    * literals baked into the plan — no join, no shuffle.
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
      component: Array[Double], mean: Array[Double]): DataFrame = {
    val compLit = array(component.toIndexedSeq.map(lit): _*)
    val meanLit = array(mean.toIndexedSeq.map(lit): _*)
    df.select(col(idCol),
      aggregate(
        zip_with(
          zip_with(transform(col(vecCol), x => x.cast("double")),
            meanLit, (x, mu) => x - mu),
          compLit, (xc, w) => xc * w),
        lit(0.0d), (acc, v) => acc + v).as("score"))
  }
}
