package graft

import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis

/** Behavior specs for the tokenizer-training operators (BPE learn /
  * encode). Cross-engine value equality is the gate's job
  * (bp2/bp3 oracle entries); these pin the algorithmic semantics:
  * the distributed and driver-local learners agree merge-for-merge,
  * the classic Sennrich example learns the textbook merges, and the
  * boundary-consuming left-to-right merge application is exactly the
  * documented (and oracle-replayed) semantics.
  */
class TrainingOpsSpec extends SparkTestBase {

  private def docsOf(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("bpeLearn reproduces the textbook low/lower merges") {
    val df = docsOf("low low low lower")
    val merges = TextAnalysis.bpeLearn(df, "text", rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(merges.toSeq === Seq(
      (1, "l", "o", "lo", 4L),
      (2, "lo", "w", "low", 4L),
      (3, "low", "</w>", "low</w>", 3L)))
  }

  test("distributed and driver-local learners agree merge-for-merge") {
    val df = Tables.load(spark, sf, "documents")
    val dist = TextAnalysis.bpeLearn(df, "text", rounds = 8)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val local = TextAnalysis.bpeLearnLocal(df, "text", rounds = 8)
    assert(dist === local)
  }

  test("merge application consumes the shared boundary space (run semantics)") {
    // "aaaa" → "a a a a </w>"; round 1 merges (a,a). Left-to-right
    // non-overlapping with boundary consumption yields "aa a a </w>"
    // (4 symbols) — NOT the fixpoint "aa aa </w>" (3 symbols). The
    // encode fertility discriminates the two.
    val df = docsOf("aaaa").withColumn("src", lit("s"))
    val enc = TextAnalysis.bpeEncode(df, "src", "text", rounds = 1)
      .collect()
    assert(enc.length === 1)
    val r = enc.head
    assert(r.getAs[Long]("n_words") === 1L)
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("fert_ppm") === 4000000L)
  }

  test("bpeEncode fertility is non-increasing in merge rounds") {
    val df = Tables.load(spark, sf, "documents")
    def totalTokens(rounds: Int): Long =
      TextAnalysis.bpeEncode(df, "source", "text", rounds = rounds)
        .agg(sum("n_tokens")).collect().head.getLong(0)
    val t1 = totalTokens(1)
    val t8 = totalTokens(8)
    assert(t8 <= t1, s"more merges must not add tokens: $t8 > $t1")
    // every merge round strictly fuses the corpus's most frequent
    // pair, so on a natural fixture the total must actually drop
    assert(t8 < t1)
  }

  test("gramSums matches hand-computed moments and is shard-invariant") {
    import spark.implicits._
    val df = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    def rows(shards: Int) =
      pipeline.Pca.gramSums(df, "vec_id", "embedding", dim = 2,
        shards = shards)
        .collect().map(r => (r.getInt(0), r.getInt(1),
          r.getDecimal(2).longValueExact(), r.getDecimal(3).longValueExact(),
          r.getDecimal(4).longValueExact(), r.getDecimal(5).longValueExact()))
        .toSeq
    val expected = Seq(
      (0, 0, 2L, 4000000L, 4000000L, 10000000000000L),
      (0, 1, 2L, 4000000L, 6000000L, 14000000000000L),
      (1, 1, 2L, 6000000L, 6000000L, 20000000000000L))
    assert(rows(1) === expected)
    assert(rows(7) === expected)
  }

  test("gramSums drops malformed-length vectors instead of crashing") {
    import spark.implicits._
    val df = Seq((0L, Array(1.0f, 2.0f)), (1L, Array(9.0f)))
      .toDF("vec_id", "embedding")
    val out = pipeline.Pca.gramSums(df, "vec_id", "embedding", dim = 2)
      .collect()
    assert(out.length === 3)
    assert(out.forall(_.getDecimal(2).longValueExact() == 1L))
  }

  test("power iteration on the fixture covariance: eigenpair + projection variance") {
    val dim = 64
    val embs = Tables.load(spark, sf, "embeddings")
    val gram = pipeline.Pca.gramSums(embs, "vec_id", "embedding", dim)
      .localCheckpoint(true)
    val cov = pipeline.Pca.covarianceMatrix(gram, dim)
    // symmetric by construction; dominant eigenpair via power iteration
    val (lambda, v) = pipeline.Pca.powerIteration(cov)
    val maxDiag = (0 until dim).map(i => cov(i)(i)).max
    assert(lambda >= maxDiag - 1e-12,
      s"top eigenvalue $lambda below max diagonal $maxDiag")
    val residual = (0 until dim).map { i =>
      val cvi = (0 until dim).map(j => cov(i)(j) * v(j)).sum
      math.abs(cvi - lambda * v(i))
    }.max
    assert(residual <= 1e-6 * math.max(lambda, 1e-12),
      s"Rayleigh residual $residual too large for lambda $lambda")
    // projecting the corpus onto the component reproduces the
    // eigenvalue as the population variance of the scores
    val n = gram.select(max(col("n").cast("long"))).collect().head.getLong(0)
    val mean = new Array[Double](dim)
    gram.filter(col("i") === col("j")).collect().foreach { r =>
      mean(r.getInt(0)) = r.getDecimal(3).doubleValue() / n / 1e6
    }
    val scores = pipeline.Pca.project(embs, "vec_id", "embedding", v, mean)
      .select(col("score")).collect().map(_.getDouble(0))
    val m0 = scores.sum / scores.length
    val varProj = scores.map(x => (x - m0) * (x - m0)).sum / scores.length
    assert(math.abs(varProj - lambda) <= 1e-3 * lambda,
      s"projection variance $varProj != eigenvalue $lambda")
  }

  test("cms sketch lane totals equal the stream size") {
    val events = Tables.load(spark, sf, "events")
    val n = events.count()
    val laneTotals = pipeline.Sketch.cmsSketch(events, "user_id",
      depth = 4, width = 32)
      .groupBy("lane").agg(sum("cnt").as("total"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(laneTotals.keySet === Set(0, 1, 2, 3))
    assert(laneTotals.values.forall(_ == n),
      s"every lane must hold the full stream count $n: $laneTotals")
  }

  test("cms estimates dominate exact counts; narrow sketches overcount more") {
    val events = Tables.load(spark, sf, "events")
    def report(width: Int) =
      pipeline.Sketch.cmsHeavyHitters(events, "user_id",
        depth = 4, width = width, topK = 10)
        .collect().map(r => (r.getAs[Long]("exact_cnt"),
          r.getAs[Long]("cms_est"), r.getAs[Long]("overcount")))
    val narrow = report(8)
    val wide = report(4096)
    assert(narrow.forall { case (ex, est, over) =>
      est >= ex && over == est - ex })
    assert(wide.forall { case (ex, est, over) => est >= ex })
    // 150 keys into 8×4 counters must collide; into 4096×4 they
    // mostly don't — aggregate overcount is ordered accordingly
    assert(narrow.map(_._3).sum > wide.map(_._3).sum)
  }

  test("bpeLearn validates rounds") {
    val df = docsOf("a")
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeLearn(df, "text", rounds = 0)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeLearn(df, "text", rounds = 65)
    }
  }
}
