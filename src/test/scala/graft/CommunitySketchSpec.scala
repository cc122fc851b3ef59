package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Communities, Sampling, Sketch}

/** Behavior specs for the community-structure operators (label
  * propagation, triangle stats), the HLL distinct sketch, and
  * fractional epoch up-sampling. Cross-engine value equality is the
  * gate's job (lp1/tr1/hl1/up1); these pin the algorithmic
  * semantics: deterministic tie rules, hand-computed counts on
  * closed-form graphs, sketch mergeability/idempotence, and the
  * exact-copy contract of the mixture materialization.
  */
class CommunitySketchSpec extends SparkTestBase {

  private def edgesOf(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toSeq.toDF("id1", "id2")
  }

  // ---------------- label propagation ----------------

  test("LPA round 1 applies the (count DESC, label ASC) tie rule exactly") {
    // path 1-2-3, one round. Node 2's votes: {1, 3, self 2} all count
    // 1 -> tie -> min = 1. Node 1: {2, self 1} -> 1. Node 3: {2, 3} -> 2.
    val labels = Communities.labelPropagation(
      edgesOf((1L, 2L), (2L, 3L)), iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("LPA unifies cliques and keeps disjoint cliques apart") {
    // two 4-cliques joined by nothing: each converges to its min label
    def clique(base: Long) = for {
      i <- 0L to 3L; j <- (i + 1) to 3L
    } yield (base + i, base + j)
    val labels = Communities.labelPropagation(
      edgesOf(clique(10L) ++ clique(20L): _*), iters = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byCommunity = labels.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    assert(byCommunity.toMap ===
      Map(10L -> Set(10L, 11L, 12L, 13L), 20L -> Set(20L, 21L, 22L, 23L)))
  }

  test("LPA is partitioning-invariant (pure function of the round)") {
    val li = Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("id1"), col("l_suppkey").as("id2"))
      .limit(400)
    def run(parts: Int) =
      Communities.labelPropagation(li.repartition(parts), iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1) === run(7))
  }

  test("LPA validates iters") {
    intercept[IllegalArgumentException] {
      Communities.labelPropagation(edgesOf((1L, 2L)), iters = 0)
    }
  }

  // ---------------- triangle stats ----------------

  private def triRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("deg"),
      r.getAs[Long]("tri"), r.getAs[Long]("wedges"),
      r.getAs[Long]("lcc_ppm"))).sortBy(_._1).toSeq

  test("triangle + pendant: hand-computed counts and coefficients") {
    // triangle 1-2-3 with pendant 4 hanging off node 1
    val out = triRows(Communities.triangleStats(
      edgesOf((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))))
    assert(out === Seq(
      (1L, 3L, 1L, 3L, 333333L),
      (2L, 2L, 1L, 1L, 1000000L),
      (3L, 2L, 1L, 1L, 1000000L),
      (4L, 1L, 0L, 0L, 0L)))
  }

  test("K5: every node closes all its wedges; global count is 3 * C(5,3)") {
    val k5 = for { i <- 1L to 5L; j <- (i + 1) to 5L } yield (i, j)
    val out = triRows(Communities.triangleStats(edgesOf(k5: _*)))
    assert(out.forall { case (_, deg, tri, wedges, lcc) =>
      deg == 4L && tri == 6L && wedges == 6L && lcc == 1000000L })
    assert(out.map(_._3).sum === 30L) // 3 x 10 triangles
  }

  test("bipartite graph has zero triangles") {
    val bip = for { i <- 1L to 3L; j <- 10L to 12L } yield (i, j)
    val out = triRows(Communities.triangleStats(edgesOf(bip: _*)))
    assert(out.forall(_._3 == 0L))
    assert(out.forall(_._5 == 0L))
  }

  test("triangleStats collapses duplicates, reverses, and self-loops") {
    val clean = triRows(Communities.triangleStats(
      edgesOf((1L, 2L), (2L, 3L), (1L, 3L))))
    val noisy = triRows(Communities.triangleStats(
      edgesOf((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
        (1L, 3L), (2L, 2L))))
    assert(noisy === clean)
  }

  // ---------------- k-core ----------------

  test("kCore: triangle with a tail peels to the triangle at k = 2") {
    val out = Communities.kCore(
      edgesOf((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    // 5 drops (deg 1), then 4 drops (deg fell to 1): the 2-core is
    // exactly the triangle, every member at in-core degree 2
    assert(out === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("kCore: a path has an empty 2-core; K4 is its own 3-core") {
    assert(Communities.kCore(
      edgesOf((1L, 2L), (2L, 3L), (3L, 4L)), k = 2).count() === 0L)
    val k4 = for { i <- 1L to 4L; j <- (i + 1) to 4L } yield (i, j)
    val out = Communities.kCore(edgesOf(k4: _*), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.length === 4 && out.forall(_._2 == 3L))
  }

  test("kCoreProfile is monotone and idempotent past the fixpoint") {
    // triangle + tail at k = 2: round 0 (5 nodes, 5 edges) ->
    // round 1 drops node 5 -> round 2 drops node 4 -> converged
    val prof = Communities.kCoreProfile(
      edgesOf((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)),
      k = 2, rounds = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(prof === Seq((0, 5L, 5L), (1, 4L, 4L), (2, 3L, 3L),
      (3, 3L, 3L), (4, 3L, 3L), (5, 3L, 3L)))
    val counts = prof.map(_._2)
    assert(counts === counts.sorted.reverse, "peel must be monotone")
  }

  test("kCore validates k and rounds") {
    intercept[IllegalArgumentException] {
      Communities.kCore(edgesOf((1L, 2L)), k = 0)
    }
    intercept[IllegalArgumentException] {
      Communities.kCoreProfile(edgesOf((1L, 2L)), rounds = 0)
    }
  }

  // ---------------- HyperLogLog ----------------

  test("HLL registers are duplicate-insensitive and merge by max") {
    val events = Tables.load(spark, sf, "events")
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketch.hllRegisters(df, "user_id", "event_type")
        .collect().map(r => ((r.getString(0), r.getLong(1)), r.getInt(2)))
        .toMap
    val full = regs(events)
    // inserting everything twice changes nothing (max is idempotent)
    assert(regs(events.unionByName(events)) === full)
    // sketches of disjoint shards merge by per-bucket max
    val even = events.filter(col("event_id") % 2 === 0)
    val odd = events.filter(col("event_id") % 2 === 1)
    val merged = (regs(even).toSeq ++ regs(odd).toSeq)
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(merged === full)
  }

  test("HLL estimate lands near the exact count and uses linear counting when due") {
    val events = Tables.load(spark, "/root/testdata/sf0.01", "events")
    val rows = Sketch.hllDistinctReport(events, "user_id", "event_type")
      .collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt").toDouble
      val est = r.getAs[Double]("hll_est")
      val zeros = r.getAs[Long]("zeros")
      assert(math.abs(est - exact) <= 0.30 * exact,
        s"${r.getString(0)}: est $est vs exact $exact")
      // m = 64 against ~150 distinct keys: the small-range branch is
      // the one under test — real zero buckets must exist
      if (zeros > 0 && est <= 160.0)
        assert(math.abs(est - 64.0 * math.log(64.0 / zeros)) < 1e-9)
    }
  }

  test("HLL validates p and pins alpha to m = 64 in the report") {
    intercept[IllegalArgumentException] {
      Sketch.hllRegisters(Tables.load(spark, sf, "events"),
        "user_id", "event_type", p = 1)
    }
    intercept[IllegalArgumentException] {
      Sketch.hllDistinctReport(Tables.load(spark, sf, "events"),
        "user_id", "event_type", p = 8)
    }
  }

  // ---------------- epoch up-sampling ----------------

  test("integer epoch factor yields exactly that many copies per doc") {
    val docs = Tables.load(spark, sf, "documents")
    val n = docs.count()
    val out = Sampling.epochUpsample(docs, "doc_id", "source",
      Map.empty, defaultEpochs = 2.0)
    assert(out.count() === 2 * n)
    val perDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("c"), max("epoch_copy").as("m"))
      .collect()
    assert(perDoc.forall(r => r.getLong(1) == 2L && r.getInt(2) == 2))
  }

  test("fractional factor hits the expected rate and is deterministic") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val n = docs.count().toDouble
    def run(parts: Int) = Sampling.epochUpsample(
      docs.repartition(parts), "doc_id", "source",
      Map.empty, defaultEpochs = 0.5)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    val once = run(3)
    assert(once === run(11), "kept multiset must not depend on partitioning")
    assert(once.forall(_._2 == 1), "factor < 1 can only yield copy 1")
    assert(math.abs(once.size - 0.5 * n) <= 0.1 * n,
      s"kept ${once.size} of $n at rate 0.5")
  }

  test("factor 0 drops the source; unmapped sources get the default") {
    val docs = Tables.load(spark, sf, "documents")
    val out = Sampling.epochUpsample(docs, "doc_id", "source",
      Map("src0" -> 0.0, "src1" -> 3.0), defaultEpochs = 1.0)
    val bySrc = out.groupBy("source").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(!bySrc.contains("src0"))
    val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(bySrc("src1") === 3 * counts("src1"))
    assert(bySrc("src2") === counts("src2"))
  }

  test("shuffleShards: total per-shard ordinals, reproducible, seed-sensitive") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    def run(seed: Long, parts: Int) = Sampling.shuffleShards(
      docs.repartition(parts), Seq("doc_id"), nShards = 8, seed = seed)
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val a = run(1L, 3)
    assert(a === run(1L, 9), "order must not depend on partitioning")
    assert(a !== run(2L, 3), "a new seed must reshuffle")
    // ordinals are 1..n(shard) with no gaps or duplicates
    a.groupBy(_._2).foreach { case (shard, rows) =>
      val ps = rows.map(_._3).toSeq.sorted
      assert(ps === (1 to ps.length), s"shard $shard ordinals broken")
    }
    // hash-uniform shards: no empty shard on 500 rows over 8 shards
    assert(a.groupBy(_._2).size === 8)
  }

  test("shuffleShards windows per shard, one exchange, and validates args") {
    val docs = Tables.load(spark, sf, "documents")
    val p = Sampling.shuffleShards(docs, Seq("doc_id"), 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("Window"), p.take(2000))
    // partitioned by the shard key — never a global (empty-partition)
    // window over the whole corpus
    assert("hashpartitioning\\(shard".r.findFirstIn(p).isDefined
      || p.contains("hashpartitioning(shard"), p.take(2000))
    intercept[IllegalArgumentException] {
      Sampling.shuffleShards(docs, Seq.empty, 8)
    }
    intercept[IllegalArgumentException] {
      Sampling.shuffleShards(docs, Seq("doc_id"), 0)
    }
  }

  // ---------------- term-distribution drift ----------------

  private def srcDocs(src: String, texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t, src) }
      .toDF("doc_id", "text", "source")
  }

  test("termDrift of identical snapshots is exactly zero") {
    val v = Tables.load(spark, sf, "documents")
      .select("doc_id", "text", "source")
    val rows = pipeline.TextAnalysis.termDrift(v, v, "source", "text")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("kl_nnats") === 0L)
      assert(r.getAs[Long]("new_terms") === 0L)
      assert(r.getAs[Long]("dropped_terms") === 0L)
      assert(r.getAs[Long]("tokens_v1") === r.getAs[Long]("tokens_v2"))
    }
  }

  test("termDrift matches the hand formula and counts new/dropped terms") {
    val v1 = srcDocs("s", "a a b")
    val v2 = srcDocs("s", "a b b")
    val r = pipeline.TextAnalysis.termDrift(v1, v2, "source", "text")
      .collect().head
    assert(r.getAs[Long]("tokens_v1") === 3L)
    assert(r.getAs[Long]("tokens_v2") === 3L)
    assert(r.getAs[Long]("vocab_union") === 2L)
    // replicate the documented expression tree exactly
    def contrib(c1: Long, c2: Long): Long = {
      val p = (c1 + 1.0) / (3 + 2); val q = (c2 + 1.0) / (3 + 2)
      math.floor(q * math.log(q / p) * 1e9).toLong
    }
    assert(r.getAs[Long]("kl_nnats") === contrib(2, 1) + contrib(1, 2))
    assert(r.getAs[Long]("kl_nnats") > 0L, "a real shift must score > 0")
    val r2 = pipeline.TextAnalysis.termDrift(
      srcDocs("s", "a b"), srcDocs("s", "a z"), "source", "text")
      .collect().head
    assert(r2.getAs[Long]("new_terms") === 1L)     // z
    assert(r2.getAs[Long]("dropped_terms") === 1L) // b
  }

  test("termDrift grid margins on the fixture are far from floor boundaries") {
    // the cross-engine risk is ln's <= 1 ulp; on the 1e9 grid that is
    // ~1e-7 grid units. Attest the fixture's contributions never sit
    // within 1e-4 of an integer boundary (the rr1/ir1 pattern).
    val v1 = Tables.load(spark, sf, "documents")
      .select("doc_id", "text", "source")
    val v2 = v1.filter(pmod(col("doc_id"), lit(19)) =!= 0)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(13)) === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text")).as("text"),
        col("source"))
    def toks(df: org.apache.spark.sql.DataFrame, v: Int) = df
      .select(col("source"), explode(split(col("text"), " +")).as("term"))
      .filter(length(col("term")) >= 1).withColumn("__v", lit(v))
    val counts = toks(v1, 1).unionByName(toks(v2, 2))
      .groupBy("source", "term")
      .agg(sum(when(col("__v") === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col("__v") === 2, 1L).otherwise(0L)).as("c2"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    val tots = counts.groupBy(_._1).map { case (s, rs) =>
      s -> ((rs.map(_._2).sum, rs.map(_._3).sum, rs.length.toLong)) }
    val margins = counts.map { case (s, c1, c2) =>
      val (t1, t2, v) = tots(s)
      val p = (c1 + 1.0) / (t1 + v); val q = (c2 + 1.0) / (t2 + v)
      val g = q * math.log(q / p) * 1e9
      val frac = g - math.floor(g)
      math.min(frac, 1.0 - frac)
    }
    assert(margins.nonEmpty)
    assert(margins.min > 1e-4,
      s"worst grid margin ${margins.min} too close to a boundary")
  }

  test("epochUpsample rejects negative and absurd factors") {
    val docs = Tables.load(spark, sf, "documents")
    intercept[IllegalArgumentException] {
      Sampling.epochUpsample(docs, "doc_id", "source", Map("src0" -> -0.5))
    }
    intercept[IllegalArgumentException] {
      Sampling.epochUpsample(docs, "doc_id", "source",
        Map("src0" -> 5000.0))
    }
  }
}
