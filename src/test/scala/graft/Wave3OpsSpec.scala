package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{Privacy, Retrieval, Similarity, TextAnalysis, Temporal, Web}

/** Hand-computed behavior + plan-shape pins for the round-10 wave-3/4
  * operators: time-series gap fill, k-anonymity audit, inverted
  * index (+ incremental merge), script profile, URL canonicalization,
  * reciprocal-rank fusion, logit-classifier inference.
  */
class Wave3OpsSpec extends SparkTestBase {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def ts(day: Int, h: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-${day}%02d $h%02d:30:00")

  test("resampleFill: bucket max, gap forward-fill, per-key spine bounds") {
    import spark.implicits._
    val ev = Seq(
      (1L, ts(1, 9), 2.0), (1L, ts(1, 17), 5.0), // day0: two obs → max 5.0
      (1L, ts(3, 12), 3.0),                      // day2; day1 is a gap
      (2L, ts(10, 12), 7.0)                      // lone obs → 1-row spine
    ).toDF("user_id", "ts", "value")
    val got = Temporal.resampleFill(ev, "user_id", "ts", "value", 86400L)
      .orderBy("user_id", "bucket_ts")
      .select("user_id", "val_filled", "n_obs").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, 5.0, 2L), // day0 observed, max of the two values
      (1L, 5.0, 0L), // day1 gap carries day0 forward
      (1L, 3.0, 1L), // day2 observed
      (2L, 7.0, 1L)))
    // user 2's spine is one bucket — never the global day range
  }

  test("resampleFill plan: partial agg + one keyed window, no cartesian") {
    val p = plan(Temporal.resampleFill(
      Tables.load(spark, sf, "events"), "user_id", "ts", "value", 86400L))
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("partial_max") || p.contains("partial_"), p.take(800))
    assert(p.contains("Window"), p.take(800))
  }

  test("kAnonymityProfile: class sizes, level, risky rows below k") {
    import spark.implicits._
    // stratum A: QI classes {x:3 rows, y:1 row}; stratum B: {z:2 rows}
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "x"), ("A", "y"),
      ("B", "z"), ("B", "z")
    ).toDF("seg", "qi")
    val got = Privacy.kAnonymityProfile(df, col("seg"), Seq(col("qi")), 2L)
      .orderBy("stratum").collect()
    val a = got(0)
    assert(a.getString(0) == "A" && a.getLong(1) == 2 && // 2 classes
      a.getLong(2) == 1 &&                               // k level = 1
      a.getLong(3) == 1 && a.getLong(4) == 1 &&          // 1 risky class/row
      a.getLong(5) == 4 && a.getLong(6) == 2500)         // 1/4 = 2500bp
    val b = got(1)
    assert(b.getString(0) == "B" && b.getLong(2) == 2 &&
      b.getLong(3) == 0 && b.getLong(4) == 0 && b.getLong(6) == 0)
  }

  test("kAnonymityProfile plan: two plain aggs, no Expand, no join") {
    val p = plan(Privacy.kAnonymityProfile(
      Tables.load(spark, sf, "customer"), col("c_mktsegment"),
      Seq(col("c_nationkey")), 5L))
    assert(!p.contains("Expand"), p.take(800))
    assert(!p.contains("Join"), p.take(800))
  }

  test("learnedSparseTopK: tf x weight scoring, broadcast model, equi-join plan") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark join"),  // spark tf=2, join tf=1
      (2L, "join filter"),
      (3L, "nothing relevant")
    ).toDF("doc_id", "text")
    val weights = Seq(("spark", 100L), ("join", 10L))
      .toDF("term", "w_milli")
    val got = Retrieval.learnedSparseTopK(docs, "doc_id", "text",
      Seq(0L -> "spark join"), weights, topK = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc1: 2*100 + 1*10 = 210 over 2 terms; doc2: 1*10; doc3 absent
    assert(got.toSeq == Seq((1L, 210L, 2L), (2L, 10L, 1L)))
    val p = Retrieval.learnedSparseTopK(docs, "doc_id", "text",
      Seq(0L -> "spark"), weights, topK = 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(600))
  }

  test("dpCountRelease: seeded noise is pinned, bounded, never leaks the count") {
    import spark.implicits._
    val df = (Seq.fill(40)("A") ++ Seq.fill(7)("B") ++ Seq("C"))
      .toDF("seg")
    def run(eps: Long, seed: Long): Map[String, (Long, Long)] =
      Privacy.dpCountRelease(df, col("seg"), eps, seed).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val r1 = run(500L, 7L)
    // same (seed, stratum) → the SAME release, any number of reruns
    assert(run(500L, 7L) == r1)
    // schema carries eps, never the true count; release is clamped ≥ 0
    assert(r1.values.forall { case (e, rel) => e == 500L && rel >= 0L })
    // Laplace(b = 1/ε = 2) over the ppm grid: |noise| ≤ b·ln(1e6)
    // counts = ~27.6 counts = 27631 milli
    val bound = math.ceil(2000.0 * math.log(1e6)).toLong + 1
    assert(math.abs(r1("A")._2 - 40000L) <= bound &&
      math.abs(r1("B")._2 - 7000L) <= bound)
    // a different seed draws different noise on at least one stratum
    val r2 = run(500L, 8L)
    assert(r1 != r2)
    // plan: one agg + map-only projection, no window/join
    val p = plan(Privacy.dpCountRelease(df, col("seg"), 500L, 7L))
    assert(!p.contains("Window") && !p.contains("Join"), p.take(600))
  }

  test("invertedIndex: sorted gap encoding with max_doc checksum") {
    import spark.implicits._
    val docs = Seq(
      (10L, "alpha beta"), (3L, "alpha gamma"), (7L, "ALPHA, beta!"),
      (1L, "beta beta beta"), (2L, "xx")) // xx too short; repeats dedup
      .toDF("doc_id", "text")
    val got = Retrieval.invertedIndex(docs, "doc_id", "text",
      minDf = 2L, maxDf = 10L).orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2),
        r.getLong(3))).toSeq
    assert(got == Seq(
      // alpha in docs 3,7,10 → gaps 3,4,3; beta in 1,7,10 → 1,6,3
      ("alpha", 3L, Seq(3L, 4L, 3L), 10L),
      ("beta", 3L, Seq(1L, 6L, 3L), 10L)))
    // gamma has df 1 < minDf — pruned hapax
  }

  test("invertedIndex plan: distinct + one term-keyed shuffle, no NLJ") {
    val p = plan(Retrieval.invertedIndex(
      Tables.load(spark, sf, "documents"), "doc_id", "text"))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("scriptProfile: character classes count exactly, no explode") {
    import spark.implicits._
    val df = Seq(("en", "Ab1 cé!")).toDF("lang", "text")
    val r = TextAnalysis.scriptProfile(df, "lang", "text").collect()(0)
    // "Ab1 cé!": 7 chars, letters A,b,c = 3 (é is non-ASCII), digit 1,
    // one space, non-printable é = 1
    assert(r.getLong(1) == 1 && r.getLong(2) == 7 && r.getLong(3) == 3 &&
      r.getLong(4) == 1 && r.getLong(5) == 1 && r.getLong(6) == 1)
    val p = plan(TextAnalysis.scriptProfile(
      Tables.load(spark, sf, "documents"), "lang", "text"))
    assert(!p.contains("Generate"), p.take(800)) // no per-char explode
  }

  test("scriptProfile: supplementary-plane text counts code points") {
    import spark.implicits._
    // "a😀b": U+1F600 is outside the BMP (2 UTF-16 code units, 4
    // UTF-8 bytes, 1 code point). Spark's length() is
    // UTF8String.numChars — code points — the same unit DuckDB's
    // length() uses, so n_chars/non_printable agree cross-engine even
    // off the BMP (the Latin-only gate fixture can't catch this; this
    // pin can).
    val df = Seq(("en", "a😀b")).toDF("lang", "text")
    val r = TextAnalysis.scriptProfile(df, "lang", "text").collect()(0)
    assert(r.getLong(2) == 3, s"n_chars: ${r.getLong(2)}")       // not 4
    assert(r.getLong(3) == 2, s"letters: ${r.getLong(3)}")       // a, b
    assert(r.getLong(6) == 1, s"non_printable: ${r.getLong(6)}") // 😀
  }

  test("mergeIndexes: only-old and only-new terms pass through unchanged") {
    import spark.implicits._
    val d = Seq(
      (1L, "oldterm both"), (2L, "oldterm"), (5L, "both"), // old batch
      (10L, "newterm both"), (12L, "newterm")              // new (ids above)
    ).toDF("doc_id", "text")
    def idx(df: org.apache.spark.sql.DataFrame) =
      Retrieval.invertedIndex(df, "doc_id", "text",
        minDf = 1L, maxDf = Long.MaxValue)
    val merged = Retrieval.mergeIndexes(
      idx(d.filter(col("doc_id") < 10)), idx(d.filter(col("doc_id") >= 10)))
    val got = merged.orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2), r.getLong(3)))
    assert(got.toSeq == Seq(
      // both: old 1,5 + new 10 → gaps 1,4,5 (boundary gap 10-5)
      ("both", 3L, Seq(1L, 4L, 5L), 10L),
      // newterm: new-only postings pass through verbatim
      ("newterm", 2L, Seq(10L, 2L), 12L),
      // oldterm: old-only postings pass through verbatim
      ("oldterm", 2L, Seq(1L, 1L), 2L)))
    val full = idx(d).orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2), r.getLong(3)))
    assert(got.toSeq == full.toSeq) // merge ≡ rebuild on all three cases
  }

  test("invertedIndex bands BEFORE the list fold; resampleFill floors pre-1970") {
    import spark.implicits._
    // band-before-fold: the hot term never reaches collect_list — its
    // absence from the output with maxDf below its df proves the
    // filter sits upstream of the fold (plan also shows the join)
    val d = Seq((1L, "hot rare"), (2L, "hot"), (3L, "hot")).toDF("id", "t")
    val idx = Retrieval.invertedIndex(d, "id", "t",
      minDf = 1L, maxDf = 2L)
    assert(idx.collect().map(_.getString(0)).toSeq == Seq("rare"))
    // the band is a join upstream of the window+fold, not a filter on
    // the folded result: the df join sits BELOW the Window in the tree
    // (plans print root-first, so Window's index is smaller)
    val p = plan(idx)
    assert(p.contains("Window") && p.contains("Join") &&
      p.indexOf("Window") < p.indexOf("Join"), p.take(1200))
    // pre-1970 day bucketing: floor division, matching DuckDB's `//`
    // and the streaming twin's Math.floorDiv — 1969-12-31 12:00 UTC
    // must land on day -1 (1969-12-31), not day 0
    val ev = Seq((1L, new java.sql.Timestamp(-43200000L), 2.5))
      .toDF("user_id", "ts", "value")
    val got = Temporal.resampleFill(ev, "user_id", "ts", "value", 86400L)
      .collect()(0)
    assert(got.getTimestamp(1).getTime == -86400000L, got.toString)
  }

  test("mergeIndexes stitches gap lists across the batch boundary") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta"), (2L, "alpha"), (5L, "beta gamma"),
      (10L, "alpha gamma"), (12L, "gamma")
    ).toDF("doc_id", "text")
    def idx(df: org.apache.spark.sql.DataFrame) =
      Retrieval.invertedIndex(df, "doc_id", "text",
        minDf = 1L, maxDf = Long.MaxValue)
    val merged = Retrieval.mergeIndexes(
      idx(d.filter(col("doc_id") < 10)), idx(d.filter(col("doc_id") >= 10)))
      .orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2), r.getLong(3)))
    assert(merged.toSeq == Seq(
      // alpha: old 1,2 + new 10 → gaps 1,1,8 (boundary gap 10-2)
      ("alpha", 3L, Seq(1L, 1L, 8L), 10L),
      // beta: old-only 1,5
      ("beta", 2L, Seq(1L, 4L), 5L),
      // gamma: old 5 + new 10,12 → 5, 5, 2
      ("gamma", 3L, Seq(5L, 5L, 2L), 12L)))
    val full = idx(d).orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2), r.getLong(3)))
    assert(merged.toSeq == full.toSeq) // merge ≡ rebuild
  }

  test("rrfFuse: exact integer contributions, union semantics, tie on doc id") {
    import spark.implicits._
    val lex = Seq((0L, 100L, 1), (0L, 200L, 2)).toDF("q", "d", "rank")
    val sem = Seq((0L, 200L, 1), (0L, 300L, 2)).toDF("q", "d", "rank")
    val got = Retrieval.rrfFuse(Seq(lex, sem), "q", "d", "rank",
      kRrf = 60, topK = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val c1 = 1000000000L / 61 // rank 1
    val c2 = 1000000000L / 62 // rank 2
    assert(got.toSeq == Seq(
      (200L, c1 + c2, 2L, 1), // in both lists → wins
      (100L, c1, 1L, 2),      // single list, rank 1
      (300L, c2, 1L, 3)))
  }

  test("logitScore: broadcast model join, exact long dot product") {
    import spark.implicits._
    val feats = Seq((1L, 0L, 2L), (1L, 1L, 1L), (2L, 1L, 3L))
      .toDF("doc_id", "bucket", "n_hits")
    val w = Seq((0L, 10L), (1L, -4L)).toDF("bucket", "w_milli")
    val got = pipeline.Features.logitScore(feats, "doc_id", w)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      (1L, 2L * 10 - 4, 2L, true), (2L, -12L, 1L, false)))
    val p = plan(pipeline.Features.logitScore(feats, "doc_id", w))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("lDiversityProfile: homogeneous class flagged despite its size") {
    import spark.implicits._
    // stratum A, one big QI class, all same sensitive value → l = 1;
    // second class has two values → fine at l = 2
    val df = Seq(
      ("A", "x", "s1"), ("A", "x", "s1"), ("A", "x", "s1"),
      ("A", "y", "s1"), ("A", "y", "s2"),
      ("B", "z", "s1"), ("B", "z", "s2")
    ).toDF("seg", "qi", "sv")
    val got = pipeline.Privacy.lDiversityProfile(
      df, col("seg"), Seq(col("qi")), col("sv"), 2L)
      .orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("A", 2L, 1L, 1L, 3L, 5L), // class x: 3 rows, 1 value → homog
      ("B", 1L, 2L, 0L, 0L, 2L)))
  }

  test("personalizedPageRank: rank mass stays seed-relative") {
    import spark.implicits._
    // path graph 1—2—3 (symmetrized), seed = {1}: rank(1) > rank(2) >
    // rank(3) after damping; a uniform walk would rank 2 highest
    // (highest degree)
    val e0 = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val edges = e0.unionByName(e0.select(col("dst").as("src"),
      col("src").as("dst")))
    val seeds = Seq(1L).toDF("node")
    val ppr = pipeline.Graph.personalizedPageRank(edges, seeds, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppr(1L) > ppr(2L) && ppr(2L) > ppr(3L), ppr.toString)
    val upr = pipeline.Graph.pageRank(edges, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(upr(2L) > upr(1L), upr.toString) // uniform walk favors the hub
    // seeds outside the graph are ignored; all-foreign seeds throw
    val ok = pipeline.Graph.personalizedPageRank(edges,
      Seq(1L, 99L).toDF("node"), iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok.keySet == Set(1L, 2L, 3L) && !ok.contains(99L))
    intercept[IllegalArgumentException] {
      pipeline.Graph.personalizedPageRank(edges,
        Seq(99L).toDF("node"), iters = 2).collect()
    }
  }

  test("truncationFidelity: full and prefix cosine per consecutive pair") {
    import spark.implicits._
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f, -1.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.truncationFidelity(df, "vec_id", "embedding", 2)
      .orderBy("id1").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    // pair (0,1): full cos = 0 (orthogonal via last dim), prefix-2 = 1
    assert(got(0)._1 == 0L && math.abs(got(0)._2) < 1e-12 &&
      math.abs(got(0)._3 - 1.0) < 1e-12)
    // pair (1,2): orthogonal in both views
    assert(math.abs(got(1)._2) < 1e-12 && math.abs(got(1)._3) < 1e-12)
  }

  test("fuzzyJoin: blocking finds edit-1 pairs, hot grams guard, exact verify") {
    import spark.implicits._
    val l = Seq((1L, "jonathan smith"), (2L, "jonathon smith"),
      (3L, "alice jones"), (4L, "completely other")).toDF("id", "name")
    val r = Seq((10L, "jonathan smith"), (11L, "alice jonez"),
      (12L, "zzzz yyyy")).toDF("id", "name")
    val got = pipeline.Fuzzy.fuzzyJoin(l, "id", "name", r, "id", "name",
      maxDist = 1, q = 3, maxGramFreq = 100L)
      .orderBy("id1", "id2").collect()
      .map(rr => (rr.getLong(0), rr.getLong(1), rr.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 10L, 0L), // exact
      (2L, 10L, 1L), // jonathon ~ jonathan
      (3L, 11L, 1L))) // jones ~ jonez; 4/12 match nothing
    // plan: no cartesian anywhere — candidates meet on the gram key
    val p = plan(pipeline.Fuzzy.fuzzyJoin(l, "id", "name", r, "id", "name", 1))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("fuzzyJoin hot-gram guard drops boilerplate-only matches (documented recall trade)") {
    import spark.implicits._
    // every left string shares the gram pool; with the guard at 2 the
    // common "aaaa…" grams are hot → the pair that ONLY shares hot
    // grams is missed, the pair with a rare distinctive gram survives
    val l = Seq((1L, "aaaaaa rare1"), (2L, "aaaaaa bbbb"),
      (3L, "aaaaaa cccc")).toDF("id", "name")
    val r = Seq((10L, "aaaaaa rare1")).toDF("id", "name")
    val got = pipeline.Fuzzy.fuzzyJoin(l, "id", "name", r, "id", "name",
      maxDist = 6, q = 4, maxGramFreq = 2L)
      .select("id1", "id2").collect().map(rr => (rr.getLong(0), rr.getLong(1)))
    // 1↔10 survives via "rare" grams; 2/3 ↔ 10 are within dist 6 but
    // share only the hot aaaa grams → blocked (the documented trade)
    assert(got.toSeq == Seq((1L, 10L)))
  }

  test("sparseCosinePairs: identical docs hit 1.0, disjoint absent, df band guards") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),   // exact dup of 1 → sim 1.0
      (3L, "alpha beta other words"),   // shares the 'alpha beta' bigram
      (4L, "zz yy xx ww")               // disjoint → no pair
    ).toDF("doc_id", "text")
    val got = pipeline.Retrieval.sparseCosinePairs(d, "doc_id", "text",
      ngram = 2, minDf = 2L, maxDf = 50L, minSim = 0.0)
      .orderBy("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(t => (t._1, t._2)).toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(math.abs(got(0)._4 - 1.0) < 1e-6 && got(0)._3 == 3) // dup pair
    assert(got(1)._4 > 0 && got(1)._4 < 1 && got(1)._3 == 1)
    // fixture run + plan pin: pairs meet on the term key only
    val fixture = pipeline.Retrieval.sparseCosinePairs(
      Tables.load(spark, sf, "documents").select("doc_id", "text"),
      "doc_id", "text", ngram = 2, minDf = 2L, maxDf = 50L, minSim = 0.0)
    assert(fixture.count() > 0)
    // plan pin: no cartesian; the only nested-loop is the deliberate
    // ONE-ROW corpus-stats broadcast cross (the rr1 lazy-stats shape) —
    // the pair join itself must be a hash/merge join on the term key
    val p = plan(fixture)
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(p.contains("BroadcastHashJoin [term") ||
      p.contains("SortMergeJoin [term") ||
      p.contains("ShuffledHashJoin [term"), p.take(1500))
  }

  test("rollup emits all three levels; pivot with explicit values, one scan") {
    import spark.implicits._
    val d = Seq(("A", "x", 1.0), ("A", "y", 2.0), ("B", "x", 3.0))
      .toDF("p", "s", "v")
    val r = d.rollup(col("p"), col("s"))
      .agg(grouping(col("p")).as("gp"), grouping(col("s")).as("gs"),
        count(lit(1)).as("n"))
      .collect() // grouping() is TINYINT in Spark
      .map(x => (x.getByte(2).toInt, x.getByte(3).toInt, x.getLong(4)))
    // 3 leaf rows + 2 per-p subtotals + 1 grand total
    assert(r.count(t => t._1 == 0 && t._2 == 0) == 3)
    assert(r.count(t => t._1 == 0 && t._2 == 1) == 2)
    assert(r.toSeq.contains((1, 1, 3L)))
    val pv = Seq((1L, "a", 10L), (1L, "b", 5L), (2L, "a", 7L))
      .toDF("k", "t", "c")
      .groupBy("k").pivot("t", Seq("a", "b")).agg(sum("c"))
      .orderBy("k").collect()
    assert(pv(0).getLong(1) == 10L && pv(0).getLong(2) == 5L)
    assert(pv(1).getLong(1) == 7L && pv(1).isNullAt(2)) // absent → NULL
  }

  test("waterfillBudget: capped source spills its shortfall, exact longs") {
    import spark.implicits._
    // equal 100-milli shares over budget 120: unconstrained each gets
    // 40; A holds only 10 → saturates; B and C split the rest 55/55
    val d = Seq(("A", 10L), ("B", 100L), ("C", 100L)).toDF("src", "toks")
    val got = pipeline.Sampling.waterfillBudget(d, "src", "toks", 120L,
      Map("A" -> 100L, "B" -> 100L, "C" -> 100L))
      .orderBy("src").collect()
      .map(r => (r.getString(0), r.getBoolean(3), r.getLong(4)))
    assert(got.toSeq == Seq(("A", true, 10L), ("B", false, 55L),
      ("C", false, 55L)))
    // budget above total capacity: everyone saturates, no div-by-zero
    val all = pipeline.Sampling.waterfillBudget(d, "src", "toks", 1000L,
      Map("A" -> 100L, "B" -> 100L, "C" -> 100L))
      .collect().map(r => (r.getString(0), r.getBoolean(3), r.getLong(4)))
    assert(all.forall(_._2) && all.map(_._3).sum == 210L)
  }

  test("corpusCard: volumes, dup rate, lang spread, short share — no Expand") {
    import spark.implicits._
    val d = Seq(
      ("s1", "en", "hello world"),   // dup pair
      ("s1", "en", "hello world"),
      ("s1", "de", "kurz"),          // short, second lang
      ("s2", "en", "only one doc here")
    ).toDF("source", "lang", "text")
    val df = pipeline.Profiling.corpusCard(d, "source", "lang", "text",
      shortChars = 10)
    val got = df.orderBy("source").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.toSeq == Seq(
      // s1: 3 docs, 2 unique, 1 dup, 11+11+4=26 chars, 2+2+1=5 toks,
      //     1 short, 2 langs
      ("s1", 3L, 2L, 1L, 26L, 5L, 1L, 2L),
      ("s2", 1L, 1L, 0L, 17L, 4L, 0L, 1L)))
    val p = plan(df)
    assert(!p.contains("Expand"), p.take(800))
  }

  test("canonicalUrl strips scheme/www/query/fragment/trailing slash") {
    import spark.implicits._
    val got = Seq(
      "HTTPS://WWW.Ex.COM/a/b/?q=1#frag",
      "http://ex.com/a/b",
      "ftp://www.ex.com//",
      "ex.com/a/b/" // schemeless input stays host-first
    ).toDF("u").select(Web.canonicalUrl(col("u"))).as[String].collect()
    assert(got.toSeq == Seq("ex.com/a/b", "ex.com/a/b", "ex.com", "ex.com/a/b"))
  }

  test("registeredDomain takes the last two host labels") {
    import spark.implicits._
    val got = Seq("a.b.site.com", "site.com", "localhost")
      .toDF("h").select(Web.registeredDomain(col("h"))).as[String].collect()
    assert(got.toSeq == Seq("site.com", "site.com", "")) // single label: no eTLD+1
  }

  test("domainStats: two-level host distinct, no countDistinct Expand") {
    import spark.implicits._
    val pages = Seq(
      ("https://a.site.com/1", 10L), ("https://b.site.com/2", 20L),
      ("https://a.site.com/3", 5L), ("https://other.org/x", 7L))
      .toDF("url", "n_chars")
    val df = Web.domainStats(pages, "url", "n_chars")
    val got = df.orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("other.org", 1L, 1L, 7L), ("site.com", 2L, 3L, 35L)))
    assert(!plan(df).contains("Expand"), plan(df).take(800))
  }
}
