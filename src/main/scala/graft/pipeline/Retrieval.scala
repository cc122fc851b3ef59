package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval over a document corpus: BM25 ranked top-k — the
  * classic bag-of-words relevance function (Robertson & Zaragoza,
  * "The Probabilistic Relevance Framework: BM25 and Beyond", FnTIR
  * 2009) and the lexical half of every hybrid (BM25 + embedding)
  * retrieval stack a training-data pipeline runs for eval-set
  * mining, targeted corpus slicing and RAG index QA.
  */
object Retrieval {

  /** BM25 top-k documents per query.
    *
    * score(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with the Lucene-style non-negative idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
    * Query terms are deduplicated (set-of-terms queries, the standard
    * probabilistic-model reading).
    *
    * Exactness: every per-term factor is a single IEEE double op on
    * exact integer inputs (tf, df, N, dl, Σdl are exact longs), so
    * the per-term contribution is bit-identical in any engine that
    * evaluates the same expression tree. The per-document SUM of
    * contributions would still be fold-order-dependent, so each
    * contribution is floored onto a ×10⁶ integer grid first
    * (`score_micro` is in millionths) — the sum of longs is exact in
    * every fold order, and ranking on (score_micro DESC, doc id) is
    * fully deterministic. PipelineSpec attests the grid margin: no
    * fixture contribution lands within 1e-6 of a floor boundary
    * (ulp-scale engine disagreement at this magnitude is ~1e-10).
    *
    * Scale shape: one (doc, term) partial aggregation for tf (dl
    * rides along, max-folded — constant per doc); document
    * frequencies join back term-keyed; the query term list and the
    * one-row corpus stats broadcast. Only matching (query, term)
    * rows survive the broadcast semi-ish join — the corpus is never
    * scanned per query — and the per-query top-k window shuffles ≤
    * |matched docs| rows on the query key. At 100 TB: tf/df are the
    * inverted-index build (linear, two partial aggs), each query
    * costs the union of its terms' postings, exactly an inverted
    * index's work, parallelized by the term equi-join.
    */
  /** The per-(query, doc, term) BM25 contributions feeding
    * [[bm25TopK]]: `contrib` is the raw IEEE double, `c_micro` its
    * ×10⁶ floor. Exposed so specs can attest the grid margin (how far
    * each contribution sits from a floor boundary) on real fixtures.
    */
  def bm25TermContribs(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, String)], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queries.nonEmpty, "bm25 needs at least one query")
    val spark = docs.sparkSession
    import spark.implicits._

    val words = col("__words")
    val base = Dedup.spread(docs)
      .withColumn("__words", split(col(textCol), " +"))
    // (doc, term) frequencies with the doc length carried through the
    // aggregation (constant per doc, max is a cheap exact fold) — one
    // shuffle builds the whole inverted index
    val tf = base
      .select(col(idCol), size(words).cast("long").as("__dl"),
        explode(words).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("__dl")).as("dl"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // one-row corpus stats: lazy, broadcast — no driver action
    val stats = base.agg(count(lit(1)).as("n_docs"),
      sum(size(words).cast("long")).as("sum_dl"))

    val qterms = queries
      .flatMap { case (qid, q) => q.split(" ").distinct.map(t => (qid, t)) }
      .toDF("query_id", "term")

    val tfD = col("tf").cast("double")
    val dfD = col("df").cast("double")
    val nD = col("n_docs").cast("double")
    val idf = log(lit(1.0) + (nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
    val avgdl = col("sum_dl").cast("double") / nD
    // (k1 + 1) as a Column op, not a Scala constant: the oracle
    // computes the same IEEE add, so the doubles agree to the bit
    val contrib = idf * (tfD * (lit(k1) + lit(1.0))) /
      (tfD + lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("dl").cast("double") / avgdl)))

    tf.join(broadcast(qterms), "term")
      .join(docFreq, "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col(idCol), col("term"),
        contrib.as("contrib"),
        floor(contrib * lit(1e6)).cast("long").as("c_micro"))
  }

  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, String)], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    require(topK >= 1, s"bm25TopK needs topK >= 1, got $topK")
    val scored = bm25TermContribs(docs, idCol, textCol, queries, k1, b)
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("c_micro")).as("score_micro"),
        count(lit(1)).as("n_terms"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_micro").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col(idCol),
        col("score_micro"), col("n_terms"))
  }

  /** Learned-sparse retrieval (the uniCOIL/DeepImpact family — Lin &
    * Ma, arXiv:2106.14807): score(q, d) = Σ_{t ∈ q ∩ d} tf(t, d) ·
    * w(t), where `weights` is the TRAINED per-term impact model
    * carried as a (term, w_milli) DataFrame — the deployment shape
    * where an encoder's term weights are data, not a formula (vs
    * BM25's closed-form idf). Weights broadcast (vocabulary-sized);
    * scoring is exact long arithmetic on the milli grid, so the
    * oracle replays it bit-for-bit.
    *
    * Scale shape: identical to [[bm25TopK]] — ONE shuffle builds the
    * (doc, term) tf index, query terms AND the weight model broadcast
    * against it, per-(query, doc) partial-agged sum, per-query top-k
    * window. A real deployment materializes tf once (ii1) and reuses
    * it across models.
    */
  def learnedSparseTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, String)], weights: DataFrame,
      topK: Int = 10): DataFrame = {
    require(queries.nonEmpty, "learnedSparseTopK needs at least one query")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = col("__words")
    val tf = Dedup.spread(docs)
      .withColumn("__words", split(col(textCol), " +"))
      .select(col(idCol), explode(words).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val qterms = queries
      .flatMap { case (qid, q) => q.split(" ").distinct.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val scored = tf
      .join(broadcast(qterms), "term")
      .join(broadcast(weights), "term")
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("tf") * col("w_milli")).as("score_milli"),
        count(lit(1)).as("n_terms"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_milli").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col(idCol),
        col("score_milli"), col("n_terms"))
  }

  /** Exact phrase search via a positional inverted index: for each
    * (phrase_id, phrase), every document containing the phrase's
    * words consecutively, with the occurrence count and first match
    * position (0-based word offset) — the positional-postings half of
    * a lexical retrieval stack (BM25 ranks bags; phrase queries need
    * positions), and the primitive behind "find every document
    * quoting this exact sentence".
    *
    * Algorithm: postings are (doc, term, pos); a phrase of length L
    * becomes L broadcast (phrase, offset, term) rows; joining
    * postings to phrase terms term-keyed and normalizing each hit to
    * its implied start (pos − offset) turns "consecutive terms" into
    * "L distinct offsets at one (phrase, doc, start)" — a count-
    * distinct equality, no per-length join chain, any phrase length
    * in ONE plan. Duplicate words inside a phrase are handled by the
    * offset-distinctness (a posting matching two offsets yields two
    * candidate starts, each still needing full coverage).
    *
    * Scale shape: positions come from the same map-only Generate the
    * tf build uses; the phrase list broadcasts, so only postings of
    * words that appear in SOME phrase survive the join (an inverted
    * index lookup, never a corpus scan per phrase); the coverage
    * check and per-doc rollup are two partial aggregations on
    * (phrase, doc, start) / (phrase, doc). Work is linear in the
    * matched postings — exactly an inverted index's cost.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[(Long, String)]): DataFrame = {
    require(phrases.nonEmpty, "phraseSearch needs at least one phrase")
    val spark = docs.sparkSession
    import spark.implicits._

    val postings = Dedup.spread(docs)
      .select(col(idCol), posexplode(split(col(textCol), " +")))
      .toDF(idCol, "pos", "term")
    val phraseTerms = phrases.flatMap { case (pid, p) =>
      val ws = p.split(" ").filter(_.nonEmpty)
      require(ws.nonEmpty, s"phrase $pid is empty")
      ws.zipWithIndex.map { case (t, off) =>
        (pid, off.toLong, t, ws.length.toLong)
      }
    }.toDF("phrase_id", "off", "term", "phrase_len")

    postings.join(broadcast(phraseTerms), "term")
      .select(col("phrase_id"), col(idCol),
        (col("pos") - col("off")).as("start"),
        col("off"), col("phrase_len"))
      .filter(col("start") >= 0)
      .groupBy(col("phrase_id"), col(idCol), col("start"))
      // offsets are distinct within a group by construction: postings
      // are unique on (doc, pos) and pos = start + off, so a plain
      // count IS the coverage count (no countDistinct Expand needed)
      .agg(count(lit(1)).as("n_cov"),
        max(col("phrase_len")).as("len"))
      .filter(col("n_cov") === col("len"))
      .groupBy(col("phrase_id"), col(idCol))
      .agg(count(lit(1)).as("n_matches"),
        min(col("start")).cast("long").as("first_pos"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, "Reciprocal
    * Rank Fusion outperforms Condorcet and individual Rank Learning
    * Methods", SIGIR 2009): combine per-query rankings from several
    * retrievers — here the lexical (BM25) and semantic (cosine) legs
    * of a hybrid stack — by summing 1/(k + rank) over the lists each
    * document appears in.
    *
    * The contribution is computed as `10⁹ div (k + rank)` — an exact
    * integer — so fused scores are fold-order and cross-engine exact
    * (no IEEE reciprocal sums), and ties break on doc id.
    *
    * Scale shape: the inputs are already top-k lists (|queries|·k
    * rows each, NOT corpus-sized — the expensive retrieval happened
    * upstream), so fusion is a union + one (query, doc) partial agg +
    * a per-query top-k window. Cost is independent of corpus size by
    * construction.
    */
  def rrfFuse(rankings: Seq[DataFrame], queryCol: String, docCol: String,
      rankCol: String, kRrf: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val tagged = rankings
      .map(_.select(col(queryCol), col(docCol),
        col(rankCol).cast("long").as("__rank")))
      .reduce(_ unionByName _)
    val fused = tagged
      .withColumn("__c", expr(s"1000000000 div ($kRrf + __rank)"))
      .groupBy(col(queryCol), col(docCol))
      .agg(sum("__c").as("rrf_nano"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy(queryCol)
      .orderBy(col("rrf_nano").desc, col(docCol))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }

  /** All-pairs sparse TF-IDF cosine over word n-gram terms — the
    * inverted-index formulation of pairwise document similarity
    * (Elsayed, Lin & Oard, "Pairwise Document Similarity in Large
    * Collections with MapReduce", ACL 2008): documents meet ONLY on
    * shared terms through a term-keyed equi-join, never doc × doc.
    * N-gram terms (default bigrams) give the quote/plagiarism-grade
    * signal unigram bags blur out.
    *
    * The df band is BOTH relevance and the quadratic guard: a term in
    * G docs contributes G² candidate rows, so `maxDf` caps any term's
    * fan-out (stopword-class n-grams carry no similarity signal — the
    * stop-shingle discipline), and `minDf = 2` drops unpaired hapax
    * terms for free.
    *
    * Exactness discipline (rr1/ir1): the weight `tf·ln(N/df)` is a
    * fixed IEEE tree on exact longs; per-term pair products AND
    * per-doc squared norms are floored onto a ×10⁶ grid before their
    * sums, so both folds are exact long arithmetic in any order, and
    * the final `dot/√(nq₁·nq₂)` is one fixed IEEE chain on exact
    * longs — bit-identical cross-engine (grid units cancel in the
    * ratio; the floor bias can nudge a ~1.0 cosine a few 1e-8 above
    * 1, documented not hidden).
    *
    * At 100 TB: two partial aggs build tf/df (the index), the pair
    * join is term-keyed with bounded fan-out, and output is
    * thresholded by `minSim` — no stage is ever corpus².
    */
  def sparseCosinePairs(docs: DataFrame, idCol: String, textCol: String,
      ngram: Int = 2, minDf: Long = 2, maxDf: Long = 50,
      minSim: Double = 0.2): DataFrame = {
    require(ngram >= 1 && minDf >= 2 && maxDf >= minDf,
      s"need ngram >= 1, 2 <= minDf <= maxDf; got $ngram, $minDf, $maxDf")
    val wsp = Dedup.spread(docs)
      .withColumn("__w", split(col(textCol), " +"))
    val tok = wsp.select(col(idCol).as("__doc"),
      explode(expr(
        s"transform(sequence(1, greatest(size(__w) - ${ngram - 1}, 1))," +
          s" i -> array_join(slice(__w, i, $ngram), ' '))")).as("term"))
    val tf = tok.groupBy("__doc", "term").agg(count(lit(1)).as("__tf"))
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf && col("__df") <= maxDf)
    val nd = docs.agg(count(lit(1)).as("__nd"))
    val w = tf.join(dfq, "term").crossJoin(broadcast(nd))
      .withColumn("__wt", col("__tf").cast("double") *
        log(col("__nd").cast("double") / col("__df").cast("double")))
      .withColumn("__q",
        floor(col("__wt") * col("__wt") * lit(1000000.0)).cast("long"))
    val nq = w.groupBy("__doc").agg(sum("__q").as("__nq"))
    val a = w.select(col("__doc").as("id1"), col("term"),
      col("__wt").as("__w1"))
    val b = w.select(col("__doc").as("id2"), col("term"),
      col("__wt").as("__w2"))
    a.join(b, Seq("term")).filter(col("id1") < col("id2"))
      .withColumn("__c",
        floor(col("__w1") * col("__w2") * lit(1000000.0)).cast("long"))
      .groupBy("id1", "id2")
      .agg(sum("__c").as("__dot"), count(lit(1)).as("shared_terms"))
      .join(nq.select(col("__doc").as("id1"), col("__nq").as("__n1")), "id1")
      .join(nq.select(col("__doc").as("id2"), col("__nq").as("__n2")), "id2")
      .withColumn("sim", col("__dot").cast("double") /
        sqrt(col("__n1").cast("double") * col("__n2").cast("double")))
      .filter(col("sim") >= minSim)
      .select("id1", "id2", "shared_terms", "sim")
  }

  /** Merge a standalone index built over an APPEND-ONLY new batch into
    * an existing [[invertedIndex]] artifact — the maintenance path
    * that makes a 100 TB index incremental: the old corpus is never
    * re-tokenized, never re-shuffled; only the delta batch pays the
    * build and the merge is ONE term-keyed full-outer join over two
    * index frames (|vocab| rows, not corpus rows). The dd7
    * incremental-dedup discipline applied to retrieval.
    *
    * Contract: every doc id in `newIdx` exceeds every id in `oldIdx`
    * (monotone ingest ids — the append-only lake invariant). Under it
    * the merged gap list is `old ++ [new_first − old_max] ++ new_tail`
    * where `new_first` IS the head of the new index's gap list (a
    * standalone build encodes its first posting absolute). Σ-gap
    * checksums compose: merged max_doc = the new side's max_doc.
    * Callers apply df banding AFTER merging (a term's df can cross
    * the band as batches arrive).
    */
  def mergeIndexes(oldIdx: DataFrame, newIdx: DataFrame): DataFrame = {
    val o = oldIdx.select(col("term"), col("df").as("__odf"),
      col("postings_delta").as("__opd"), col("max_doc").as("__omax"))
    val n = newIdx.select(col("term"), col("df").as("__ndf"),
      col("postings_delta").as("__npd"), col("max_doc").as("__nmax"))
    o.join(n, Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("__odf"), lit(0L)) + coalesce(col("__ndf"), lit(0L)))
          .as("df"),
        when(col("__opd").isNull, col("__npd"))
          .when(col("__npd").isNull, col("__opd"))
          .otherwise(concat(col("__opd"),
            array(element_at(col("__npd"), 1) - col("__omax")),
            slice(col("__npd"), lit(2), size(col("__npd")))))
          .as("postings_delta"),
        coalesce(col("__nmax"),
          col("__omax")).as("max_doc"))
  }

  /** Materialized inverted index with delta-encoded posting lists —
    * the storage artifact behind [[bm25TopK]]/[[phraseSearch]], built
    * as its own operator because a 100 TB corpus builds the index
    * ONCE and serves many query batches from it.
    *
    * Per term: `df` (document frequency), `postings_delta` (doc ids
    * sorted ascending, gap-encoded — the standard compression that
    * turns ~8-byte ids into mostly-small varint-able gaps; Manning et
    * al., IIR §5.3) and `max_doc` (= Σ deltas, a free end-to-end
    * checksum: any lost or reordered gap breaks it).
    *
    * Scale shape: one distinct over (term, doc) — a partial-agg
    * shuffle on the pair key — then df from a term-keyed partial agg,
    * and the band filter applied BEFORE the gap window and list fold:
    * a stopword-class term over the band never reaches collect_list,
    * so no aggregation buffer ever materializes a corpus-sized
    * posting array (filtering after the fold would OOM on exactly the
    * terms the band exists to drop). `minDf` prunes the hapax tail
    * that bloats the term dictionary without ever matching a query.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 5, maxDf: Long = 100000): DataFrame = {
    val tok = Dedup.spread(docs)
      .select(explode(split(lower(col(textCol)), "[^a-z]+")).as("term"),
        col(idCol).cast("long").as("__doc"))
      .filter(length(col("term")) >= 3)
      .distinct()
    val w = Window.partitionBy("term").orderBy("__doc")
    def fold(src: DataFrame, dfCol: Column): DataFrame = src
      .withColumn("__delta",
        col("__doc") - lag(col("__doc"), 1, 0L).over(w))
      .groupBy("term")
      .agg(dfCol.as("df"),
        transform(
          sort_array(collect_list(struct(col("__doc"), col("__delta")))),
          e => e.getField("__delta")).as("postings_delta"),
        sum(col("__delta")).as("max_doc"))
    if (minDf <= 1L && maxDf == Long.MaxValue)
      // wide-open band (the incremental sub-index case): no memory
      // bound to enforce, so skip the df pre-join — one term shuffle
      fold(tok, count(lit(1)))
    else
      // band BEFORE the window+fold: an over-band term never reaches
      // collect_list, so no aggregation buffer materializes a
      // corpus-sized posting array
      fold(tok.join(
        tok.groupBy("term").agg(count(lit(1)).as("df"))
          .filter(col("df") >= minDf && col("df") <= maxDf), "term"),
        max(col("df")))
  }
}
