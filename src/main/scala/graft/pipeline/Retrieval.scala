package graft.pipeline

import org.apache.spark.sql.DataFrame
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
}
