package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Similarity, TextAnalysis, Multimodal}

/** Training-data pipeline operators wired into the driver's
  * correctness gate. Oracle SQL is provided wherever the computation
  * is portable between Spark and DuckDB (md5, regexp in the common
  * RE2 subset, double-precision fold-order-identical arithmetic);
  * hash-function-dependent ops (xxhash64 minhash/simhash, LSH
  * bucketing) are rows-only here and covered by ScalaTest instead.
  */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  // ---------------- dedup ----------------

  // Exact dedup over a corpus with planted duplicates (the table
  // unioned with a re-keyed copy of itself).
  val dd1ExactDedup: Q = (s, dir) => {
    val d = docs(s, dir).select("doc_id", "text")
    val planted = d.unionByName(
      d.select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    Dedup.exactDedup(planted, "doc_id", "text")
      .orderBy("keep_id")
  }
  val dd1Sql: String =
    """WITH planted AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000, text FROM documents)
      |SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
      |       count(*) AS n_copies
      |FROM planted GROUP BY md5(text) ORDER BY keep_id""".stripMargin

  // MinHash + LSH near-dup candidates (hash-dependent: rows-only).
  val dd2MinhashLsh: Q = (s, dir) => {
    val d = docs(s, dir).select("doc_id", "text")
    // plant near-duplicates: copies with the first word replaced
    // (high Jaccard at every document length)
    val nearDup = d.filter(col("doc_id") < 50).select(
      (col("doc_id") + 2000000).as("doc_id"),
      concat(lit("zzz "), expr("substring(text, instr(text, ' ') + 1)"))
        .as("text"))
    Dedup.minhashNearDupPairs(d.unionByName(nearDup), "doc_id", "text",
      shingleWidth = 3, numHashes = 32, bands = 8, minEstJaccard = 0.5)
      .orderBy("id1", "id2")
  }

  // SimHash signatures (hash-dependent: rows-only).
  val dd3Simhash: Q = (s, dir) =>
    Dedup.simhash(docs(s, dir).select("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id")

  // Exact char-3-gram Jaccard pairs on a bounded slice (oracle ✓).
  val dd4NgramJaccard: Q = (s, dir) => {
    val d = docs(s, dir).select("doc_id", "text").filter(col("doc_id") < 100)
    Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3, minJaccard = 0.5)
      .orderBy("id1", "id2")
  }
  val dd4Sql: String =
    """WITH pos AS (
      |  SELECT doc_id, text,
      |         unnest(generate_series(1, length(text) - 2)) AS i
      |  FROM documents WHERE doc_id < 100 AND length(text) >= 3),
      |sh AS (
      |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS shingle
      |  FROM pos),
      |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS m
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id1, id2,
      |       CAST(m AS DOUBLE) / (x.n + y.n - m) AS jaccard
      |FROM inter JOIN sz x ON id1 = x.doc_id JOIN sz y ON id2 = y.doc_id
      |WHERE CAST(m AS DOUBLE) / (x.n + y.n - m) >= 0.5
      |ORDER BY id1, id2""".stripMargin

  // Embedding-cosine near-dup sweep over consecutive ids (oracle ✓:
  // both sides fold in double precision left-to-right).
  val dd5EmbedCosine: Q = (s, dir) =>
    Similarity.consecutiveCosine(
      embs(s, dir).select("vec_id", "embedding"), "vec_id", "embedding")
      .orderBy("id1")
  val dd5Sql: String =
    """SELECT a.vec_id AS id1, b.vec_id AS id2,
      |  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                         CAST(b.embedding AS DOUBLE[])) AS cosine
      |FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id
      |ORDER BY id1""".stripMargin

  // ---------------- similarity search ----------------

  // Brute-force cosine top-k for a fixed query set (oracle ✓).
  val ss1BruteTopK: Q = (s, dir) => {
    val e = embs(s, dir).select("vec_id", "embedding")
    Similarity.bruteForceTopK(e.filter(col("vec_id") < 5), e,
      "vec_id", "embedding", k = 10)
      .orderBy("query_id", "rank")
  }
  val ss1Sql: String =
    """SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                         CAST(c.embedding AS DOUBLE[])) AS cosine,
      |  CAST(row_number() OVER (
      |    PARTITION BY q.vec_id
      |    ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |             CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS INT) AS rank
      |FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      |WHERE q.vec_id < 5
      |QUALIFY rank <= 10
      |ORDER BY query_id, rank""".stripMargin

  // Banded sign-LSH ANN (hash/plane-dependent: rows-only; recall is
  // asserted against brute force in PipelineSpec).
  val ss2LshTopK: Q = (s, dir) => {
    val e = embs(s, dir).select("vec_id", "embedding")
    Similarity.lshTopK(e.filter(col("vec_id") < 5), e,
      "vec_id", "embedding", k = 10)
      .orderBy("query_id", "rank")
  }

  // IVF ANN: coarse k-means quantizer + probed exact rerank
  // (centroid-dependent: rows-only; recall asserted in PipelineSpec).
  val ss3IvfTopK: Q = (s, dir) => {
    val e = embs(s, dir).select("vec_id", "embedding")
    pipeline.Ivf.ivfTopK(e.filter(col("vec_id") < 5), e,
      "vec_id", "embedding", k = 10, nlist = 16, nprobe = 6)
      .orderBy("query_id", "rank")
  }

  // ---------------- text analysis ----------------

  val tx1Quality: Q = (s, dir) =>
    TextAnalysis.quality(docs(s, dir), "doc_id", "text").orderBy("doc_id")
  val tx1Sql: String =
    """SELECT doc_id,
      |  length(text) AS n_chars_calc,
      |  length(text) - length(regexp_replace(text, ' ', '', 'g')) + 1 AS n_words,
      |  CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
      |    / (length(text) - length(regexp_replace(text, ' ', '', 'g')) + 1) AS avg_word_len,
      |  len(regexp_extract_all(text, '\b(the|a|of|and|to)\b')) AS stopword_cnt,
      |  CAST(len(regexp_extract_all(text, '\b(the|a|of|and|to)\b')) AS DOUBLE)
      |    / (length(text) - length(regexp_replace(text, ' ', '', 'g')) + 1) AS stopword_ratio,
      |  len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt
      |FROM documents ORDER BY doc_id""".stripMargin

  val tx2Tokens: Q = (s, dir) =>
    TextAnalysis.tokenCounts(docs(s, dir), "doc_id", "text").orderBy("doc_id")
  val tx2Sql: String =
    """SELECT doc_id,
      |  length(text) - length(regexp_replace(text, ' ', '', 'g')) + 1 AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+')) AS re_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  // md5 fingerprint is portable; the xxhash64 companion is not → the
  // entry projects only the portable column.
  val tx3Fingerprint: Q = (s, dir) =>
    TextAnalysis.fingerprint(docs(s, dir), "doc_id", "text")
      .select("doc_id", "fingerprint_md5").orderBy("doc_id")
  val tx3Sql: String =
    """SELECT doc_id,
      |  md5(regexp_replace(lower(text), '\s+', '', 'g')) AS fingerprint_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  // Language ID heuristic (profile tables live Spark-side: rows-only;
  // planted-text accuracy asserted in PipelineSpec).
  val tx4LangId: Q = (s, dir) =>
    TextAnalysis.langId(docs(s, dir), "doc_id", "text").orderBy("doc_id")

  // ---------------- multimodal ----------------

  // Binary payload plumbing with the stubbed batch decoder
  // (deterministic fake features: rows-only; plumbing tested in
  // PipelineSpec).
  val mm1MediaFeatures: Q = (s, dir) =>
    Multimodal.mediaFeatureStats(s, docs(s, dir)).orderBy("media_id")

  // ---------------- composed curation pass ----------------

  // quality gate → exact dedup → near-dup drop → per-source stats.
  // Rows-only: the MinHash near-dup stage genuinely fires on the
  // fixture (the small shared vocabulary yields real ≥0.9-estimated
  // pairs), so the pass is deterministic but not DuckDB-reproducible;
  // PipelineSpec asserts planted exact and near duplicates are
  // removed.
  val cp1Curation: Q = (s, dir) =>
    pipeline.Curation.curationStats(docs(s, dir))

  val queries: Map[String, Q] = Map(
    "cp1_curation_pipeline" -> cp1Curation,
    "dd1_exact_dedup" -> dd1ExactDedup,
    "dd2_minhash_lsh_pairs" -> dd2MinhashLsh,
    "dd3_simhash" -> dd3Simhash,
    "dd4_ngram_jaccard" -> dd4NgramJaccard,
    "dd5_embed_cosine_neardup" -> dd5EmbedCosine,
    "ss1_cosine_topk_brute" -> ss1BruteTopK,
    "ss2_cosine_topk_lsh" -> ss2LshTopK,
    "ss3_cosine_topk_ivf" -> ss3IvfTopK,
    "tx1_text_quality" -> tx1Quality,
    "tx2_token_counts" -> tx2Tokens,
    "tx3_fingerprint" -> tx3Fingerprint,
    "tx4_langid" -> tx4LangId,
    "mm1_media_features" -> mm1MediaFeatures,
  )

  val oracleSql: Map[String, String] = Map(
    "dd1_exact_dedup" -> dd1Sql,
    "dd4_ngram_jaccard" -> dd4Sql,
    "dd5_embed_cosine_neardup" -> dd5Sql,
    "ss1_cosine_topk_brute" -> ss1Sql,
    "tx1_text_quality" -> tx1Sql,
    "tx2_token_counts" -> tx2Sql,
    "tx3_fingerprint" -> tx3Sql,
  )
}
