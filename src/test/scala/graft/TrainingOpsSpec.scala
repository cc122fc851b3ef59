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
