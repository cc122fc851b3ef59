package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Partitioned, TextFormats}
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Ingest formats (CSV/JSONL), the partitioned parquet layout, and
  * the CDC upsert: round-trip fidelity with hostile values, explicit
  * malformed-row policy, planning-time partition pruning, and
  * last-write-wins compaction in both batch and streaming form.
  */
class SourcesSpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val hostileSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  /** Values that break naive serialization: separators, quotes,
    * escapes, embedded newlines, unicode, empties, nulls.
    */
  private def hostile: DataFrame = {
    val rows = Seq(
      Row(1L, "plain words", 1.5),
      Row(2L, "comma, semicolon; pipe|", -0.25),
      Row(3L, "says \"quoted\" and 'single'", 0.0),
      Row(4L, "back\\slash and tab\there", 2.0),
      Row(5L, "line one\nline two", 3.5),
      Row(6L, "ünïcodé — em-dash", null),
      Row(7L, null, 4.25))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), hostileSchema)
  }

  private def sorted(df: DataFrame): Seq[Row] =
    df.orderBy("id").collect().toSeq

  test("JSONL round trip preserves hostile values, nulls included") {
    val dir = tmp("graft_jsonl")
    TextFormats.writeJsonl(hostile, dir)
    val back = TextFormats.readJsonl(spark, dir, hostileSchema)
      .select("id", "text", "score")
    assert(sorted(back) == sorted(hostile))
  }

  test("CSV round trip preserves hostile values (multiLine for embedded newlines)") {
    val dir = tmp("graft_csv")
    TextFormats.writeCsv(hostile, dir)
    val back = TextFormats.readCsv(spark, dir, hostileSchema,
      multiLine = true).select("id", "text", "score")
    val got = sorted(back)
    val want = sorted(hostile)
    // CSV cannot distinguish null from empty string without a quote
    // convention; Spark's writer emits "" for null text, and the
    // reader hands back null — the one lossy corner of the format
    // (and a reason corpora land as JSONL/parquet, not CSV)
    assert(got.map(r => (r.getLong(0), Option(r.get(2)))) ==
      want.map(r => (r.getLong(0), Option(r.get(2)))))
    assert(got.filter(_.getLong(0) != 7L).map(_.get(1)) ==
      want.filter(_.getLong(0) != 7L).map(_.get(1)))
  }

  test("malformed JSONL: FAILFAST throws, PERMISSIVE captures the raw line") {
    val dir = tmp("graft_badjson")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.json"),
      ("""{"id": 1, "text": "good", "score": 1.0}""" + "\n" +
        """{"id": "not a long", "text": "bad", "score": 2.0}""" + "\n" +
        """{"id": 3, "text": "also good", "score": 3.0}""" + "\n")
        .getBytes("UTF-8"))
    val permissive =
      TextFormats.readJsonlWithCorrupt(spark, dir, hostileSchema).cache()
    val bad = permissive.filter(col(TextFormats.corruptCol).isNotNull)
    assert(bad.count() == 1)
    assert(bad.head().getAs[String](TextFormats.corruptCol)
      .contains("not a long"))
    assert(permissive.filter(col(TextFormats.corruptCol).isNull)
      .count() == 2)
    permissive.unpersist(false)
    val ex = intercept[org.apache.spark.SparkException] {
      TextFormats.readJsonl(spark, dir, hostileSchema).collect()
    }
    assert(Option(ex.getMessage).nonEmpty)
  }

  test("malformed CSV: PERMISSIVE captures, FAILFAST throws") {
    val dir = tmp("graft_badcsv")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-0.csv"),
      ("id,text,score\n" +
        "1,good,1.0\n" +
        "oops,bad,2.0\n" +
        "3,fine,3.0\n").getBytes("UTF-8"))
    // same cache-before-corrupt-filter contract as JSONL (Spark
    // disallows projecting ONLY the corrupt column off a raw scan)
    val permissive = TextFormats.readCsvWithCorrupt(spark, dir, hostileSchema)
      .cache()
    assert(permissive.filter(col(TextFormats.corruptCol).isNotNull)
      .count() == 1)
    permissive.unpersist(false)
    val ex = intercept[org.apache.spark.SparkException] {
      TextFormats.readCsv(spark, dir, hostileSchema).collect()
    }
    assert(Option(ex.getMessage).nonEmpty)
  }

  test("partitioned layout: full read-back equality, column order restored") {
    val dir = tmp("graft_part")
    val docs = Tables.load(spark, sf, "documents")
    Partitioned.write(docs, dir, Seq("source"))
    val back = Partitioned.read(spark, dir)
      .select(docs.columns.map(col): _*)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("partition filter prunes at planning time") {
    val dir = tmp("graft_prune")
    val docs = Tables.load(spark, sf, "documents")
    Partitioned.write(docs, dir, Seq("source"))
    val all = Partitioned.read(spark, dir)
    val one = Partitioned.readPruned(spark, dir, col("source") === "src1")
    def leafPartitions(df: DataFrame): Int =
      df.queryExecution.executedPlan.collectLeaves().map {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
        case _ => 0
      }.sum
    val total = leafPartitions(all)
    assert(total > 1, s"expected multiple source partitions, got $total")
    // pruning happened during planning: exactly ONE directory remains
    assert(leafPartitions(one) == 1)
    val p = one.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters"), p.take(1500))
  }

  test("partitioned write refuses high-cardinality keys") {
    val dir = tmp("graft_highcard")
    val docs = Tables.load(spark, sf, "documents")
    val ex = intercept[IllegalArgumentException] {
      Partitioned.write(docs, dir, Seq("doc_id"), maxPartitions = 10)
    }
    assert(ex.getMessage.contains("distinct values"))
  }

  // ---------------- CDC upsert ----------------

  private def feed: DataFrame = {
    import spark.implicits._
    Seq(
      // key 1: three versions
      (1L, 10L, "v1", 1.0), (1L, 30L, "v3", 3.0), (1L, 20L, "v2", 2.0),
      // key 2: single version
      (2L, 15L, "only", 9.0),
      // key 3: version TIE — payload tie-break must be deterministic
      (3L, 40L, "tie-a", 1.0), (3L, 40L, "tie-b", 2.0))
      .toDF("k", "ver", "tag", "x")
  }

  test("upsertLatest keeps the highest version per key, ties broken deterministically") {
    val got = EventStreams.upsertLatest(feed, Seq("k"), "ver")
      .orderBy("k").collect().toSeq
    assert(got == Seq(
      Row(1L, 30L, "v3", 3.0),
      Row(2L, 15L, "only", 9.0),
      // lexicographic struct order: (40, "tie-b", 2.0) > (40, "tie-a", 1.0)
      Row(3L, 40L, "tie-b", 2.0)))
    // idempotence: compacting a compacted feed is the identity
    val again = EventStreams.upsertLatest(
      EventStreams.upsertLatest(feed, Seq("k"), "ver"), Seq("k"), "ver")
      .orderBy("k").collect().toSeq
    assert(again == got)
  }

  test("upsertLatest plans one partial aggregate: no Window, no Expand, one exchange") {
    val p = EventStreams.upsertLatest(feed, Seq("k"), "ver")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p.take(1500))
    assert(!p.contains("Expand"), p.take(1500))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p.take(1500))
    // a struct-valued max buffer is not hash-aggregable, so Spark
    // legitimately plans SortAggregate — the pin is the map-side
    // PARTIAL combine (duplicates collapse before the exchange)
    assert(p.contains("partial_max"), p.take(1500))
  }

  test("streaming upsert sink: last write wins across micro-batches, replay-idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(minute: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-01 10:${minute}%02d:00")
    val root = tmp("graft_upsert")
    val env = new graft.frontend.Analyzer.Env().addDecls(
      """create table latest (event_id int not null, ts datetime not null,
        |  user_id int not null, event_type string not null,
        |  value float not null)""".stripMargin)
    val catalog = new graft.frontend.ManagedCatalog(spark, root, env)
    val mem = MemoryStream[Event]
    val q = EventStreams.streamUpsertToManagedTable(mem.toDF(), catalog,
      "latest", Seq("event_id"), "ts", s"$root/_ckpt")
    try {
      mem.addData(
        Event(1, ts(0), 1, "created", 1.0),
        Event(2, ts(1), 2, "created", 2.0))
      q.processAllAvailable()
      // batch 2: update for key 1, replay of key 2's original row
      mem.addData(
        Event(1, ts(5), 1, "updated", 10.0),
        Event(2, ts(1), 2, "created", 2.0))
      q.processAllAvailable()
      val got = catalog.load("latest")
        .select("event_id", "ts", "event_type", "value")
        .orderBy("event_id").collect().toSeq
      assert(got == Seq(
        Row(1L, ts(5), "updated", 10.0),
        Row(2L, ts(1), "created", 2.0)))
      // the streamed table IS the batch twin of its own change feed
      val changes = Seq(
        Event(1, ts(0), 1, "created", 1.0),
        Event(2, ts(1), 2, "created", 2.0),
        Event(1, ts(5), 1, "updated", 10.0)).toDF()
      val twin = EventStreams.upsertLatest(changes, Seq("event_id"), "ts")
        .select("event_id", "ts", "event_type", "value")
        .orderBy("event_id").collect().toSeq
      assert(got == twin)
    } finally q.stop()
  }

  test("ORC round trip preserves hostile values, nulls included") {
    val dir = tmp("graft_orc")
    graft.sources.Columnar.writeOrc(hostile, dir)
    val back = graft.sources.Columnar.readOrc(spark, dir, hostileSchema)
      .select("id", "text", "score")
    assert(sorted(back) == sorted(hostile))
  }

  test("zValue interleaves bits; SQL twin agrees bit-for-bit") {
    import graft.sources.Zorder
    import spark.implicits._
    // x=5 (101), y=3 (011) -> z bits msb-first x2 y2 x1 y1 x0 y0 =
    // 100111 = 39
    val d = Seq((5L, 3L), (0L, 0L), (7L, 7L), (4L, 1L)).toDF("x", "y")
    val got = d.select(Zorder.zValue(col("x"), col("y"), 3).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(39L, 0L, 63L, 33L))
    d.createOrReplaceTempView("zin")
    val viaSql = spark.sql(
      s"SELECT ${Zorder.zValueSql("x", "y", 3)} AS z FROM zin")
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == got)
  }

  test("z-ordered layout: lossless, and files tile BOTH dimensions") {
    import graft.sources.Zorder
    import spark.implicits._
    val n = 1 << 12
    // a 64x64 grid, one point per cell, written as 16 z-files
    val d = (0 until n).map(i => (i.toLong, (i % 64).toLong,
      (i / 64).toLong)).toDF("id", "x", "y")
    val dir = tmp("graft_zorder")
    Zorder.writeZordered(d, dir, "x", "y", bits = 6, numFiles = 16)
    val back = spark.read.parquet(dir)
    // lossless: same rows, helper column gone
    assert(back.columns.sorted.toSeq == Seq("id", "x", "y"))
    assert(back.orderBy("id").collect().toSeq ==
      d.orderBy("id").collect().toSeq)
    // most files' bounding boxes must span far less than the full
    // domain in BOTH dims (a single-column sort leaves one dim at
    // full 64-width in EVERY file; a 256-row z-range is a ~16x16
    // tile, except where a file straddles a high-level curve
    // boundary — a handful of files at most)
    val spans = back
      .select(input_file_name().as("f"), col("x"), col("y"))
      .groupBy("f")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
      .collect()
    assert(spans.length == 16)
    val tiled = spans.count(r =>
      math.max(r.getLong(1), r.getLong(2)) <= 31)
    assert(tiled >= 10,
      s"only $tiled/16 files are sub-half-domain tiles")
    // box query over the layout equals the unlaid-out answer
    val box = back.filter(col("x").between(10, 20) &&
      col("y").between(30, 40)).agg(count(lit(1))).head().getLong(0)
    assert(box == 11L * 11L)
  }

  test("schema evolution: merged read null-fills, prunes, keeps batch col") {
    import spark.implicits._
    val root = tmp("graft_evo")
    graft.sources.Evolution.writeBatch(
      Seq((1L, "a", "en")).toDF("id", "text", "lang"), root, "v1")
    graft.sources.Evolution.writeBatch(
      Seq((2L, "b", 42L)).toDF("id", "text", "extra"), root, "v2")
    val m = graft.sources.Evolution.readMerged(spark, root)
    assert(m.columns.toSet == Set("id", "text", "lang", "extra", "batch"))
    val rows = m.orderBy("id")
      .select("id", "lang", "extra", "batch").collect()
    assert(rows(0).getString(1) == "en" && rows(0).isNullAt(2) &&
      rows(0).getString(3) == "v1")
    assert(rows(1).isNullAt(1) && rows(1).getLong(2) == 42L &&
      rows(1).getString(3) == "v2")
    // batch predicate prunes whole directories at planning time
    // (inputFiles reflects the unpruned relation — ask the scan node)
    val pruned = m.filter(col("batch") === "v1")
    val selected = pruned.queryExecution.executedPlan.collectLeaves().map {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
      case _ => 0
    }.sum
    assert(selected == 1,
      pruned.queryExecution.executedPlan.toString.take(1200))
  }

  test("compaction: plan is deterministic rank-div; writer emits one file per id") {
    import spark.implicits._
    val frag = spark.range(100).select(
      (col("id") * 7 % 100).as("k"), col("id").as("payload"))
      .repartition(16) // the small-files problem
    val p = graft.sources.Compaction.plan(frag, Seq("k"), targetRows = 30L)
      .orderBy("file_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // 100 rows / 30 → files of 30,30,30,10 with tight, disjoint ranges
    assert(p.toSeq == Seq((0L, 30L, 0L, 29L), (1L, 30L, 30L, 59L),
      (2L, 30L, 60L, 89L), (3L, 10L, 90L, 99L)))
    val out = tmp("graft_compact")
    val n = graft.sources.Compaction.compact(frag, out, Seq("k"), 30L)
    assert(n == 4L)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("file_id=")).sortBy(_.getName)
    assert(dirs.length == 4)
    dirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${d.getName} has ${parts.length} files")
    }
    // the rewrite moves bytes, never rows
    val back = spark.read.parquet(out)
    assert(back.count() == 100 &&
      back.agg(sum("payload")).head.getLong(0) == 4950L)
  }

  test("compaction rank is distributed: no global window, boundary-invariant") {
    import spark.implicits._
    val rows = spark.range(97).select((col("id") * 13 % 97).as("k"))
    // no single-partition WindowExec anywhere in the plan
    val df = graft.sources.Compaction.plan(rows, Seq("k"), 20L)
    assert(!df.queryExecution.executedPlan.toString.contains("Window"))
    // ranks depend on the total key order only — partition counts
    // (and thus sampled range boundaries) must not move any row
    val a = graft.sources.Compaction
      .assignFiles(rows, Seq("k"), 20L, partitions = 3)
      .select("k", "file_id").as[(Long, Long)].collect().toMap
    val b = graft.sources.Compaction
      .assignFiles(rows, Seq("k"), 20L, partitions = 11)
      .select("k", "file_id").as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a(0L) == 0L && a(96L) == 4L) // 97 rows → 5 files
  }
}
