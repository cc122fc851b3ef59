package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** Streaming behavior: the same transform runs incrementally over a
  * MemoryStream and agrees with its batch execution; stateful
  * sessionization closes sessions on the event-time gap.
  */
class StreamingSpec extends SparkTestBase {

  def ts(minute: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  test("windowed agg: streaming increments equal the batch result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val events = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 1, "click", 2.0),
      Event(3, ts(65), 2, "view", 3.0),
      Event(4, ts(70), 2, "click", 4.0))
    val sdf = mem.toDF()
    val q = EventStreams.windowedTypeAgg(sdf, withWatermark = true)
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("update").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("win_agg")
        .orderBy("window_start", "event_type").collect()
      val batch = EventStreams.windowedTypeAgg(events.toDF(),
        withWatermark = false)
        .orderBy("window_start", "event_type").collect()
      assert(streamed.toSeq == batch.toSeq)
      assert(batch.length == 3) // (10:00 click), (11:00 view), (11:00 click)
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch against the dim, keeps orphans") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "alice", "gold"), (2L, "bob", "tin"))
      .toDF("uid", "name", "tier")
    val mem = MemoryStream[Event]
    val q = EventStreams.enrichEvents(mem.toDF(), dim, "user_id", "uid")
      .writeStream.format("memory").queryName("enrich")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ts(0), 1, "click", 1.0))
      q.processAllAvailable()
      mem.addData(
        Event(2, ts(1), 2, "view", 2.0),
        Event(3, ts(2), 9, "click", 3.0)) // no profile for user 9
      q.processAllAvailable()
      val got = spark.table("enrich")
        .select("event_id", "name", "tier")
        .orderBy("event_id").collect().toSeq
      assert(got.map(r => (r.getLong(0), r.getString(1), r.getString(2))) ==
        Seq((1L, "alice", "gold"), (2L, "bob", "tin"), (3L, null, null)))
      // the dim key column is dropped; feed columns survive
      assert(!spark.table("enrich").columns.contains("uid"))
    } finally q.stop()
  }

  test("streaming dedup drops in-horizon duplicate event_ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.dedupEvents(mem.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(1), 1, "view", 2.0))
      q.processAllAvailable()
      // replayed delivery of event 1 (same id) within the horizon
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(3, ts(2), 2, "click", 3.0))
      q.processAllAvailable()
      val got = spark.table("dedup").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stateful sessionization closes sessions after the gap timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // session 1: two events 5 min apart; then a 40-min gap starts
      // session 2; the watermark must pass start2's timeout to emit s1
      mem.addData(Event(1, ts(0), 7, "click", 1.0))
      mem.addData(Event(2, ts(5), 7, "click", 2.0))
      q.processAllAvailable()
      mem.addData(Event(3, ts(45), 7, "view", 3.0))
      q.processAllAvailable()
      // push the watermark far forward to time out session 2
      mem.addData(Event(4, ts(300), 9, "click", 0.5))
      q.processAllAvailable()
      mem.addData(Event(5, ts(600), 9, "click", 0.5))
      q.processAllAvailable()
      val out = spark.table("sessions").orderBy("session_start").collect()
      assert(out.length >= 2, s"got ${out.length} sessions")
      val s1 = out(0)
      assert(s1.getLong(0) == 7 && s1.getLong(3) == 2 &&
        s1.getDouble(4) == 3.0)
      val s2 = out(1)
      assert(s2.getLong(0) == 7 && s2.getLong(3) == 1)
    } finally q.stop()
  }

  test("stream-stream interval join: streaming equals batch, bound enforced") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val joined = EventStreams.attributionJoin(
      clicks.toDF(), views.toDF(), windowMinutes = 60,
      withWatermark = true)
    val q = joined.writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      // user 1: views at 0 and 30, click at 50 → both in the hour;
      // a view at 120 is AFTER the click → excluded;
      // user 2: view at 0, click at 90 → outside the hour → excluded
      views.addData(
        Event(10, ts(0), 1, "view", 0.0),
        Event(11, ts(30), 1, "view", 0.0),
        Event(12, ts(0), 2, "view", 0.0),
        Event(13, ts(120), 1, "view", 0.0))
      clicks.addData(
        Event(1, ts(50), 1, "click", 0.0),
        Event(2, ts(90), 2, "click", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("attr")
        .orderBy("click_id", "view_id").collect()
      assert(streamed.map(r => (r.getLong(0), r.getLong(3))).toSeq ==
        Seq((1L, 10L), (1L, 11L)))
      val batch = EventStreams.attributionJoin(
        Seq(Event(1, ts(50), 1, "click", 0.0),
          Event(2, ts(90), 2, "click", 0.0)).toDF(),
        Seq(Event(10, ts(0), 1, "view", 0.0),
          Event(11, ts(30), 1, "view", 0.0),
          Event(12, ts(0), 2, "view", 0.0),
          Event(13, ts(120), 1, "view", 0.0)).toDF())
        .orderBy("click_id", "view_id").collect()
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("binned batch attribution equals the naive range join on random events") {
    import spark.implicits._
    // randomized boundary torture for the bin-banded batch path: many
    // events at exact bin edges and exact-window distances, compared
    // against the naive (unbanded) range join computed inline
    val rnd = new scala.util.Random(7)
    def tsAt(m: Long) = new java.sql.Timestamp(m * 60L * 1000L)
    val users = (1L to 5L)
    val clicks = (0 until 120).map { i =>
      val m = rnd.nextInt(300).toLong
      Event(i.toLong, tsAt(m), users(rnd.nextInt(users.size)), "click", 0.0)
    }
    val views = (0 until 200).map { i =>
      // half the views land exactly on hour boundaries or exactly 60
      // minutes before a random click-ish minute
      val m = if (i % 2 == 0) (rnd.nextInt(5) * 60).toLong
        else rnd.nextInt(300).toLong
      Event(1000L + i, tsAt(m), users(rnd.nextInt(users.size)), "view", 0.0)
    }
    val got = EventStreams.attributionJoin(clicks.toDF(), views.toDF())
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val want = (for {
      c <- clicks; v <- views
      if v.user_id == c.user_id
      if !v.ts.after(c.ts)
      if v.ts.getTime >= c.ts.getTime - 60L * 60L * 1000L
    } yield (c.event_id, v.event_id)).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("attribution watermark delay derives from the join window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    def delayOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.queryExecution.analyzed.collect {
        case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark =>
          e.delay.microseconds
      }.toSet
    // default: the watermark tolerates lateness up to the attribution
    // window itself — an event late by less than the window can still
    // pair, so it must not be dropped (was a fixed 10 minutes)
    val d90 = EventStreams.attributionJoin(clicks.toDF(), views.toDF(),
      windowMinutes = 90, withWatermark = true)
    assert(delayOf(d90) == Set(90L * 60 * 1000 * 1000))
    // explicit override wins
    val d15 = EventStreams.attributionJoin(clicks.toDF(), views.toDF(),
      windowMinutes = 90, withWatermark = true,
      watermarkDelayMinutes = Some(15))
    assert(delayOf(d15) == Set(15L * 60 * 1000 * 1000))
  }

  test("stream sinks into a managed table via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val env = new graft.frontend.Analyzer.Env().addDecls(
      "create table sunk (user_id int not null, n int not null)")
    val catalog = new graft.frontend.ManagedCatalog(spark, root, env)
    val mem = MemoryStream[Event]
    val agged = mem.toDF().groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n"))
    val q = EventStreams.streamToManagedTable(agged, catalog, "sunk",
      s"$root/_ckpt")
    try {
      mem.addData(Event(1, ts(0), 1, "a", 1.0), Event(2, ts(1), 2, "b", 1.0))
      q.processAllAvailable()
      val rows = catalog.load("sunk").collect()
      assert(rows.length == 2)
    } finally q.stop()
  }

  test("continuous ingestion: stream dedups against a managed fingerprint store") {
    // the kappa-style corpus-ingestion composition: each micro-batch
    // drops rows whose content fingerprint is already in a persistent
    // managed store (cross-BATCH exact dedup — beyond the watermark
    // horizon dropDuplicatesWithinWatermark covers), then appends the
    // novel rows' fingerprints back to the store
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val env = new graft.frontend.Analyzer.Env().addDecls(
      """create table corpus (doc_id int not null, fp string not null);
        |create table fingerprints (fp string not null primary key)""".stripMargin)
    val catalog = new graft.frontend.ManagedCatalog(spark, root, env)
    val mem = MemoryStream[(Long, String)]
    val fingerprinted = graft.pipeline.TextAnalysis.fingerprint(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .select(col("doc_id"), col("fingerprint_md5").as("fp"))
    val q = fingerprinted.writeStream
      .option("checkpointLocation", s"$root/_ckpt")
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        val seen = catalog.load("fingerprints")
        val novel = batch.join(seen, Seq("fp"), "left_anti")
          .select("doc_id", "fp").localCheckpoint(true)
        catalog.overwrite("corpus",
          catalog.load("corpus").unionByName(novel))
        catalog.overwrite("fingerprints",
          seen.unionByName(novel.select("fp")).distinct())
      }
      .start()
    try {
      mem.addData((1L, "the quick brown fox"), (2L, "lorem ipsum dolor"))
      q.processAllAvailable()
      // batch 2 replays doc 1's content under a new id and adds one
      // genuinely new doc — only the new one may land
      mem.addData((10L, "the quick brown fox"), (3L, "completely new text"))
      q.processAllAvailable()
      val ids = catalog.load("corpus").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
      assert(catalog.load("fingerprints").count() == 3)
    } finally q.stop()
  }

  test("batch sessionization matches hand-computed islands") {
    import spark.implicits._
    val events = Seq(
      Event(1, ts(0), 1, "a", 1.0), Event(2, ts(10), 1, "a", 1.0),
      Event(3, ts(60), 1, "a", 1.0), // 50-min gap → new session
      Event(4, ts(0), 2, "b", 2.0))
    val out = EventStreams.sessionizeBatch(events.toDF())
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getLong(0) == 1 && out(0).getLong(3) == 2)
    assert(out(1).getLong(0) == 1 && out(1).getLong(3) == 1)
    assert(out(2).getLong(0) == 2 && out(2).getLong(3) == 1)
  }

  test("file stream over the fixture events dir produces batches") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file source streams a directory of arriving files
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events-000.parquet"))
    // normalize ts to LTZ whatever the fixture vintage stored —
    // the SAME dispatch Tables.loadEvents uses, shared so batch and
    // stream cannot drift
    val stream = Tables.normalizeTs(
      EventStreams.streamFromDir(spark, dir.toString))
    val q = EventStreams.windowedTypeAgg(stream, withWatermark = true)
      .writeStream.format("memory").queryName("file_win")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val n = spark.table("file_win").count()
      val batchN = EventStreams.windowedTypeAgg(
        Tables.load(spark, sf, "events")).count()
      assert(n > 0 && n >= batchN)
    } finally q.stop()
  }

  test("streaming SCD2: sealed versions equal the batch build on a 3-attribute dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(d: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-${d}%02d $h%02d:00:00")
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.scd2Stream(mem.toDS())
      .writeStream.format("memory").queryName("scd2s")
      .outputMode("append").start()
    try {
      // user 7's payload history exercises every rule on the full
      // (event_type, value, props) tuple:
      //  v1 (a,1.0,p) — then re-asserted identically (compacted)
      //  same-ts collision (b,1.0,p) vs (a,9.0,p): tuple LWW picks b
      //    (first attribute dominates, even against a larger value)
      //  v3 (a,1.0,q): SAME event_type+value, props changed — a
      //    change the single-attribute form would have compacted away
      mem.addData(
        EventStreams.Event(1, t(1, 9), 7, "a", 1.0, "p"),
        EventStreams.Event(2, t(1, 12), 7, "a", 1.0, "p"),
        EventStreams.Event(3, t(2, 9), 7, "b", 1.0, "p"),
        EventStreams.Event(4, t(2, 9), 7, "a", 9.0, "p"),
        EventStreams.Event(5, t(3, 9), 7, "a", 1.0, "q"))
      q.processAllAvailable()
      // sentinel key pushes the watermark past every user-7 change
      mem.addData(EventStreams.Event(6, t(20, 0), 9, "x", 0.0, "z"))
      q.processAllAvailable()
      def feed(df: org.apache.spark.sql.DataFrame) = df
        .orderBy("version")
        .select("event_type", "value", "props", "valid_from", "version")
        .collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getString(2),
          r.getTimestamp(3), r.getInt(4)))
      val got = feed(spark.table("scd2s").filter(col("user_id") === 7))
      val batch = feed(graft.pipeline.Temporal.scd2Build(
        Seq((7L, t(1, 9), "a", 1.0, "p"), (7L, t(1, 12), "a", 1.0, "p"),
          (7L, t(2, 9), "b", 1.0, "p"), (7L, t(2, 9), "a", 9.0, "p"),
          (7L, t(3, 9), "a", 1.0, "q"))
          .toDF("user_id", "ts", "event_type", "value", "props"),
        "user_id", "ts", Seq("event_type", "value", "props")))
      assert(got.toSeq == batch.toSeq)
      assert(got.map(_._1).toSeq == Seq("a", "b", "a"))
      assert(got.map(_._3).toSeq == Seq("p", "p", "q"))
      // user 9's own change is unsealed -> nothing emitted for it yet
      assert(spark.table("scd2s").filter(col("user_id") === 9).count() == 0)
    } finally q.stop()
  }

  test("streaming gap-fill: sealed days match the batch spine, gaps carry") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def dayTs(d: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-${d}%02d $h%02d:00:00")
    val mem = MemoryStream[Event]
    val q = EventStreams.gapFillStream(mem.toDS())
      .writeStream.format("memory").queryName("gapfill")
      .outputMode("append").start()
    try {
      // user 7: two obs on day 1 (max 5.0), then day 3 — day 2 is a gap
      mem.addData(
        Event(1, dayTs(1, 9), 7, "click", 2.0),
        Event(2, dayTs(1, 17), 7, "click", 5.0))
      q.processAllAvailable()
      // nothing sealed yet: watermark is still inside day 1
      assert(spark.table("gapfill").count() == 0)
      mem.addData(Event(3, dayTs(3, 12), 7, "view", 3.0))
      q.processAllAvailable()
      // sentinel user pushes the watermark past day 3's end
      mem.addData(Event(4, dayTs(20, 0), 9, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("gapfill").filter(col("user_id") === 7)
        .orderBy("bucket_ts")
        .select("bucket_ts", "val_filled", "n_obs").collect()
        .map(r => (r.getTimestamp(0), r.getDouble(1), r.getLong(2)))
      // identical rows to the batch twin (the ts1 oracle semantics)
      val batch = graft.pipeline.Temporal.resampleFill(
        Seq((7L, dayTs(1, 9), 2.0), (7L, dayTs(1, 17), 5.0),
          (7L, dayTs(3, 12), 3.0)).toDF("user_id", "ts", "value"),
        "user_id", "ts", "value", 86400L)
        .orderBy("bucket_ts")
        .select("bucket_ts", "val_filled", "n_obs").collect()
        .map(r => (r.getTimestamp(0), r.getDouble(1), r.getLong(2)))
      assert(got.toSeq == batch.toSeq)
      assert(got.length == 3 && got(1)._2 == 5.0 && got(1)._3 == 0L)
      // user 9's own day never sealed → trailing silence emits nothing
      assert(spark.table("gapfill").filter(col("user_id") === 9).count() == 0)
    } finally q.stop()
  }
}
