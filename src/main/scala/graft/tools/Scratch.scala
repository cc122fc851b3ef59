package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bisect harness for the pageRankUntilStable checkpoint-plan blowup
  * (cited from Graph.scala): replicates the real round shape on a
  * synthetic graph and prints per-round wall / optimized-plan size /
  * RDD chain depth. `variant` strips pieces:
  *  - "full": delta join folded INTO the checkpointed frame (the
  *    pre-fix shape) — per-round cost grows ~2.5×/round from ~r16
  *  - "sep": checkpoint the round result, delta as a separate join
  *    (the shipped shape) — flat plan size, flat wall
  *  - "noprev"/"noleft": isolate which join drives the growth
  *  - "cc [log2n]": deep-round probe for Cluster.connectedComponents
  *    — path graph of 2^log2n nodes (default 19, ~20 rounds; rounds
  *    scale with log2 diameter, data stays small) printing per-round
  *    wall; attests the CC loop has no post-round-15 plan blowup
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val variant = if (args.nonEmpty) args(0) else "full"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    if (variant == "ckpt") {
      // Truncation-strategy probe (r12 optimization round): which
      // lineage-truncation mechanism preserves the frame's hash
      // partitioning into downstream plans? Prints the captured
      // output partitioning and the exchange/sort count of a keyed
      // self-join for (a) localCheckpoint under AQE, (b) persist,
      // (c) localCheckpoint with AQE disabled around the checkpoint.
      val df = spark.range(200000)
        .select((col("id") % 1000).as("k"), col("id").as("v"))
      def probe(name: String, d: DataFrame): Unit = {
        val agg = d.groupBy("k").agg(sum("v").as("s"))
        val j = d.join(agg, "k")
        val plan = j.queryExecution.executedPlan.toString
        val ex = plan.split("Exchange").length - 1
        val so = plan.split("\\bSort\\b").length - 1
        println(s"$name: part=${d.queryExecution.executedPlan.outputPartitioning}" +
          s" joinExchanges=$ex joinSorts=$so")
      }
      probe("localCkpt+AQE",
        df.repartition(8, col("k")).localCheckpoint(true))
      val p = df.repartition(8, col("k")).persist()
      p.count()
      probe("persist", p)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val c = df.repartition(8, col("k")).localCheckpoint(true)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      probe("localCkpt-noAQE", c)
      spark.stop()
      return
    }

    if (variant == "gr2") {
      // Dangling-redistribution double-reference probe: with
      // redistributeDangling the round function reads `ranks` TWICE
      // (in-mass join + dangling sum), so the lazy plan doubles per
      // round between checkpoints (bounded 2^checkpointEvery). This
      // measures whether truncation + exchange reuse contain it:
      // wall and plan size must stay ~linear in iters for both modes.
      val dir = if (args.length >= 2) args(1) else "/root/testdata/sf0.1"
      val ord = graft.Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey")
      val li = graft.Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
      val edges = ord.join(li, ord("o_orderkey") === li("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      for (re <- Seq(false, true); iters <- Seq(5, 10, 20)) {
        val t0 = System.nanoTime()
        val out = graft.pipeline.Graph.pageRank(edges, iters = iters,
          redistributeDangling = re)
        val planLen = out.queryExecution.optimizedPlan.toString.length
        val n = out.count()
        System.err.println(s"SCRATCH[gr2] redist=$re iters=$iters n=$n " +
          s"plan=$planLen wall=" +
          Fmt.fmt("%.2f", (System.nanoTime() - t0) / 1e9) + "s")
      }
      spark.stop()
      return
    }

    if (variant == "cc") {
      val log2n = if (args.length >= 2) args(1).toInt else 19
      val n = 1L << log2n
      val pairs = spark.range(0L, n - 1)
        .select(col("id").as("id1"), (col("id") + 1).as("id2"))
      var last = System.nanoTime()
      val t0 = last
      val (labels, stats) = graft.pipeline.Cluster
        .connectedComponentsWithStats(pairs, maxIters = log2n + 8,
          onRound = { (r, conv) =>
            val now = System.nanoTime()
            System.err.println(f"SCRATCH[cc] r=$r conv=$conv " +
              "wall=" + Fmt.fmt("%.2f", (now - last) / 1e9) + "s")
            last = now
          })
      val nLab = labels.count()
      val nClusters = labels.select("cluster_id").distinct().count()
      System.err.println(f"SCRATCH[cc] n=$n rounds=${stats.rounds} " +
        f"converged=${stats.converged} labeled=$nLab clusters=$nClusters " +
        "total=" + Fmt.fmt("%.1f", (System.nanoTime() - t0) / 1e9) + "s")
      spark.stop()
      return
    }

    def trunc(df: DataFrame): DataFrame = df.localCheckpoint(true)

    val fwd = (1L to 5000L).map { i =>
      (i % 1000 + 1, 1001 + (i * i * 13 + i * 7) % 500)
    }
    val edges0 = (fwd ++ fwd.map(p => (p._2, p._1))).toDF("src", "dst")

    val e = edges0.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val edgesWithDeg = trunc(e.join(outdeg, "src").repartition(8, col("src")))
    val nodes = trunc(edgesWithDeg.select(col("src").as("node"))
      .union(edgesWithDeg.select(col("dst").as("node"))).distinct())
    val n = nodes.count()
    val scale = 1000000000000L
    val teleport = (scale * 15L / 100L) / n

    def round(ranks: DataFrame): DataFrame = {
      val inMass = edgesWithDeg
        .join(ranks, edgesWithDeg("src") === ranks("node"))
        .select(col("dst"),
          expr(s"(85 * (rank DIV outdeg)) DIV 100").as("contrib"))
        .groupBy("dst").agg(sum("contrib").as("in_mass"))
      if (variant == "noleft")
        inMass.select(col("dst").as("node"),
          (lit(teleport) + col("in_mass")).as("rank"))
      else
        nodes.join(inMass, nodes("node") === inMass("dst"), "left")
          .select(col("node"),
            (lit(teleport) + coalesce(col("in_mass"), lit(0L))).as("rank"))
    }

    var ranks = trunc(nodes.select(col("node"), lit(scale / n).as("rank")))
    var last = System.nanoTime()
    for (r <- 1 to 26) {
      val prev = ranks.withColumnRenamed("rank", "__prev")
      var d = 0L
      if (variant == "sep") {
        val next = trunc(round(ranks))
        d = next.join(prev, "node")
          .agg(max(abs(col("rank") - col("__prev")))).head().getLong(0)
        ranks = next
      } else {
        val joined =
          if (variant == "noprev") round(ranks).withColumn("__delta", lit(0L))
          else round(ranks).join(prev, "node")
            .select(col("node"), col("rank"),
              abs(col("rank") - col("__prev")).as("__delta"))
        val next = trunc(joined)
        d = next.agg(max("__delta")).head().getLong(0)
        ranks = next.select("node", "rank")
      }
      val planLen = ranks.queryExecution.optimizedPlan.toString.length
      val nCons = ranks.rdd.toDebugString.linesIterator.size
      val now = System.nanoTime()
      System.err.println(f"SCRATCH[$variant] r=$r delta=$d cons=$nCons " +
        f"plan=$planLen wall=" + Fmt.fmt("%.2f", (now - last) / 1e9) + "s")
      last = now
    }
    spark.stop()
  }
}
