package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of the q_graph_pagerank sf10 wall (48.5 s,
  * 7.8x/decade in BENCH_sf10_r13.json — the dominant face of the broad
  * sweep). Times, separately:
  *   1. edge construction (orders JOIN lineitem + distinct — the query
  *      preamble, not the operator);
  *   2. the operator's shared state build (out-degree join + nodes);
  *   3. the full 3-round pageRank at each posture (shuffle Pregel vs
  *      broadcast-ranks), A/B on identical inputs;
  * and prints node/edge cardinalities so the per-round shuffle volume
  * is attributable.
  *
  * Usage: tools/run_main.sh graft.tools.PageRankProbe testdata/sf10
  *        tools/run_main.sh graft.tools.PageRankProbe synthetic:8000000:8
  *
  * The synthetic mode (VERDICT r14 #4) answers the question the sf10
  * fixture cannot: the broadcast-ranks posture caps at 4M nodes
  * (driver-heap bound), and the CommonCrawl design point is ~90M
  * domains — so what does the SHUFFLE posture's per-round wall look
  * like past the cap? It builds a hash-random graph of N nodes / N·d
  * edges, forces each posture, and times iters=3 vs iters=6 so the
  * marginal per-round cost is measured separately from the shared
  * state build (edge cache, out-degrees, posture pick).
  */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    if (args(0).startsWith("synthetic:")) { synthetic(args(0)); return }
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${graft.core.Graft.cpus}]")
      .config("spark.sql.shuffle.partitions", graft.core.Graft.cpus)
      .config("spark.sql.files.openCostInBytes", "16384")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[prprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val o = graft.core.Graft.table(spark, sfDir, "orders")
    val l = graft.core.Graft.table(spark, sfDir, "lineitem")
    val even = col("l_orderkey") % 2 === 0
    def edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(
        when(even, col("o_custkey") * 2)
          .otherwise(col("l_suppkey") * 2 + 1).cast("long").as("src"),
        when(even, col("l_suppkey") * 2 + 1)
          .otherwise(col("o_custkey") * 2).cast("long").as("dst"))
      .distinct()

    // 1. edge build alone (recomputed inside the operator run below —
    //    this stage isolates the query preamble's share of the wall)
    val nEdges = time("edge build (o JOIN l + distinct)") { edges.count() }
    time("edge build, shuffle_hash hint (no 60M-row sorts)") {
      o.hint("shuffle_hash").join(l, col("o_orderkey") === col("l_orderkey"))
        .select(
          when(even, col("o_custkey") * 2)
            .otherwise(col("l_suppkey") * 2 + 1).cast("long").as("src"),
          when(even, col("l_suppkey") * 2 + 1)
            .otherwise(col("o_custkey") * 2).cast("long").as("dst"))
        .distinct().count()
    }

    val e = edges.persist()
    e.count() // populate the cache so operator timings exclude the preamble

    // 2. shared state build
    val nNodes = time("nodes distinct") {
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct().count()
    }
    time("outdeg + eo join") {
      val outDeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      e.join(outDeg, "src").count()
    }
    println(s"[prprobe] edges=$nEdges nodes=$nNodes")

    // 3. full operator A/B (cached edge input for both)
    for (bound <- Seq("0", s"${nNodes + 1}"); rep <- 1 to 2) {
      spark.conf.set("spark.graft.pagerank.broadcastMaxNodes", bound)
      val label = if (bound == "0") "shuffle posture" else "broadcast posture"
      time(s"pageRank 3 rounds [$label] run$rep") {
        val (out, cleanup) = graft.ops.LinkGraph.pageRankWithCleanup(e, iters = 3)
        val top = out.orderBy(col("rank").desc, col("node").asc).limit(100)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
        cleanup()
        println(s"[prprobe]   top5=${top.take(5)}")
      }
    }
    spark.stop()
  }

  /** `synthetic:<nodes>:<avgDegree>` — per-round wall of each posture
    * past the broadcast cap. Edges are (id % n) -> hash(id)-derived
    * dst: uniform-random structure, every node a source, so per-round
    * shuffle volume is the honest n·d edge-contribution stream with
    * map-side combine (sum is partial-aggregable by dst inside each
    * src partition — the "pre-combine" is already free in the plan).
    */
  private def synthetic(spec: String): Unit = {
    val parts = spec.split(":")
    val n = parts(1).toLong
    val d = parts(2).toInt
    val spark = SparkSession.builder()
      .master(s"local[${graft.core.Graft.cpus}]")
      .config("spark.sql.shuffle.partitions", graft.core.Graft.cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): (Double, T) = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[prprobe] $label: $s%.2f s")
      (s, r)
    }

    val edges = spark.range(0L, n * d)
      .select((col("id") % n).as("src"),
        pmod(hash(col("id")), lit(n)).cast("long").as("dst"))
      .persist()
    println(s"[prprobe] synthetic nodes=$n edges=${edges.count()} (d=$d)")

    def ranked(iters: Int): Unit = {
      val (out, cleanup) = graft.ops.LinkGraph.pageRankWithCleanup(edges, iters = iters)
      val top = out.orderBy(col("rank").desc, col("node").asc).limit(5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toVector
      cleanup()
      println(s"[prprobe]   top5=$top")
    }

    val postures =
      if (n > 4000000L) Seq("0" -> "shuffle") // past the cap: the only legal posture
      else Seq("0" -> "shuffle", s"${n + 1}" -> "broadcast")
    for ((bound, label) <- postures) {
      spark.conf.set("spark.graft.pagerank.broadcastMaxNodes", bound)
      ranked(1) // warm the posture's codegen outside the measured runs
      val (t3, _) = time(s"pageRank iters=3 [$label]")(ranked(3))
      val (t6, _) = time(s"pageRank iters=6 [$label]")(ranked(6))
      println(f"[prprobe] per-round marginal [$label] = ${(t6 - t3) / 3}%.2f s " +
        f"(state build + 3 rounds = $t3%.2f s)")
    }
    spark.stop()
  }
}
