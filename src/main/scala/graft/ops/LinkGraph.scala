package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph ranking: integer-exact PageRank (Page et al. '99), the
  * domain-quality weighting a crawl-scale corpus runs before sampling
  * (CommonCrawl publishes exactly this as its harmonic/PageRank domain
  * ranks; quality-weighted mixtures consume it as a per-domain prior).
  *
  * Beside `Dedup.connectedComponents` (the only other iterative graph
  * op in the engine) this adds the weighted-propagation family:
  * rank mass flows along out-edges with damping.
  *
  * Determinism: all arithmetic is scaled BIGINT with floor division —
  * rank_0 = `scale`, each round
  *
  *   rank'(v) = base + Σ_{(u,v)∈E} (rank(u)·dampNum) div (dampDen·out(u))
  *
  * with base = (scale·(dampDen−dampNum)) div dampDen. No float touches
  * a rank, so any engine replays it bit-for-bit (DuckDB: `//`). Floor
  * division leaks ≤1 unit per edge per round — irrelevant at
  * scale=10⁶ — and dangling-node mass evaporates (the standard
  * simplification; ranks are relative weights, not a distribution).
  *
  * Scale shape (the 100 TB story): this is the canonical Pregel/GraphX
  * iteration expressed as DataFrame joins —
  *   - `edges` is pre-joined with out-degrees ONCE and cached; the
  *     per-round work is one join of the rank table to the edge table
  *     on src and one sum-by-dst — two shuffles per round, both on
  *     8-byte keys carrying 8-byte values, never adjacency payloads;
  *   - ranks are re-keyed by node so AQE can reuse the exchange;
  *   - lineage is truncated with `localCheckpoint` every
  *     `checkpointEvery` rounds so 50-round runs don't build a
  *     50-deep plan (the classic iterative-Spark failure mode).
  * Overflow headroom: max rank ≤ n·scale, so rank·dampNum needs
  * n·scale·dampNum < 2⁶³ — at scale=10⁶ that admits ~10¹¹ nodes.
  */
object LinkGraph {

  /** @param edges  (src: Long, dst: Long) — caller pre-distincts.
    * @return (node: Long, rank: Long) after `iters` rounds.
    */
  def pageRank(
      edges: DataFrame,
      iters: Int,
      scale: Long = 1000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L,
      checkpointEvery: Int = 5): DataFrame =
    pageRankWithCleanup(edges, iters, scale, dampNum, dampDen,
      checkpointEvery)._1

  /** [[pageRank]] plus an explicit storage release handle, mirroring
    * [[graft.dedup.Dedup.connectedComponentsDistributedWithCleanup]]:
    * the returned frame is backed by the final localCheckpoint, whose
    * blocks DataFrame.unpersist cannot free (no-op on a
    * LogicalRDD-backed frame) — callers that materialize a derivative
    * call `cleanup()` to release them immediately instead of leaking
    * storage across repeated invocations (RepeatGuardSpec pins this).
    * Intermediate cadence checkpoints are freed inside the loop as
    * soon as the next one materializes.
    */
  def pageRankWithCleanup(
      edges: DataFrame,
      iters: Int,
      scale: Long = 1000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L,
      checkpointEvery: Int = 5): (DataFrame, () => Unit) = {
    require(iters >= 1, "iters >= 1")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // edge list annotated with out-degree, built once, reused per round
    val eo = e.join(outDeg, "src").persist()

    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist()

    val base = (scale * (dampDen - dampNum)) / dampDen
    var ranks = nodes.select(col("node"), lit(scale).as("rank"))
    var prevCheckpoint: Option[org.apache.spark.rdd.RDD[_]] = None
    def releasePrev(next: DataFrame): Unit = {
      // the new checkpoint is eager, so the previous cadence
      // checkpoint has no readers left — free its blocks now
      prevCheckpoint.foreach(_.unpersist(blocking = false))
      prevCheckpoint = graft.core.Graft.checkpointRdd(next)
    }
    for (i <- 1 to iters) {
      val contribs = eo
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          expr(s"(rank * ${dampNum}L) DIV (${dampDen}L * outdeg)").as("c"))
        .groupBy("dst")
        .agg(sum("c").as("in_mass"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("in_mass"), lit(0L))).as("rank"))
      if (i % checkpointEvery == 0 && i < iters) {
        ranks = ranks.localCheckpoint()
        releasePrev(ranks)
      }
    }
    // materialize before dropping the shared caches (localCheckpoint is
    // eager) so the returned frame never recomputes the edge build
    val out = ranks.localCheckpoint()
    releasePrev(out)
    eo.unpersist()
    nodes.unpersist()
    (out, () => prevCheckpoint.foreach(_.unpersist(blocking = false)))
  }
}
