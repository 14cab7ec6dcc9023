package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** The distributed connected-components tier: alternating star
  * contraction must (a) agree exactly with driver union-find on
  * arbitrary graphs and (b) converge in O(log n) rounds — the property
  * that makes it usable on chain-structured near-dup graphs where
  * min-label propagation needs O(diameter) rounds.
  */
class StarContractionSpec extends SparkTestBase {
  import spark.implicits._

  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponentsDistributed(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star contraction labels a mixed graph by component minimum") {
    // components: {1,2,3,7}, {10,11}, {20,21,22} (triangle), plus a
    // duplicate edge and a reversed edge
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (7L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L), (2L, 1L), (1L, 2L))
    val got = components(pairs)
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("star contraction converges on a 200-node chain within 12 rounds (LP would need ~199)") {
    // a chain is the adversarial diameter case: min-label propagation
    // moves the minimum one hop per round; contraction halves paths
    val chain = (1L until 200L).map(i => (i, i + 1))
    val got = Dedup.connectedComponentsDistributed(
      chain.toDF("a", "b"), maxIters = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 200)
    assert(got.values.forall(_ == 1L), got.filter(_._2 != 1L).take(5))
  }

  test("star contraction agrees with the local union-find tier on a pseudo-random graph") {
    // deterministic scrambled graph: 300 nodes, ~450 edges
    val edges = (0 until 450).map { i =>
      val a = (i * 7919L) % 300L
      val b = (i * 104729L + 13L) % 300L
      (a, b)
    }.filter { case (a, b) => a != b }
    val dist = components(edges)
    // the driver tier (clusterize under threshold) is the reference
    val local = Dedup.clusterize(edges.toDF("a", "b"), "id")
      .select("id", "component")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == local)
  }

  test("string ids work (generic ordering, no numeric assumption)") {
    val got = Dedup.connectedComponentsDistributed(
      Seq(("b", "c"), ("a", "b"), ("x", "y")).toDF("a", "b"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("clusterizeHamming64 equals clusterize over the full pair relation") {
    // planted fingerprint population: exact cliques (identical fp),
    // near chains bridging cliques, far singletons, and a singleton
    // fingerprint near a clique — every structural case
    val fps = Seq(
      // clique A: ids 1-4 identical fp
      (1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L),
      // clique B: ids 10-11 at hamming 2 from A (bits 0,1 flipped)
      (10L, 103L), (11L, 103L),
      // singleton fp near B (1 bit from 103)
      (20L, 102L),
      // far clique: ids 30-31
      (30L, Long.MinValue), (31L, Long.MinValue),
      // isolated far singleton — appears in NO pair, so in no output
      (40L, 0x0F0F0F0F0F0F0F0FL)
    ).toDF("id", "fp")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "component", "cluster_size", "is_canonical")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
        .toSet
    val viaFullPairs = norm(Dedup.clusterize(
      Dedup.hammingPairs64(fps, "id", "fp", maxHamming = 3), "id"))
    val collapsed = norm(Dedup.clusterizeHamming64(
      fps, "id", "fp", maxHamming = 3))
    assert(collapsed == viaFullPairs)
    // sanity: A+B+20 merge into one component rooted at 1; 40 absent
    assert(collapsed.exists { case (id, comp, size, _) =>
      id == 20L && comp == 1L && size == 7L })
    assert(!collapsed.exists(_._1 == 40L))
    // and the collapsed path agrees with itself on the forced
    // distributed tier
    val dist = norm(Dedup.clusterizeHamming64(
      fps, "id", "fp", maxHamming = 3, localThreshold = 0L))
    assert(dist == collapsed)
  }
}
