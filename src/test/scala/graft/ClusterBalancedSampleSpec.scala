package graft

import graft.similarity.Ann
import graft.text.Sampling
import org.apache.spark.sql.functions._

/** Cluster-balanced subset selection over a hand-built IvfIndex:
  * quota capping, rare-cluster preservation, salted-draw determinism
  * and salt independence — the properties the curation op exists for.
  */
class ClusterBalancedSampleSpec extends SparkTestBase {
  import spark.implicits._

  /** 3 clusters with skewed sizes: 0 → 50 members, 1 → 7, 2 → 1.
    * Centroids are irrelevant to the sampler (assignment is given).
    */
  private def skewedIndex: Ann.IvfIndex = {
    val rows =
      (0 until 50).map(i => (i.toLong, 0)) ++
        (100 until 107).map(i => (i.toLong, 1)) ++
        Seq((200L, 2))
    val assignments = rows
      .toDF("vec_id", "list_id")
      .withColumn("embedding", array(lit(0.0f)))
      .select(col("vec_id"), col("embedding"), col("list_id"))
    Ann.IvfIndex(Array(Array(0.0), Array(0.0), Array(0.0)), assignments)
  }

  test("caps dominant clusters at quota, keeps rare clusters whole") {
    val out = Ann
      .clusterBalancedSample(skewedIndex, "vec_id", quota = 10, salt = "s1")
      .select($"cluster", $"vec_id")
      .as[(Long, Long)]
      .collect()
    val bySize = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySize == Map(0L -> 10, 1L -> 7, 2L -> 1))
  }

  test("the draw is the salted-md5 order, reproducible across runs") {
    // the expectation, computed relationally from the same contract
    val truth = (0 until 50)
      .map(_.toLong)
      .toDF("vec_id")
      .select($"vec_id", Sampling.saltedHex("s1", $"vec_id").as("hk"))
      .orderBy($"hk".asc, $"vec_id".asc)
      .limit(10)
      .select("vec_id")
      .as[Long]
      .collect()
      .toSet
    val run1 = Ann
      .clusterBalancedSample(skewedIndex, "vec_id", quota = 10, salt = "s1")
      .filter($"cluster" === 0L).select("vec_id").as[Long].collect().toSet
    val run2 = Ann
      .clusterBalancedSample(skewedIndex, "vec_id", quota = 10, salt = "s1")
      .filter($"cluster" === 0L).select("vec_id").as[Long].collect().toSet
    assert(run1 == truth)
    assert(run2 == truth)
  }

  test("a different salt gives an independent draw of the same size") {
    def draw(salt: String): Set[Long] = Ann
      .clusterBalancedSample(skewedIndex, "vec_id", quota = 10, salt = salt)
      .filter($"cluster" === 0L).select("vec_id").as[Long].collect().toSet
    val a = draw("s1")
    val b = draw("s2")
    assert(a.size == 10 && b.size == 10)
    // 10-of-50 draws colliding entirely is astronomically unlikely;
    // both being valid subsets of cluster 0 is the invariant
    assert(a != b)
    assert((a ++ b).forall(_ < 50L))
  }
}
