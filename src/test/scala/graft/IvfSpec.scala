package graft

import graft.similarity.Ann
import org.apache.spark.sql.functions._

/** IVF ANN: index build determinism and recall against the exact
  * brute-force ranking on the real embeddings table.
  */
class IvfSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("ivfBuild assigns every vector to exactly one of nLists lists") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val idx = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 8, iters = 2)
    assert(idx.centroids.length == 8)
    val n = e.count()
    assert(idx.assignments.count() == n)
    val lists = idx.assignments.select("list_id").distinct().count()
    assert(lists > 1 && lists <= 8)
  }

  test("topKIvf recall@5 vs exact is high with nProbe=4 of 8 lists") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val probes = e.filter(col("vec_id") < 5L)
    val idx = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 8, iters = 2)
    val ivf = Ann.topKIvf(idx, probes, "vec_id", "embedding", k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Ann.topKFast(
      probes.withColumnRenamed("vec_id", "probe_id"),
      e.withColumnRenamed("vec_id", "cand_id"),
      "probe_id", "cand_id", "embedding", 5
    ).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall") // random 64-dim data: half the lists scanned
  }

  test("ivf build is deterministic (same centroids both runs)") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val a = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 4, iters = 1)
    val b = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 4, iters = 1)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
  }
}
