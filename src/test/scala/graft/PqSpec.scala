package graft

import graft.similarity.{Ann, Pq}
import org.apache.spark.sql.functions._

/** Product quantization: build determinism, code ranges, compression
  * shape, and ADC ranking sanity against the exact ranking.
  */
class PqSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("pqBuild: m codes per vector, all within [0, k)") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val idx = Pq.pqBuild(e, "vec_id", "embedding", m = 4, k = 16, iters = 1)
    assert(idx.codebooks.length == 4)
    assert(idx.codebooks.forall(_.length == 16))
    assert(idx.codebooks.forall(_.forall(_.length == 16))) // 64 / 4
    val rows = idx.codes.collect()
    assert(rows.length == e.count())
    rows.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 4)
      assert(cs.forall(c => c >= 0 && c < 16))
    }
  }

  test("pqBuild rejects inputs with fewer than k vectors, with a clear message") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet").limit(5)
    val ex = intercept[IllegalArgumentException] {
      Pq.pqBuild(e, "vec_id", "embedding", m = 4, k = 16, iters = 1)
    }
    assert(ex.getMessage.contains("needs >= 16 vectors"))
    assert(ex.getMessage.contains("got 5"))
  }

  test("pqBuild is deterministic across invocations") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val a = Pq.pqBuild(e, "vec_id", "embedding", m = 4, k = 16, iters = 2)
    val b = Pq.pqBuild(e, "vec_id", "embedding", m = 4, k = 16, iters = 2)
    assert(a.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      b.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val ca = a.codes.orderBy("vec_id").collect().map(_.getSeq[Int](1).toSeq).toSeq
    val cb = b.codes.orderBy("vec_id").collect().map(_.getSeq[Int](1).toSeq).toSeq
    assert(ca == cb)
  }

  test("ADC top-k overlaps the exact cosine ranking (recall sanity)") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val probes = e.filter(col("vec_id") < 8L)
    val idx = Pq.pqBuild(e, "vec_id", "embedding", m = 4, k = 16, iters = 2)
    val pq = Pq.pqTopK(idx, probes, "vec_id", "embedding", kNn = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Ann.topKExact(
      probes.withColumnRenamed("vec_id", "probe_id"),
      e.withColumnRenamed("vec_id", "cand_id"),
      "probe_id", "cand_id", "embedding", 10
    ).collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // 4×16 codes over random 64-dim data is a coarse quantizer — just
    // require meaningful overlap, not high recall
    val overlap = pq.intersect(exact).size.toDouble / exact.size
    assert(overlap > 0.1, s"overlap=$overlap")
  }

  test("IVF-PQ with nProbe = nLists degenerates to plain PQ exactly") {
    // probing every list removes the coarse filter, so the composite
    // must reproduce pqTopK bit-for-bit — the algebraic identity that
    // pins the candidate-selection join against the ADC ranking
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val probes = e.filter(col("vec_id") < 8L)
    val ivf = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 8, iters = 2)
    val pqi = Pq.pqBuild(e, "vec_id", "embedding", m = 4, k = 16, iters = 1)
    val full = Pq.topKIvfPq(ivf, pqi, probes, "vec_id", "embedding",
      kNn = 5, nProbe = 8).orderBy("probe_id", "rank").collect().map(_.toSeq).toSeq
    val plain = Pq.pqTopK(pqi, probes, "vec_id", "embedding", kNn = 5)
      .orderBy("probe_id", "rank").collect().map(_.toSeq).toSeq
    assert(full == plain)
    assert(full.nonEmpty)
  }

  test("pqTopKRerank with shortlist >= corpus degenerates to the exact " +
    "cosine top-k (the refine stage's correctness anchor)") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val probes = e.filter(col("vec_id") < 8L)
    val n = e.count().toInt
    val idx = Pq.pqBuild(e, "vec_id", "embedding", m = 4, k = 16, iters = 1)
    val reranked = Pq
      .pqTopKRerank(idx, e, probes, "vec_id", "embedding", kNn = 5, shortlist = n)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val exact = Ann
      .topKExact(
        probes.withColumnRenamed("vec_id", "probe_id"),
        e.withColumnRenamed("vec_id", "cand_id"),
        "probe_id", "cand_id", "embedding", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(reranked == exact,
      s"refine-at-full-shortlist diverged from exact: ${(exact -- reranked).take(3)}")
  }

  test("pqTopKRerank recall at a tight shortlist dominates raw ADC recall") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val probes = e.filter(col("vec_id") < 8L)
    val idx = Pq.pqBuild(e, "vec_id", "embedding", m = 4, k = 16, iters = 1)
    val exact = Ann
      .topKExact(
        probes.withColumnRenamed("vec_id", "probe_id"),
        e.withColumnRenamed("vec_id", "cand_id"),
        "probe_id", "cand_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    def hits(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet.intersect(exact).size
    val adc = hits(Pq.pqTopK(idx, probes, "vec_id", "embedding", kNn = 5))
    val rr = hits(Pq.pqTopKRerank(idx, e, probes, "vec_id", "embedding",
      kNn = 5, shortlist = 8))
    assert(rr >= adc, s"re-rank recall $rr fell below raw ADC $adc")
  }

  test("IVF-PQ with few probes returns a subset-ranked list per probe") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val probes = e.filter(col("vec_id") < 8L)
    val ivf = Ann.ivfBuild(e, "vec_id", "embedding", nLists = 16, iters = 2)
    val pqi = Pq.pqBuild(e, "vec_id", "embedding", m = 4, k = 16, iters = 1)
    val out = Pq.topKIvfPq(ivf, pqi, probes, "vec_id", "embedding",
      kNn = 5, nProbe = 4).collect()
    assert(out.nonEmpty)
    // ranks are 1..n per probe and distances ascend with rank
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq)
      val ds = sorted.map(_.getDouble(3)).toSeq
      assert(ds == ds.sorted)
    }
  }
}
