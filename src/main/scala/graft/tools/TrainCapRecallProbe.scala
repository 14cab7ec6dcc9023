package graft.tools

import org.apache.spark.sql.functions._

/** Does the r15 bounded Lloyd training (trainCap: md5-ordered sample,
  * FAISS max_points_per_centroid posture) cost recall? This probe
  * answers with measurements, not argument: at the given fixture it
  * builds the IVF and PQ indexes twice — unbounded training
  * (trainCap=0, the pre-r15 behavior) and the default bounded sample
  * — and reports recall@10 against the exact quantized-cosine top-10
  * on the same probe set for each posture. The expectation from the
  * FAISS literature is parity: codebook/centroid quality saturates
  * orders of magnitude before the corpus is exhausted, so the sampled
  * means land within k-means noise of the full-corpus means.
  *
  * Usage: tools/run_main.sh graft.tools.TrainCapRecallProbe \
  *          testdata/sf10 [nProbes=48]
  */
object TrainCapRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "testdata/sf10"
    val nProbes = if (args.length > 1) args(1).toInt else 48
    val spark = graft.core.Graft.session("traincap-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val e = graft.core.Graft.table(spark, sfDir, "embeddings")
    val n = e.count()
    println(s"[traincap] corpus=$n probes=$nProbes " +
      s"cap=${graft.similarity.Pq.DefaultTrainCap} " +
      s"(binds=${n > graft.similarity.Pq.DefaultTrainCap})")
    val probes = e.filter(col("vec_id") < nProbes.toLong)

    // exact truth once (probe_id, cand_id) at k=10
    val exact = graft.similarity.Ann
      .topKExact(
        probes.withColumnRenamed("vec_id", "probe_id"),
        e.withColumnRenamed("vec_id", "cand_id"),
        "probe_id", "cand_id", "embedding", k = 10)
      .select("probe_id", "cand_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    println(s"[traincap] exact truth rows=${exact.size}")

    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("probe_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(exact).size.toDouble / exact.size
    }

    for (cap <- Seq(0, -1)) { // 0 = unbounded (pre-r15); -1/default = bounded
      val label = if (cap == 0) "unbounded" else "bounded"
      val ivf = graft.similarity.Ann.ivfBuild(
        e, "vec_id", "embedding", nLists = 16, iters = 2,
        trainCap = if (cap == 0) 0 else -1)
      val rIvf = recall(graft.similarity.Ann
        .topKIvf(ivf, probes, "vec_id", "embedding", k = 10, nProbe = 4))
      val pq = graft.similarity.Pq.pqBuild(
        e, "vec_id", "embedding", m = 4, k = 16, iters = 1,
        trainCap = if (cap == 0) 0 else graft.similarity.Pq.DefaultTrainCap)
      val rPq = recall(graft.similarity.Pq
        .pqTopK(pq, probes, "vec_id", "embedding", kNn = 10))
      val rPqR = recall(graft.similarity.Pq
        .pqTopKRerank(pq, e, probes, "vec_id", "embedding", kNn = 10, shortlist = 64))
      val rIvfPq = recall(graft.similarity.Pq
        .topKIvfPqRerank(ivf, pq, e, probes, "vec_id", "embedding",
          kNn = 10, nProbe = 4, shortlist = 64))
      println(f"[traincap] $label%-9s recall@10: ivf(nProbe=4)=$rIvf%.4f " +
        f"pq-adc=$rPq%.4f pq-rerank64=$rPqR%.4f ivfpq-rerank=$rIvfPq%.4f")
    }
    spark.stop()
  }
}
