package graft.tools

import org.apache.spark.sql.functions._

/** Measures the RECALL of the SimHash-64 auto-cap posture (VERDICT r11
  * next-round #4): above `autoCapDocs` docs, [[graft.dedup.Dedup
  * .simHashPairs]] caps band buckets at 512 distinct prints — the
  * documented bounded-recall answer to the 64-bit banding floor — but
  * until this probe the loss had no number. Runs the capped posture
  * vs the forced exact cover (maxPerBucket = Some(Int.MaxValue)) at a
  * given SF and reports pair recall = |capped ∩ exact| / |exact|.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.SimHashRecallProbe testdata/sf10"
  */
object SimHashRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.core.Graft.session("simhash-recall")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
    // the q_dedup_simhash parameters (maxHamming = 7), capped exactly
    // as the auto posture caps (512 prints per band bucket)
    def pairs(cap: Option[Int]) = graft.dedup.Dedup
      .simHashPairs(docs, "doc_id", "text", maxHamming = 7,
        maxPerBucket = cap)
      .select(col("a"), col("b"))
    val t0 = System.nanoTime()
    val exact = pairs(Some(Int.MaxValue))
    val nExact = exact.count()
    val t1 = System.nanoTime()
    val capped = pairs(Some(512))
    val nCapped = capped.count()
    val t2 = System.nanoTime()
    val nHit = capped.join(exact, Seq("a", "b"), "left_semi").count()
    println(
      f"[simhash-recall] dir=$sfDir exact=$nExact (${(t1 - t0) / 1e9}%.1f s) " +
        f"capped=$nCapped (${(t2 - t1) / 1e9}%.1f s) hit=$nHit " +
        f"recall=${if (nExact == 0) 1.0 else nHit.toDouble / nExact}%.4f")
    exact.unpersist()
    capped.unpersist()
    spark.stop()
  }
}
