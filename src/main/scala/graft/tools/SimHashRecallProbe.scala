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
  *
  * Optional second arg `copies` (default 1) unions that many DISJOINT
  * letter-permuted images of the corpus (per-copy Caesar shift — the
  * tools/gen_scale.py trick, in-engine: a letter permutation preserves
  * every within-copy shingle/simhash relation exactly while making
  * cross-copy shingle universes disjoint), re-keyed by a 10M stride.
  * `testdata/sf10 3` = a 1.5M-doc corpus — past the 1M exact-tier
  * boundary, where the capped posture is the live plan and needs a
  * current recall figure (VERDICT r13 #7).
  */
object SimHashRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val copies = if (args.length > 1) args(1).toInt else 1
    val spark = graft.core.Graft.session("simhash-recall")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val base = graft.core.Graft.table(spark, sfDir, "documents")
    // copy i Caesar-shifts by i % 26, so copy 26 would be the IDENTITY
    // permutation — byte-identical text under different doc_ids makes
    // cross-copy shingle universes non-disjoint and distorts the
    // recall figure (ADVICE r14; gen_scale.py composes a TAU
    // permutation past the same exhaustion point — this probe does not)
    require(copies <= 26,
      s"copies=$copies exhausts the Caesar group (26 shifts); compose " +
        "a second permutation as tools/gen_scale.py does before going past it")
    val ab = "abcdefghijklmnopqrstuvwxyz"
    val docs = (0 until copies).map { i =>
      if (i == 0) base.select(col("doc_id"), col("text"))
      else base.select(
        (col("doc_id") + lit(10000000L * i)).as("doc_id"),
        translate(col("text"), ab, ab.substring(i % 26) +
          ab.substring(0, i % 26)).as("text"))
    }.reduce(_.unionByName(_))
    println(s"[simhash-recall] corpus=${docs.count()} docs ($copies copies)")
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
