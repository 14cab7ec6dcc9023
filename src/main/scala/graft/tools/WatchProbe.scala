package graft.tools

import org.apache.spark.sql.functions._

/** Stage decomposition of the two 5.7×/decade watch items (VERDICT
  * r14 #5): q_ann_topk_pq and q_text_winnow_pairs. Each face's wall is
  * split into its generation / scoring / ranking stages with the
  * intermediate cardinalities printed, so the decade ratio is
  * attributable: output-bound growth (pair/candidate counts rising
  * with the fixture) is a fixture property; a stage whose wall grows
  * faster than its input AND output is a creeping quadratic.
  *
  * Usage: tools/run_main.sh graft.tools.WatchProbe testdata/sf1
  *        tools/run_main.sh graft.tools.WatchProbe testdata/sf10
  */
object WatchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.core.Graft.session("watch-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[watch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // ---- q_ann_topk_pq ------------------------------------------------
    val e = graft.core.Graft.table(spark, sfDir, "embeddings")
    println(s"[watch] embeddings=${e.count()}")
    // build-internal stages, isolated (same params as the face);
    // repeated scans separate JIT/first-touch from steady-state cost
    for (rep <- 1 to 2) {
      time(s"  scan: count(*) rep$rep") { e.count() }
      time(s"  scan: ids only rep$rep") { e.select(col("vec_id")).agg(sum(col("vec_id"))).collect() }
      time(s"  scan: full vectors rep$rep") { e.select(posexplode(col("embedding"))).agg(count(lit(1))).collect() }
      time(s"  build stage: init collect (TakeOrdered 16) rep$rep") {
        e.orderBy(col("vec_id").asc).limit(16).select("embedding").collect()
      }
      time(s"  build stage: train-sample ids (md5 TakeOrdered 4096) rep$rep") {
        // projected-hash form, mirroring pqBuild/ivfBuild
        e.select(col("vec_id"), md5(col("vec_id").cast("string")).as("__train_h"))
          .orderBy(col("__train_h").asc, col("vec_id").asc)
          .limit(graft.similarity.Pq.DefaultTrainCap)
          .select(col("vec_id")).count()
      }
    }
    println(s"[watch]   scan partitions=${e.rdd.getNumPartitions}")
    val idx = time("pq build (codebooks + codes)") {
      val i = graft.similarity.Pq.pqBuild(e, "vec_id", "embedding", m = 4, k = 16)
      i.codes.cache().count()
      i
    }
    val probes = e.filter(col("vec_id") < 8L)
    val scored = time("pq ADC scoring (corpus x 8 probes)") {
      // the face's scoring stage alone: distance per (cand, probe)
      val n = graft.similarity.Pq
        .pqTopK(idx, probes, "vec_id", "embedding", kNn = 5)
      n.count() // full face for reference
      n
    }
    time("pq full face re-run (ranking tail included)") {
      graft.similarity.Pq
        .pqTopK(idx, probes, "vec_id", "embedding", kNn = 5)
        .orderBy("probe_id", "rank").count()
    }
    idx.codes.unpersist()

    // ---- q_text_winnow_pairs ------------------------------------------
    val d = graft.core.Graft.table(spark, sfDir, "documents")
    println(s"[watch] documents=${d.count()}")
    val fps = time("winnow fingerprint generation (per-char MD5 pass)") {
      val f = graft.text.TextAnalysis
        .winnowFingerprints(d, "doc_id", "text", k = 16, w = 8).cache()
      println(s"[watch]   fingerprints=${f.count()}")
      f
    }
    val rare = time("df-cap filter (window over wm)") {
      import org.apache.spark.sql.expressions.Window
      val r = fps.withColumn("df", count(lit(1)).over(Window.partitionBy("wm")))
        .filter(col("df") <= 50L).drop("df").cache()
      println(s"[watch]   rare fingerprints=${r.count()}")
      r
    }
    time("pair join + groupBy (candidate fan-out)") {
      val a = rare.select(col("doc_id").as("a"), col("wm"))
      val b = rare.select(col("doc_id").as("b"), col("wm"))
      val cand = a.join(b, Seq("wm")).filter(col("a") < col("b"))
      println(s"[watch]   candidate rows=${cand.count()}")
      val pairs = cand.groupBy("a", "b")
        .agg(count(lit(1)).as("n_shared_fp"))
        .filter(col("n_shared_fp") >= 5L)
      println(s"[watch]   final pairs=${pairs.count()}")
    }
    fps.unpersist(); rare.unpersist()
    spark.stop()
  }
}
