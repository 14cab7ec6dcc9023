package graft.tools

/** Forces the containment verify ABOVE its broadcast bound at a real
  * scale factor and proves the bucketed co-location path emits the
  * IDENTICAL pair relation (VERDICT r11 next-round #1's done
  * criterion). Runs q_dedup_containment's operator three ways —
  * broadcast posture (the 500k-doc sf10 corpus is under the 1M
  * default bound), forced-bucketed with the TEMP-TABLE write (bound
  * lowered to 1000 against the raw parquet scan), and (r13, VERDICT
  * r12 #3) forced-above-bound against a PRE-BUCKETED corpus — the
  * born-bucketed 100 TB posture, where Layout.writeBucketed happened
  * at ingest and the operator detects the existing
  * HashPartitioning(id) and skips the temp write entirely. The
  * bucketed ingest write is corpus-construction cost and is reported
  * separately, untimed against the operator.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ContainBoundProbe testdata/sf10"
  */
object ContainBoundProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = graft.core.Graft.session("contain-bound")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
    def run(d: org.apache.spark.sql.DataFrame) = {
      spark.catalog.clearCache()
      graft.dedup.Dedup.cleanupVerifyOutputs()
      System.gc()
      val t0 = System.nanoTime()
      val out = graft.dedup.Dedup.containmentPairs(
        d, "doc_id", "text", n = 3, minContainment = 0.8,
        maxDf = Long.MaxValue)
      val n = out.count()
      (out, n, (System.nanoTime() - t0) / 1e9)
    }
    val (bc, nBc, tBc) = run(docs)
    val wantPairs = bc.collect().map(_.toString).toSet
    bc.unpersist()
    spark.conf.set("spark.graft.verify.broadcastMaxDocs", "1000")
    val (bk, nBk, tBk) = run(docs)
    val bkPairs = bk.collect().map(_.toString).toSet
    bk.unpersist()
    // pre-bucketed posture: the ingest-time bucketed write, then the
    // operator over the bucketed scan (detected, zero layout work)
    val tbl = s"graft_probe_prebucketed_${System.nanoTime}"
    val tW0 = System.nanoTime()
    graft.layout.Layout.writeBucketed(
      docs.select("doc_id", "text"), tbl, "doc_id",
      buckets = spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val tWrite = (System.nanoTime() - tW0) / 1e9
    val (pb, nPb, tPb) = run(spark.table(tbl))
    val pbPairs = pb.collect().map(_.toString).toSet
    pb.unpersist()
    graft.layout.Layout.dropWithLocation(spark, tbl)
    println(
      f"[contain-bound] dir=$sfDir broadcast: $nBc pairs in $tBc%.1f s; " +
        f"forced-bucketed(temp write): $nBk pairs in $tBk%.1f s; " +
        f"pre-bucketed(detected, ingest write $tWrite%.1f s untimed): " +
        f"$nPb pairs in $tPb%.1f s; " +
        s"diffs bk=${(wantPairs diff bkPairs).size + (bkPairs diff wantPairs).size} " +
        s"pb=${(wantPairs diff pbPairs).size + (pbPairs diff wantPairs).size}")
    if (bkPairs != wantPairs || pbPairs != wantPairs)
      sys.error("pair relations differ!")
    spark.stop()
  }
}
