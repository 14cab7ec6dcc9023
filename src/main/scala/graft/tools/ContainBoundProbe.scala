package graft.tools

/** Forces the containment verify ABOVE its broadcast bound at a real
  * scale factor and proves the bucketed co-location path emits the
  * IDENTICAL pair relation (VERDICT r11 next-round #1's done
  * criterion). Runs q_dedup_containment's operator twice — broadcast
  * posture (the 500k-doc sf10 corpus is under the 1M default bound)
  * vs forced-bucketed (bound lowered to 1000) — and diffs the full
  * results both ways.
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
    def run() = {
      val t0 = System.nanoTime()
      val out = graft.dedup.Dedup.containmentPairs(
        docs, "doc_id", "text", n = 3, minContainment = 0.8,
        maxDf = Long.MaxValue)
      val n = out.count()
      (out, n, (System.nanoTime() - t0) / 1e9)
    }
    val (bc, nBc, tBc) = run()
    spark.conf.set("spark.graft.verify.broadcastMaxDocs", "1000")
    val (bk, nBk, tBk) = run()
    val onlyBc = bc.exceptAll(bk).count()
    val onlyBk = bk.exceptAll(bc).count()
    println(
      f"[contain-bound] dir=$sfDir broadcast: $nBc pairs in $tBc%.1f s; " +
        f"forced-bucketed: $nBk pairs in $tBk%.1f s; " +
        s"diff=${onlyBc + onlyBk} (bc-only=$onlyBc bk-only=$onlyBk)")
    if (onlyBc + onlyBk != 0) sys.error("pair relations differ!")
    spark.stop()
  }
}
