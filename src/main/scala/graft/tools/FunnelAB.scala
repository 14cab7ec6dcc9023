package graft.tools
import graft.core.Graft
object FunnelAB {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("funnel-ab")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Graft.table(spark, "/root/testdata/sf0.1", "documents")
    import graft.text.CurationPipeline
    def run(label: String, cfg: CurationPipeline.Config): Unit = {
      for (i <- 1 to 2) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val out = CurationPipeline.run(docs, "doc_id", "text", cfg)
        out.chunks.count(); out.packing.count()
        out.unpersist()
        println(f"[ab] $label run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    run("no-window-dedup", CurationPipeline.Config())
    run("window-dedup-32", CurationPipeline.Config(paragraphDedupWords = Some(32)))
    spark.stop()
  }
}
