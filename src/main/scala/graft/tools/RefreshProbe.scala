package graft.tools

import org.apache.spark.sql.functions._

/** Stage decomposition of q_corpus_refresh_e2e (VERDICT r11 #5): where
  * do the ~4.6 s at sf0.1 go — Bloom front door, curation funnel,
  * bucketed corpus write, or read-back rollup? Each stage is forced
  * with a count so the timings are per-stage, not pipelined (the real
  * query pipelines them, so the sum here is an upper bound on the
  * query's wall).
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.RefreshProbe /root/testdata/sf0.1"
  */
object RefreshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.Graft.session("refresh-probe")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // warm at sf0.001 (codegen/session)
    graft.queries.Registry.byName("q_corpus_refresh_e2e")
      .fn(spark, "/root/testdata/sf0.001").count()
    spark.catalog.clearCache()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[refresh-probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val batch = graft.core.Graft.table(spark, sfDir, "documents")
    t("batch_count")(batch.count())
    val history = batch.filter(col("doc_id") % 3L =!= 0L).select("doc_id")
    val novel = t("bloom_build_plus_anti") {
      val n = graft.dedup.Dedup.bloomAntiJoin(batch, history, "doc_id")
      n.count()
      n
    }
    val out = t("curation_funnel") {
      val o = graft.text.CurationPipeline.run(
        novel, "doc_id", "text",
        graft.text.CurationPipeline.Config(nearDupUseLsh = false))
      o.docs.count()
      o
    }
    t("bucketed_write") {
      graft.layout.Layout.writeBucketed(
        out.docs.select("doc_id", "lang", "clean_text"),
        "graft_refresh_probe_corpus", "doc_id", buckets = 8)
    }
    t("rollup_readback") {
      graft.layout.Layout.readTable(spark, "graft_refresh_probe_corpus")
        .agg(count(lit(1)), sum(length(col("clean_text"))),
          countDistinct(col("lang")))
        .collect()
    }
    out.docs.unpersist()
    graft.layout.Layout.dropWithLocation(spark, "graft_refresh_probe_corpus")
    spark.stop()
  }
}
