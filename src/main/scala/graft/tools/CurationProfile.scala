package graft.tools

import graft.core.Graft
import org.apache.spark.sql.functions._

/** Scratch: per-stage wall times of the curation funnel at sf0.1. */
object CurationProfile {
  def t[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[cp] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("curation-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Graft.table(spark, "/root/testdata/sf0.1", "documents")
    import graft.text.{CurationPipeline, TextAnalysis}
    import graft.dedup.Dedup
    val cfg = CurationPipeline.Config()
    val n0 = t("n0-count") { docs.count() }
    val gated = docs
      .withColumn("lang_pred", TextAnalysis.langId(col("text")))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("n_tok", TextAnalysis.tokenCountWs(col("text")))
      .filter(col("lang_pred").isin(cfg.allowedLangs: _*) &&
        col("quality") >= cfg.minQuality && col("n_tok") >= cfg.minTokens)
      .cache()
    t("gates-count") { gated.count() }
    val keep = Dedup.exact(gated, "doc_id", "text").select("doc_id")
    val exactDeduped = gated.join(keep, Seq("doc_id"), "left_semi").cache()
    t("exact-count") { exactDeduped.count() }
    val pairs = t("lsh-pairs (shipped path)") {
      Dedup.minHashLshPairs(exactDeduped, "doc_id", "text", cfg.nearDupN,
        minJaccard = cfg.nearDupJaccard)
    }
    t("jaccard-pairs (audit path)") {
      Dedup.ngramJaccardPairs(exactDeduped, "doc_id", "text", cfg.nearDupN,
        cfg.nearDupJaccard, maxDf = Long.MaxValue)
    }
    val comps = t("components") { Dedup.connectedComponents(pairs) }
    t("clusters-join-count") {
      val sizes = comps.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
      comps.join(sizes, Seq("comp")).count()
    }
    val drop = Dedup.jaccardClusters(exactDeduped, "doc_id", "text",
      cfg.nearDupN, cfg.nearDupJaccard).filter(!col("is_canonical")).select("doc_id")
    val clean = exactDeduped.join(drop, Seq("doc_id"), "left_anti")
      .withColumn("clean_text", TextAnalysis.redactPii(col("text"))).cache()
    t("clean-count") { clean.count() }
    t("chunks-agg") {
      TextAnalysis.chunkByTokens(clean.select(col("doc_id"), col("clean_text")),
        "doc_id", "clean_text", cfg.chunkTokens, cfg.chunkOverlap)
        .agg(count(lit(1)), sum(col("n_tok"))).collect()
    }
    t("packing-agg") {
      TextAnalysis.packSequences(clean.select(col("doc_id"), col("clean_text")),
        "doc_id", "clean_text", cfg.seqLen)
        .agg(max(col("end_off")), max(col("last_seq"))).collect()
    }
    spark.stop()
  }
}
