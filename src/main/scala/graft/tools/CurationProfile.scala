package graft.tools

import graft.core.Graft
import org.apache.spark.sql.functions._

/** Scratch: per-stage wall times of the curation funnel at sf0.1,
  * mirroring q_text_curation_e2e's exact config (paragraphDedupWords
  * = 32, LSH near-dup).
  */
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
    val cfg = CurationPipeline.Config(paragraphDedupWords = Some(32))
    spark.range(100000L).selectExpr("sum(id)").collect()
    val n0 = t("n0-count") { docs.count() }
    val gated = TextAnalysis
      .withGateSignals(docs, "text")
      .filter(col("lang_pred").isin(cfg.allowedLangs: _*) &&
        col("quality") >= cfg.minQuality && col("n_tok") >= cfg.minTokens)
      .cache()
    t("gates-count") { gated.count() }
    val wDigest = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__dg"))
      .orderBy(col("doc_id").asc)
    val keepExact = gated
      .select(col("doc_id"), md5(col("text")).as("__dg"))
      .withColumn("__rn", row_number().over(wDigest))
      .filter(col("__rn") === 1)
      .select(col("doc_id"))
    val exactDeduped = gated.join(keepExact, Seq("doc_id"), "left_semi").cache()
    t("exact-count") { exactDeduped.count() }
    val paraDeduped = Dedup
      .windowDedupKeep(exactDeduped, "doc_id", "text", 32)
      .filter(col("__fo_kept") > 0L)
      .withColumn("text", col("__fo_clean"))
      .drop("__fo_clean", "__fo_kept")
      .cache()
    t("para-dedup-count") { paraDeduped.count() }
    val clusters = t("lsh-clusters-build") {
      Dedup.lshClusters(paraDeduped, "doc_id", "text", cfg.nearDupN, cfg.nearDupJaccard)
    }
    val drop = clusters.filter(!col("is_canonical")).select("doc_id")
    val nearDeduped = paraDeduped.join(drop, Seq("doc_id"), "left_anti")
    val clean = nearDeduped
      .withColumn("clean_text", TextAnalysis.redactPii(col("text")))
      .cache()
    t("clean-count (near-dup join + redact)") { clean.count() }
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
    t("WHOLE q_text_curation_e2e (2nd run cold-cache)") {
      spark.catalog.clearCache()
      graft.queries.Registry.byName("q_text_curation_e2e")
        .fn(spark, "/root/testdata/sf0.1").count()
    }
    spark.stop()
  }
}
