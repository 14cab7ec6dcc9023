package graft.tools

import org.apache.spark.sql.functions._

/** Per-stage wall decomposition of the curation funnel — the engine
  * inside the two most expensive bench entries (q_text_curation_e2e,
  * q_corpus_refresh_e2e). Each stage is forced with a count on a
  * cached frame so the numbers are per-stage, not pipelined.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.FunnelStageProbe /root/testdata/sf0.1"
  */
object FunnelStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.Graft.session("funnel-stage-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.{CurationPipeline, TextAnalysis}
    val cfg = CurationPipeline.Config(nearDupUseLsh = false)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // warm codegen on the tiny SF
    CurationPipeline.run(
      graft.core.Graft.table(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", cfg).docs.unpersist()
    spark.catalog.clearCache()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[funnel-probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val input = graft.core.Graft.table(spark, sfDir, "documents")
    // `real` mode mirrors q_text_curation_e2e's ACTUAL config (LSH
    // near-dup + 32-word window dedup) instead of the audit-path
    // jaccardClusters the default mode times.
    if (args.length > 1 && args(1) == "real") {
      val rcfg = CurationPipeline.Config(paragraphDedupWords = Some(32))
      val gated = t("gate_signals_filter") {
        val g = TextAnalysis.withGateSignals(input, "text")
          .filter(col("lang_pred").isin(rcfg.allowedLangs: _*) &&
            col("quality") >= rcfg.minQuality &&
            col("n_tok") >= rcfg.minTokens).cache()
        g.count(); g
      }
      val exactDeduped = t("exact_dedup") {
        val keep = gated.select(col("doc_id"), md5(col("text")).as("__dg"))
          .groupBy(col("__dg")).agg(min(col("doc_id")).as("doc_id"))
          .select("doc_id")
        val e = gated.join(keep, Seq("doc_id"), "left_semi").cache()
        e.count(); e
      }
      val paraDeduped = t("window_dedup_32") {
        val p = graft.dedup.Dedup
          .windowDedupKeep(exactDeduped, "doc_id", "text", 32)
          .filter(col("__fo_kept") > 0L)
          .withColumn("text", col("__fo_clean"))
          .drop("__fo_clean", "__fo_kept").cache()
        p.count(); p
      }
      val clusters = t("neardup_lsh_clusters") {
        val c = graft.dedup.Dedup.lshClusters(
          paraDeduped, "doc_id", "text", rcfg.nearDupN, rcfg.nearDupJaccard)
        c.count(); c
      }
      val nearDeduped = t("neardup_antijoin") {
        val n = paraDeduped.join(
          clusters.filter(!col("is_canonical")).select("doc_id"),
          Seq("doc_id"), "left_anti").cache()
        n.count(); n
      }
      val clean = t("pii_redact") {
        val c = nearDeduped
          .withColumn("clean_text", TextAnalysis.redactPii(col("text"))).cache()
        c.count(); c
      }
      val chunks = t("chunks") {
        TextAnalysis.chunkByTokens(
          clean.select(col("doc_id"), col("clean_text")),
          "doc_id", "clean_text", rcfg.chunkTokens, rcfg.chunkOverlap)
      }
      t("chunk_stats_agg") {
        chunks.agg(count(lit(1)), sum(col("n_tok"))).collect(): Unit
      }
      val packing = t("packing") {
        TextAnalysis.packSequences(
          clean.select(col("doc_id"), col("clean_text")),
          "doc_id", "clean_text", rcfg.seqLen)
      }
      t("pack_stats_agg") {
        packing.agg(max(col("end_off")), max(col("last_seq"))).collect(): Unit
      }
      spark.stop()
      return
    }
    val gated = t("gate_signals_filter") {
      val g = TextAnalysis.withGateSignals(input, "text")
        .filter(col("lang_pred").isin(cfg.allowedLangs: _*) &&
          col("quality") >= cfg.minQuality && col("n_tok") >= cfg.minTokens &&
          CurationPipeline.gopherPredicate(col("text"), cfg) &&
          CurationPipeline.repetitionPredicate(col("text"), cfg)).cache()
      g.count(); g
    }
    val exactDeduped = t("exact_dedup") {
      // mirrors CurationPipeline's r15 form: min(id) per digest (hash
      // agg), not a row_number window (sort per digest partition)
      val keep = gated.select(col("doc_id"), md5(col("text")).as("__dg"))
        .groupBy(col("__dg")).agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id")
      val e = gated.join(keep, Seq("doc_id"), "left_semi").cache()
      e.count(); e
    }
    val clusters = t("neardup_jaccard_clusters") {
      val c = graft.dedup.Dedup.jaccardClusters(
        exactDeduped, "doc_id", "text", cfg.nearDupN, cfg.nearDupJaccard)
      c.count(); c
    }
    val nearDeduped = t("neardup_antijoin") {
      val n = exactDeduped.join(
        clusters.filter(!col("is_canonical")).select("doc_id"),
        Seq("doc_id"), "left_anti").cache()
      n.count(); n
    }
    val clean = t("pii_redact") {
      val c = nearDeduped
        .withColumn("clean_text", TextAnalysis.redactPii(col("text"))).cache()
      c.count(); c
    }
    t("chunks") {
      TextAnalysis.chunkByTokens(
        clean.select(col("doc_id"), col("clean_text")),
        "doc_id", "clean_text", cfg.chunkTokens, cfg.chunkOverlap).count()
    }
    t("packing") {
      TextAnalysis.packSequences(
        clean.select(col("doc_id"), col("clean_text")),
        "doc_id", "clean_text", cfg.seqLen).count()
    }
    spark.stop()
  }
}
