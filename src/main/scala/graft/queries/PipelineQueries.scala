package graft.queries

import graft.core.Graft.table
import graft.io.FakeAudioFetcher
import graft.pipeline.{FakeClassifier, Pipeline}
import org.apache.spark.sql.functions._

/** The composed flagship dataflow (SURVEY §3.1) as a registered query:
  * a channel catalog derived from `customer` runs through the full
  * fetch→VAD→score→select→meta chain over the deterministic offline
  * fakes. Rows-only check — the chain's relational pieces are each
  * oracle-checked individually by the other query files.
  */
object PipelineQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_pipeline_e2e",
      covers = "S7,S8,S9,G1,G2,G4,G5,F2,F3,F4,O3,O6,T4,A3,A5,K7",
      fn = (s, dir) => {
        // ~1 channel per 211 customers keeps the fake-ingest cost low
        // across scale factors while still scaling with the data
        val channels = table(s, dir, "customer")
          .filter(col("c_custkey") % 211L === 0L)
          .select(
            col("c_name").as("title"),
            concat(lit("UC"), format_string("%022d", col("c_custkey"))).as("id"),
            (col("c_custkey") % 40L + 5L).as("n_videos"),
            (col("c_custkey") * 31L % 1000000L).as("n_views"),
            (col("c_custkey") * 9973L % 250000L).as("n_subs"),
            concat(lit("@h"), col("c_custkey")).as("custom_url"),
            lit(null).cast("string").as("email"),
            concat(lit("https://yt/c/"), col("c_custkey")).as("url")
          )
        val ingested = s.range(0, 0).select(col("id").cast("string").as("video_id"))
        // the scorer loads from a serialized weights artifact on the
        // executors (G4's real model-loading path); the artifact is the
        // exported linear-probe head, written driver-side as a fixture
        val wPath = new java.io.File(
          System.getProperty("java.io.tmpdir"), "graft_e2e_probe_head.tsv").getPath
        graft.pipeline.LinearProbeClassifier().save(wPath)
        val out = Pipeline.run(
          s, channels, ingested,
          new FakeAudioFetcher(segmentSeconds = 2),
          graft.pipeline.FileWeightsClassifier(wPath),
          Pipeline.Config(minSnr = 12.0, minSpeechScore = 0.5,
            minVideoDurationS = 4, shortVideoS = 3)
        )
        // summary: per-channel segment/selection stats + meta rollup
        out.segments
          .groupBy("channel_id")
          .agg(
            count(lit(1)).as("n_segments"),
            count(when(col("selected"), 1)).as("n_selected"),
            min(col("snr")).as("min_snr"),
            max(col("snr")).as("max_snr")
          )
          .orderBy("channel_id")
      },
      oracle = None,
      doc = "end-to-end flagship pipeline over deterministic fakes " +
        "(data_pipeline.py main loop, SURVEY §3.1)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_probe_quality",
      covers = "S3,S8,G1,G2,G4,A1,K2,K3",
      fn = (s, dir) => {
        // §3.2 probe: URL list → nested quality rows → A1 stats
        val urls = table(s, dir, "customer")
          .filter(col("c_custkey") % 499L === 0L)
          .select(concat(lit("https://yt/c/"), col("c_custkey")).as("url"))
        val out = graft.pipeline.Probe.run(
          s, urls, new graft.io.FakeAudioFetcher(2),
          graft.pipeline.FakeClassifier, maxPerChannel = 2, probeCutS = 6)
        graft.pipeline.Probe
          .qualityStats(out.quality.toDF(), minSnr = 12.0, minSpeechScore = 0.5)
          .select("url", "n_total", "n_snr_ok", "n_ac_ok")
          .orderBy("url")
      },
      oracle = None,
      doc = "channel quality-probe pipeline (filter_channel.py, SURVEY " +
        "§3.2): nested {url, snrss, acss} rows + within-array stats"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_corpus_refresh_e2e",
      covers = "T2,dedup,curation,layout",
      fn = (s, dir) => {
        // The incremental-corpus story end to end: a new crawl batch
        // arrives, already-ingested docs are dropped WITHOUT shuffling
        // them (Bloom front door + exact anti-join), survivors run the
        // curation funnel (exact-Jaccard near-dup path: deterministic,
        // no LSH randomness surface), and the clean refresh lands as a
        // BUCKETED corpus whose read-back aggregation is
        // exchange-free. Rows-only by the e2e convention — every
        // stage is oracle-checked alone (q_dedup_bloom_anti, the gate
        // queries, q_dedup_clusters, q_layout_bucketed_agg).
        val batch = table(s, dir, "documents")
        // the realistic refresh shape: MOST of the batch is already
        // ingested (2/3 here) and dies at the Bloom front door without
        // shuffling; only the novel third runs the funnel
        val history = batch.filter(col("doc_id") % 3L =!= 0L)
          .select("doc_id")
        val novel = graft.dedup.Dedup
          .bloomAntiJoin(batch, history, "doc_id")
        val out = graft.text.CurationPipeline.run(
          novel, "doc_id", "text",
          graft.text.CurationPipeline.Config(nearDupUseLsh = false))
        graft.layout.Layout.writeBucketed(
          out.docs.select("doc_id", "lang", "clean_text"),
          "graft_refresh_corpus", "doc_id", buckets = 8)
        val summary = graft.layout.Layout
          .readTable(s, "graft_refresh_corpus")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(length(col("clean_text"))).as("n_chars"))
          .orderBy("lang")
        out.docs.unpersist()
        summary
      },
      oracle = None,
      doc = "incremental corpus refresh: Bloom-prefiltered resume " +
        "anti-join -> curation funnel -> bucketed corpus write -> " +
        "exchange-free read-back rollup; the T2+dedup+layout composite"
    )
  )
}
