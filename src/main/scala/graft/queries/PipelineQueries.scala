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
        // Per-channel INTEGER stage counters — each one a deterministic
        // function of the fake-source seed, so the whole composed loop
        // (enumeration → statuses → early-abort state machine → VAD
        // segmentation) is oracle-checked. The float faces (SNR values,
        // speech scores, selection) stay out by the libm rule
        // (QueryDef.scala #9) and are covered by q_g2_wada_table /
        // q_a7_speech_score plus PipelineSpec's threshold tests.
        val segAgg = out.segments
          .groupBy("channel_id")
          .agg(
            countDistinct(col("video_id")).as("n_downloaded"),
            count(lit(1)).as("n_segments"))
        val errAgg = out.videoErrors
          .groupBy("channel_id")
          .agg(
            sum(when(col("status").isin("PREMIERE_VIDEO", "OFFLINE_VIDEO"), 1L)
              .otherwise(0L)).as("n_premiere_offline"),
            sum(when(col("status") === "NO_OUTPUT_FILE", 1L)
              .otherwise(0L)).as("n_no_output"))
        val aborts = out.skips.toDF()
          .filter(col("reason") =!= "NOT_ENOUGH_VIDEOS")
          .select(col("channel_id"), col("reason").as("abort_reason"))
        channels.select(col("id").as("channel_id"))
          .join(segAgg, Seq("channel_id"), "left")
          .join(errAgg, Seq("channel_id"), "left")
          .join(aborts, Seq("channel_id"), "left")
          .select(
            col("channel_id"),
            coalesce(col("n_downloaded"), lit(0L)).as("n_downloaded"),
            coalesce(col("n_premiere_offline"), lit(0L)).as("n_premiere_offline"),
            coalesce(col("n_no_output"), lit(0L)).as("n_no_output"),
            coalesce(col("n_segments"), lit(0L)).as("n_segments"),
            col("abort_reason"))
          .orderBy("channel_id")
      },
      // The oracle replays the WHOLE per-channel loop relationally:
      // Java String.hashCode as a 32-bit list_reduce fold (channel url
      // → video count + ids; video id → status + burst count), the
      // quota bucketing, and the early-abort state machine as window
      // prefix sums — DONE / OVER_QUOTA_ATTEMPTS / TOO_MANY_PREMIERES
      // candidates ranked by (pos, loop precedence), events bounded at
      // the winning abort (a premiere abort emits its own error event;
      // the other two stop before the video). Segment counts ride the
      // VAD-burst invariant k%3+2, pinned exhaustively for every OK
      // video of every seed channel by IoSpec ("fake-source VAD
      // invariant").
      oracle = Some(
        """WITH ch AS (
          |  SELECT c_custkey AS ck,
          |    'UC' || lpad(CAST(c_custkey AS VARCHAR), 22, '0') AS channel_id,
          |    'https://yt/c/' || CAST(c_custkey AS VARCHAR) AS url
          |  FROM customer WHERE c_custkey % 211 = 0),
          |hu AS (
          |  SELECT ck, channel_id,
          |    abs(CASE WHEN hraw >= 2147483648 THEN hraw - 4294967296 ELSE hraw END) AS hu,
          |    CASE WHEN ck * 9973 % 250000 < 10000 THEN 10
          |         WHEN ck * 9973 % 250000 < 30000 THEN 20
          |         WHEN ck * 9973 % 250000 < 50000 THEN 30
          |         WHEN ck * 9973 % 250000 < 100000 THEN 40
          |         WHEN ck * 9973 % 250000 < 200000 THEN 50
          |         ELSE 60 END AS quota
          |  FROM (
          |    SELECT ck, channel_id,
          |      list_reduce(
          |        list_prepend(CAST(0 AS BIGINT),
          |          list_transform(range(1, len(url) + 1),
          |            i -> CAST(unicode(url[CAST(i AS INTEGER)]) AS BIGINT))),
          |        (h, c) -> (h * 31 + c) & 4294967295) AS hraw
          |    FROM ch)),
          |v AS (
          |  SELECT ck, channel_id, quota, i.i AS pos,
          |    'v' || lpad(CAST(hu AS VARCHAR), 10, '0') || '_'
          |      || lpad(CAST(i.i AS VARCHAR), 3, '0') AS vid
          |  FROM hu CROSS JOIN range(0, 45) i(i)
          |  WHERE i.i < hu % 40 + 5),
          |kv AS (
          |  SELECT ck, channel_id, quota, pos,
          |    abs(CASE WHEN kraw >= 2147483648 THEN kraw - 4294967296 ELSE kraw END) AS k
          |  FROM (
          |    SELECT ck, channel_id, quota, pos,
          |      list_reduce(
          |        list_prepend(CAST(0 AS BIGINT),
          |          list_transform(range(1, len(vid) + 1),
          |            i -> CAST(unicode(vid[CAST(i AS INTEGER)]) AS BIGINT))),
          |        (h, c) -> (h * 31 + c) & 4294967295) AS kraw
          |    FROM v)),
          |st AS (
          |  SELECT ck, channel_id, quota, pos,
          |    CASE WHEN k % 17 = 0 OR k % 19 = 0 THEN 'PREM'
          |         WHEN k % 23 = 0 THEN 'NOOUT' ELSE 'OK' END AS status,
          |    CASE WHEN k % 17 != 0 AND k % 19 != 0 AND k % 23 != 0
          |         THEN k % 3 + 2 ELSE 0 END AS nb
          |  FROM kv),
          |w AS (
          |  SELECT ck, channel_id, quota, pos, status, nb,
          |    coalesce(sum(CASE WHEN status = 'OK' THEN 1 ELSE 0 END) OVER (
          |      PARTITION BY ck ORDER BY pos
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS dl_b,
          |    coalesce(sum(CASE WHEN status = 'OK' THEN nb * 40000 // 16000 ELSE 0 END) OVER (
          |      PARTITION BY ck ORDER BY pos
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS dur_b,
          |    sum(CASE WHEN status = 'PREM' THEN 1 ELSE 0 END) OVER (
          |      PARTITION BY ck ORDER BY pos) AS prem_i
          |  FROM st),
          |w2 AS (
          |  SELECT *,
          |    CASE WHEN dl_b >= quota AND dur_b < 4 * quota THEN 1 ELSE 0 END AS extra_f,
          |    sum(CASE WHEN dl_b >= quota AND dur_b < 4 * quota THEN 1 ELSE 0 END) OVER (
          |      PARTITION BY ck ORDER BY pos) AS ex_i
          |  FROM w),
          |cand AS (
          |  SELECT ck, pos, 1 AS prio, 'DONE' AS reason FROM w2
          |    WHERE dl_b >= quota AND dur_b >= 4 * quota
          |  UNION ALL
          |  SELECT ck, pos, 2, 'OVER_QUOTA_ATTEMPTS' FROM w2
          |    WHERE extra_f = 1 AND ex_i > 3
          |  UNION ALL
          |  SELECT ck, pos, 3, 'TOO_MANY_PREMIERES' FROM w2
          |    WHERE status = 'PREM' AND prem_i > 3),
          |ab AS (
          |  SELECT ck, pos AS apos, reason FROM (
          |    SELECT ck, pos, reason,
          |      row_number() OVER (PARTITION BY ck ORDER BY pos, prio) AS rn
          |    FROM cand) WHERE rn = 1),
          |agg AS (
          |  SELECT w2.ck, w2.channel_id,
          |    CAST(sum(CASE WHEN w2.status = 'OK' THEN 1 ELSE 0 END) AS BIGINT) AS n_downloaded,
          |    CAST(sum(CASE WHEN w2.status = 'PREM' THEN 1 ELSE 0 END) AS BIGINT) AS n_premiere_offline,
          |    CAST(sum(CASE WHEN w2.status = 'NOOUT' THEN 1 ELSE 0 END) AS BIGINT) AS n_no_output,
          |    CAST(sum(CASE WHEN w2.status = 'OK' THEN w2.nb ELSE 0 END) AS BIGINT) AS n_segments
          |  FROM w2 LEFT JOIN ab ON ab.ck = w2.ck
          |  WHERE ab.apos IS NULL OR w2.pos < ab.apos
          |     OR (w2.pos = ab.apos AND ab.reason = 'TOO_MANY_PREMIERES')
          |  GROUP BY 1, 2)
          |SELECT a.channel_id, a.n_downloaded, a.n_premiere_offline,
          |  a.n_no_output, a.n_segments,
          |  CASE WHEN ab.reason IN ('OVER_QUOTA_ATTEMPTS', 'TOO_MANY_PREMIERES')
          |       THEN ab.reason END AS abort_reason
          |FROM agg a LEFT JOIN ab ON ab.ck = a.ck
          |ORDER BY a.channel_id""".stripMargin
      ),
      doc = "end-to-end flagship pipeline over deterministic fakes " +
        "(data_pipeline.py main loop, SURVEY §3.1) — per-channel " +
        "integer stage counters (downloaded / premiere-offline / " +
        "no-output / segments / abort reason) fully oracle-replayed: " +
        "Java hashCode fold, quota buckets, early-abort window " +
        "arithmetic, VAD-pinned segment counts"
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
        "§3.2): nested {url, snrss, acss} rows + within-array stats. " +
        "Rows-only BY THE LIBM RULE (QueryDef.scala #9): n_snr_ok / " +
        "n_ac_ok are counts of float-threshold decisions over WADA " +
        "SNR (Math.log) and classifier scores — the same carve-out as " +
        "q_g2_wada_snr's float face. The probe's integer scan " +
        "topology is fully oracled by q_probe_scan below; the " +
        "threshold logic itself is oracled on the integer core " +
        "(q_g2_wada_table, q_a7_speech_score). The residual float " +
        "risk — a libm perturbation flipping a threshold decision — " +
        "is closed by ProbeMarginSpec: every segment any fixture SF " +
        "up to sf1 can produce sits > 1e-3 from both thresholds, nine " +
        "orders of magnitude above cross-libm ulp noise, so the " +
        "counts are perturbation-invariant"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_probe_scan",
      covers = "S3,S7,S8,G1,O5",
      fn = (s, dir) => {
        // same seed population as q_probe_quality, run through the
        // REAL Probe.run path — the output is the integer scan
        // skeleton: how many segments each channel's probe yielded
        val urls = table(s, dir, "customer")
          .filter(col("c_custkey") % 499L === 0L)
          .select(concat(lit("https://yt/c/"), col("c_custkey")).as("url"))
        val out = graft.pipeline.Probe.run(
          s, urls, new graft.io.FakeAudioFetcher(2),
          graft.pipeline.FakeClassifier, maxPerChannel = 2, probeCutS = 6)
        out.quality.toDF()
          .select(col("url"), size(col("snrss")).cast("long").as("n_segments"))
          .orderBy("url")
      },
      // Replay: the probe's failure-extended scan window (taken < 2 &&
      // idx < 2 + failures) reduces exactly to "the first 2 OK videos
      // in playlist order" — the maxIdx increment compensates each
      // failure one-for-one. Segment counts per probed video follow
      // the 6s-middle-cut VAD pin (2 bursts fit whole → 2; 3+ bursts
      // → 3), proven per-video by IoSpec's fake-source VAD invariant.
      oracle = Some(
        """WITH ch AS (
          |  SELECT 'https://yt/c/' || CAST(c_custkey AS VARCHAR) AS url
          |  FROM customer WHERE c_custkey % 499 = 0),
          |hu AS (
          |  SELECT url,
          |    abs(CASE WHEN hraw >= 2147483648 THEN hraw - 4294967296 ELSE hraw END) AS hu
          |  FROM (
          |    SELECT url,
          |      list_reduce(
          |        list_prepend(CAST(0 AS BIGINT),
          |          list_transform(range(1, len(url) + 1),
          |            i -> CAST(unicode(url[CAST(i AS INTEGER)]) AS BIGINT))),
          |        (h, c) -> (h * 31 + c) & 4294967295) AS hraw
          |    FROM ch)),
          |v AS (
          |  SELECT url, i.i AS pos,
          |    'v' || lpad(CAST(hu AS VARCHAR), 10, '0') || '_'
          |      || lpad(CAST(i.i AS VARCHAR), 3, '0') AS vid
          |  FROM hu CROSS JOIN range(0, 45) i(i)
          |  WHERE i.i < hu % 40 + 5),
          |kv AS (
          |  SELECT url, pos,
          |    abs(CASE WHEN kraw >= 2147483648 THEN kraw - 4294967296 ELSE kraw END) AS k
          |  FROM (
          |    SELECT url, pos,
          |      list_reduce(
          |        list_prepend(CAST(0 AS BIGINT),
          |          list_transform(range(1, len(vid) + 1),
          |            i -> CAST(unicode(vid[CAST(i AS INTEGER)]) AS BIGINT))),
          |        (h, c) -> (h * 31 + c) & 4294967295) AS kraw
          |    FROM v)),
          |ok AS (
          |  SELECT url, pos, k % 3 + 2 AS nb,
          |    row_number() OVER (PARTITION BY url ORDER BY pos) AS ok_rank
          |  FROM kv WHERE k % 17 != 0 AND k % 19 != 0 AND k % 23 != 0),
          |seg AS (
          |  SELECT url,
          |    CAST(sum(CASE WHEN nb = 2 THEN 2 ELSE 3 END) AS BIGINT) AS n_segments
          |  FROM ok WHERE ok_rank <= 2 GROUP BY url)
          |SELECT ch.url, coalesce(seg.n_segments, 0) AS n_segments
          |FROM ch LEFT JOIN seg USING (url)
          |ORDER BY ch.url""".stripMargin
      ),
      doc = "probe-pipeline scan skeleton, oracle-replayed: hashCode " +
        "fold -> playlist -> statuses -> first-2-OK window (the " +
        "failure-extension identity) -> 6s-cut VAD segment counts " +
        "(spec-pinned) — the integer face of q_probe_quality"
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
        // BUCKETED corpus. Output: every funnel stage count plus the
        // read-back corpus rollup (docs/chars/langs), so the oracle
        // checks the WHOLE composite's integer stage outputs — the
        // same chained-CTE treatment q_text_curation_e2e got.
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
        val corpus = graft.layout.Layout
          .readTable(s, "graft_refresh_corpus")
          .agg(count(lit(1)).as("corpus_docs"),
            sum(length(col("clean_text"))).as("corpus_chars"),
            countDistinct(col("lang")).as("corpus_langs"))
        val stages = Seq("batch" -> batch.count()) ++ out.funnel.map {
          case ("input", v) => ("bloom_survivors", v) // run()'s input IS the Bloom survivor set
          case kv           => kv
        }
        out.docs.unpersist()
        s.createDataFrame(stages).toDF("stage", "n_docs")
          .crossJoin(corpus)
          .orderBy("stage")
      },
      // Chained per-stage CTEs: Bloom-survivor count (the anti-join is
      // exact — the Bloom filter only pre-kills, q_dedup_bloom_anti
      // proves the semantics) → lang/quality gate → exact-dedup window
      // → exact-Jaccard near-dup (n=3, j≥0.8, WITH the library-default
      // maxDf=1000 skew guard replayed: df counted over per-doc
      // distinct shingles, rare-only common counts, FULL sizes) →
      // connected components → drop non-canonical → PII redaction →
      // bucketed-corpus rollup.
      oracle = Some(
        """WITH novel AS (
          |  SELECT doc_id, text, lang FROM documents WHERE doc_id % 3 = 0),
          |ql AS (
          |  SELECT doc_id,
          |    CASE WHEN n_cjk > 0 THEN 'zh'
          |         WHEN s_de = g AND g > 0 THEN 'de'
          |         WHEN s_en = g AND g > 0 THEN 'en'
          |         WHEN s_es = g AND g > 0 THEN 'es'
          |         WHEN s_fr = g AND g > 0 THEN 'fr'
          |         ELSE 'und' END AS lang_pred,
          |    n_tokens,
          |    (CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) * 2.0
          |     + (1.0 - CAST(n_punct AS DOUBLE) / CAST(n_tokens AS DOUBLE))
          |     + CASE WHEN n_nonspace / CAST(n_tokens AS DOUBLE) >= 3.0
          |            AND n_nonspace / CAST(n_tokens AS DOUBLE) <= 10.0
          |            THEN 1.0 ELSE 0.5 END) / 4.0 AS quality
          |  FROM (
          |    SELECT doc_id,
          |      len(list_filter(string_split(text,' '),
          |        t -> t IN ('der','die','das','und','ein','eine','von','zu'))) AS s_de,
          |      len(list_filter(string_split(text,' '),
          |        t -> t IN ('the','a','of','and','to','in','is','it'))) AS s_en,
          |      len(list_filter(string_split(text,' '),
          |        t -> t IN ('el','la','de','los','las','un','una','por'))) AS s_es,
          |      len(list_filter(string_split(text,' '),
          |        t -> t IN ('le','la','et','les','des','un','une','du'))) AS s_fr,
          |      greatest(
          |        len(list_filter(string_split(text,' '),
          |          t -> t IN ('der','die','das','und','ein','eine','von','zu'))),
          |        len(list_filter(string_split(text,' '),
          |          t -> t IN ('the','a','of','and','to','in','is','it'))),
          |        len(list_filter(string_split(text,' '),
          |          t -> t IN ('el','la','de','los','las','un','una','por'))),
          |        len(list_filter(string_split(text,' '),
          |          t -> t IN ('le','la','et','les','des','un','une','du')))) AS g,
          |      len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS n_cjk,
          |      length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
          |      len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
          |      len(list_filter(string_split(text, ' '),
          |        t -> t IN ('the','a','of','and','to','in','is','it'))) AS n_stop,
          |      CAST(length(replace(text, ' ', '')) AS DOUBLE) AS n_nonspace
          |    FROM novel)),
          |gate AS (
          |  SELECT n.doc_id, n.text, n.lang FROM novel n JOIN ql USING (doc_id)
          |  WHERE ql.lang_pred IN ('en','fr','es','de','zh')
          |    AND ql.quality >= 0.25 AND ql.n_tokens >= 8),
          |exact AS (
          |  SELECT doc_id, text, lang FROM (
          |    SELECT doc_id, text, lang,
          |      row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
          |    FROM gate) WHERE rn = 1),
          |sh0 AS (
          |  SELECT doc_id,
          |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
          |                   FOR i IN range(1, len(t) - 1)]) AS shs
          |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM exact)),
          |sizes AS (SELECT doc_id, len(shs) AS n_sh FROM sh0),
          |sh AS (SELECT doc_id, unnest(shs) AS shingle FROM sh0),
          |rare AS (
          |  SELECT doc_id, shingle FROM (
          |    SELECT doc_id, shingle,
          |      count(*) OVER (PARTITION BY shingle) AS df FROM sh)
          |  WHERE df <= 1000),
          |cm AS (
          |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_common
          |  FROM rare x JOIN rare y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
          |  GROUP BY x.doc_id, y.doc_id),
          |pairs AS (
          |  SELECT p.a, p.b FROM cm p
          |  JOIN sizes sa ON sa.doc_id = p.a
          |  JOIN sizes sb ON sb.doc_id = p.b
          |  WHERE CAST(p.n_common AS DOUBLE)
          |    / CAST(sa.n_sh + sb.n_sh - p.n_common AS DOUBLE) >= 0.8),
          |edges AS (SELECT a AS src, b AS dst FROM pairs
          |          UNION SELECT b, a FROM pairs),
          |reach AS (
          |  WITH RECURSIVE r(node, mn) AS (
          |    SELECT src, src FROM edges
          |    UNION
          |    SELECT e.dst, r.mn FROM r JOIN edges e ON e.src = r.node
          |  ) SELECT node, min(mn) AS component FROM r GROUP BY node),
          |dropped AS (SELECT node AS doc_id FROM reach WHERE node <> component),
          |clean AS (
          |  SELECT e.doc_id, e.lang,
          |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(e.text,
          |      'https?://[^\s]+', '<URL>', 'g'),
          |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
          |      '\+\d[\d -]{7,14}\d|\(?\d{3}\)?[ -]\d{3}[ -]\d{4}', '<PHONE>', 'g')
          |      AS clean_text
          |  FROM exact e LEFT JOIN dropped USING (doc_id)
          |  WHERE dropped.doc_id IS NULL),
          |corpus AS (
          |  SELECT CAST(count(*) AS BIGINT) AS corpus_docs,
          |    CAST(sum(length(clean_text)) AS BIGINT) AS corpus_chars,
          |    CAST(count(DISTINCT lang) AS BIGINT) AS corpus_langs
          |  FROM clean),
          |funnel AS (
          |  SELECT 'batch' AS stage,
          |    (SELECT count(*) FROM documents) AS n_docs
          |  UNION ALL SELECT 'bloom_survivors', (SELECT count(*) FROM novel)
          |  UNION ALL SELECT 'lang_quality_gate', (SELECT count(*) FROM gate)
          |  UNION ALL SELECT 'exact_dedup', (SELECT count(*) FROM exact)
          |  UNION ALL SELECT 'near_dedup', (SELECT count(*) FROM clean))
          |SELECT f.stage, CAST(f.n_docs AS BIGINT) AS n_docs,
          |  c.corpus_docs, c.corpus_chars, c.corpus_langs
          |FROM funnel f CROSS JOIN corpus c
          |ORDER BY f.stage""".stripMargin
      ),
      doc = "incremental corpus refresh: Bloom-prefiltered resume " +
        "anti-join -> curation funnel (exact-Jaccard near-dup) -> " +
        "bucketed corpus write -> read-back rollup; every stage count " +
        "oracle-checked via chained CTEs incl. the maxDf skew guard"
    )
  )
}
