package graft.queries

import graft.core.Graft.table
import graft.functions.Scalars
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scan / projection / filter / join / set-op operators from SURVEY.md
  * §2.1, §2.3-2.5, re-expressed over the TPC-H-ish testdata. Analog
  * mapping: `customer` plays the channel catalog (synthetic n_subs =
  * (c_custkey*9973) % 250000 spreads rows across every quota tier),
  * `orders` plays the per-channel video list, `events` plays per-segment
  * probe measurements keyed by user_id ∈ [0,150) ⊂ c_custkey range.
  */
object RelationalQueries {

  /** Synthetic subscriber count: deterministic, integer-only, covers all
    * P2 tiers. Same arithmetic on both engines.
    */
  private val nSubsSql = "(c_custkey * 9973) % 250000"

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    QueryDef(
      "q_s1_scan_project",
      covers = "S1,P1",
      fn = (s, dir) =>
        table(s, dir, "customer")
          .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
          .orderBy("c_custkey"),
      oracle = Some(
        """SELECT c_custkey, c_name, c_mktsegment, c_acctbal
          |FROM customer ORDER BY c_custkey""".stripMargin
      ),
      doc = "catalog scan + fixed projection (pandas read_csv + col select)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_f1_subscriber_threshold",
      covers = "F1,P2",
      fn = (s, dir) =>
        table(s, dir, "customer")
          .withColumn("n_subs", expr(nSubsSql))
          .filter(col("n_subs") > 10000L)
          .withColumn("quota", Scalars.quotaForSubs(col("n_subs")))
          .select("c_custkey", "n_subs", "quota")
          .orderBy("c_custkey"),
      oracle = Some(
        s"""SELECT c_custkey, $nSubsSql AS n_subs,
           |  CAST(CASE WHEN $nSubsSql < 10000 THEN 10
           |            WHEN $nSubsSql < 30000 THEN 20
           |            WHEN $nSubsSql < 50000 THEN 30
           |            WHEN $nSubsSql < 100000 THEN 40
           |            WHEN $nSubsSql < 200000 THEN 50
           |            ELSE 60 END AS BIGINT) AS quota
           |FROM customer WHERE $nSubsSql > 10000
           |ORDER BY c_custkey""".stripMargin
      ),
      doc = "n_subs>10000 admission filter + download-quota bucketing " +
        "(yt_channel_list_result_merge c2; data_pipeline.py:520-531)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_f2_skip_reason",
      covers = "F2,K7,P8",
      fn = (s, dir) => {
        val c = table(s, dir, "customer")
          .withColumn("n_videos", expr("c_custkey % 12"))
          .withColumn(
            "skip_reason",
            when(col("n_videos") < 5L, lit("NOT_ENOUGH_VIDEOS"))
              .when(col("c_acctbal") < 0.0d, lit("NEGATIVE_BALANCE"))
              .otherwise(lit(null).cast("string"))
          )
        c.select("c_custkey", "n_videos", "skip_reason")
          .orderBy("c_custkey")
      },
      oracle = Some(
        """SELECT c_custkey, c_custkey % 12 AS n_videos,
          |  CASE WHEN c_custkey % 12 < 5 THEN 'NOT_ENOUGH_VIDEOS'
          |       WHEN c_acctbal < 0 THEN 'NEGATIVE_BALANCE'
          |       ELSE NULL END AS skip_reason
          |FROM customer ORDER BY c_custkey""".stripMargin
      ),
      doc = "min-videos gate with skip reason as data, not logging " +
        "(data_pipeline.py:553-555, 545-548)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_p3_trim_rule",
      covers = "P3,P9",
      fn = (s, dir) => {
        val e = table(s, dir, "events")
          .withColumn("dur_s", floor(col("value") * 8.0d).cast("long"))
          .withColumn("b", Scalars.trimBounds(col("dur_s")))
        e.select(
          col("event_id"),
          col("dur_s"),
          col("b.ss").as("ss"),
          col("b.to").as("tto"),
          (col("b.to") - col("b.ss")).as("kept_s")
        ).orderBy("event_id")
      },
      oracle = Some(
        """WITH d AS (SELECT event_id, CAST(floor(value * 8.0) AS BIGINT) AS dur_s FROM events)
          |SELECT event_id, dur_s,
          |  CASE WHEN dur_s < 180 THEN 0 WHEN dur_s > 2042 THEN 120 ELSE 60 END AS ss,
          |  CASE WHEN dur_s < 180 THEN dur_s WHEN dur_s > 2042 THEN dur_s - 120 ELSE dur_s - 60 END AS tto,
          |  CASE WHEN dur_s < 180 THEN dur_s WHEN dur_s > 2042 THEN dur_s - 240 ELSE dur_s - 120 END AS kept_s
          |FROM d ORDER BY event_id""".stripMargin
      ),
      doc = "duration-trim CASE rule (data_pipeline.py:609-620)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_p4_embed_url",
      covers = "P4,P5,P9",
      fn = (s, dir) => {
        val e = table(s, dir, "events")
          .withColumn("start_samp", floor(col("value") * 16000.0d).cast("long"))
          .withColumn("end_samp", col("start_samp") + 52345L)
        e.select(
          col("event_id"),
          Scalars.embedUrl(col("user_id"), col("start_samp"), col("end_samp"))
            .as("embed_url"),
          Scalars.watchUrl(col("user_id")).as("watch_url")
        ).orderBy("event_id")
      },
      oracle = Some(
        """WITH d AS (SELECT event_id, user_id,
          |    CAST(floor(value * 16000.0) AS BIGINT) AS start_samp FROM events)
          |SELECT event_id,
          |  'https://www.youtube.com/embed/' || CAST(user_id AS VARCHAR)
          |    || '?start=' || CAST(CAST(floor(start_samp / 16000.0) AS BIGINT) AS VARCHAR)
          |    || '&end=' || CAST(CAST(ceil((start_samp + 52345) / 16000.0) AS BIGINT) AS VARCHAR)
          |    AS embed_url,
          |  'https://www.youtube.com/watch?v=' || CAST(user_id AS VARCHAR) AS watch_url
          |FROM d ORDER BY event_id""".stripMargin
      ),
      doc = "embed/watch URL construction with floor/ceil second rounding " +
        "(data_pipeline.py:660,602)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_p6_string_normalize",
      covers = "P6,P7,P8,P10,P11",
      fn = (s, dir) => {
        val d = table(s, dir, "documents")
          .withColumn("handle", concat(lit("@"), col("source")))
          .withColumn("desc_text", concat(col("source"), lit("@example.com "), col("text")))
        d.select(
          col("doc_id"),
          Scalars.stripHandle(col("handle")).as("stripped"),
          Scalars.extractEmail(col("desc_text")).as("email"),
          Scalars.flattenError(regexp_replace(col("text"), " ", "\n")).as("flat"),
          (length(trim(col("handle"))) =!= 24).as("not_raw_id"),
          substring_index(col("text"), " ", 1).as("first_tok")
        ).orderBy("doc_id")
      },
      oracle = Some(
        """SELECT doc_id,
          |  regexp_replace('@' || source, '^@', '') AS stripped,
          |  coalesce(nullif(regexp_extract(source || '@example.com ' || text,
          |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', 0), ''), 'N/A') AS email,
          |  regexp_replace(regexp_replace(text, ' ', chr(10), 'g'), '[\n\t]', ' ', 'g') AS flat,
          |  length(trim('@' || source)) != 24 AS not_raw_id,
          |  CASE WHEN strpos(text, ' ') = 0 THEN text
          |       ELSE substr(text, 1, strpos(text, ' ') - 1) END AS first_tok
          |FROM documents ORDER BY doc_id""".stripMargin
      ),
      doc = "id/handle normalization, email extraction, error flattening " +
        "(starngage_crawler c4/c15; filter_channel.py:62)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_f4_anti_ingested",
      covers = "F4,J3,T2",
      fn = (s, dir) => {
        val c = table(s, dir, "customer")
        val e = table(s, dir, "events")
        // "already ingested" resume set = user ids seen in the event
        // log; left_anti gives the not-yet-processed remainder.
        c.join(e, c("c_custkey") === e("user_id"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey")
      },
      oracle = Some(
        """SELECT c_custkey, c_name FROM customer c
          |WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
          |ORDER BY c_custkey""".stripMargin
      ),
      doc = "already-ingested anti-join resume filter (data_pipeline.py:559,575-577)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_j2_semi_membership",
      covers = "J2,F5",
      fn = (s, dir) => {
        val c = table(s, dir, "customer")
        val o = table(s, dir, "orders").filter(col("o_orderstatus") === "F")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_mktsegment")
          .orderBy("c_custkey")
      },
      oracle = Some(
        """SELECT c_custkey, c_mktsegment FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
          |ORDER BY c_custkey""".stripMargin
      ),
      doc = "semi-join membership partition (yt_channel_list_quality_merge c9)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_j1_catalog_join",
      covers = "J1,P1",
      fn = (s, dir) => {
        val c = table(s, dir, "customer")
        val o = table(s, dir, "orders")
        // catalog side is the small dimension → broadcast it; fact side
        // streams without a shuffle.
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
          .select("o_orderkey", "c_custkey", "c_mktsegment", "o_totalprice")
          .orderBy("o_orderkey")
      },
      oracle = Some(
        """SELECT o_orderkey, c_custkey, c_mktsegment, o_totalprice
          |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          |ORDER BY o_orderkey""".stripMargin
      ),
      doc = "inner equi-join catalog⋈quality (yt_channel_list_quality_merge c5)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_u1_d1_union_distinct",
      covers = "U1,D1",
      fn = (s, dir) => {
        val a = table(s, dir, "customer").select(col("c_mktsegment").as("val"))
        val b = table(s, dir, "orders").select(col("o_orderpriority").as("val"))
        a.unionByName(b).dropDuplicates("val").orderBy("val")
      },
      oracle = Some(
        """SELECT c_mktsegment AS val FROM customer
          |UNION
          |SELECT o_orderpriority AS val FROM orders
          |ORDER BY val""".stripMargin
      ),
      doc = "multi-source union + full-row dedup (yt_channel_list_result_merge c1/c5)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_d2_dedup_by_key",
      covers = "D2,O4",
      fn = (s, dir) => {
        // first-wins dedup made deterministic: per mktsegment keep the
        // highest-balance customer, custkey as tiebreak (SURVEY D2 note).
        val w = Window
          .partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        table(s, dir, "customer")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("c_mktsegment", "c_custkey", "c_acctbal")
          .orderBy("c_mktsegment")
      },
      oracle = Some(
        """SELECT c_mktsegment, c_custkey, c_acctbal FROM (
          |  SELECT *, row_number() OVER (PARTITION BY c_mktsegment
          |      ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
          |  FROM customer) WHERE rn = 1
          |ORDER BY c_mktsegment""".stripMargin
      ),
      doc = "dedup-by-key with explicit order (yt_channel_list_quality_merge c9)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_d3_distinct_count",
      covers = "D3,A6",
      fn = (s, dir) =>
        table(s, dir, "events")
          .groupBy("event_type")
          .agg(
            countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events")
          )
          .orderBy("event_type"),
      oracle = Some(
        """SELECT event_type, count(DISTINCT user_id) AS n_users,
          |       count(*) AS n_events
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
      ),
      doc = "distinct-count tallies (starngage_crawler c7-8)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_s2_json_props",
      covers = "S2,P8",
      fn = (s, dir) =>
        table(s, dir, "events")
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .withColumn("missing", coalesce(get_json_object(col("props"), "$.zz"), lit("N/A")))
          .select("event_id", "k", "missing")
          .orderBy("event_id"),
      oracle = Some(
        """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
          |       coalesce(json_extract_string(props, '$.zz'), 'N/A') AS missing
          |FROM events ORDER BY event_id""".stripMargin
      ),
      doc = "JSON field access with N/A defaulting (filter_channel.py:49-54; " +
        "starngage_crawler c15 statistics.get defaults)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_k1_csv_roundtrip",
      covers = "K1,S1",
      fn = (s, dir) => {
        // the K1 sink verified through its own S1 face: write the
        // table as headered CSV, read it back with the declared
        // schema, and the oracle (the original table) must match —
        // quoting, header, and type round-trip all under test
        val path = new java.io.File(
          sys.props("java.io.tmpdir"), "graft_k1_roundtrip").getPath
        graft.io.Sinks.writeCsv(
          table(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey"),
          path)
        s.read
          .option("header", "true")
          .schema("n_nationkey INT, n_name STRING, n_regionkey INT")
          .csv(path)
          .orderBy("n_nationkey")
      },
      oracle = Some(
        "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"
      ),
      doc = "K1 CSV sink round-trip: write headered CSV, re-scan with " +
        "schema, compare against the source relation in DuckDB"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_k_orc_roundtrip",
      covers = "K1,S1,columnar-format",
      fn = (s, dir) => {
        // the ORC face of the sink matrix: self-describing columnar
        // round-trip (schema travels with the files, unlike CSV) —
        // types, nulls, and values must all survive
        val path = new java.io.File(
          sys.props("java.io.tmpdir"), "graft_orc_roundtrip").getPath
        graft.io.Sinks.writeOrc(
          table(s, dir, "supplier")
            .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
          path)
        s.read.orc(path).orderBy("s_suppkey")
      },
      oracle = Some(
        "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier " +
          "ORDER BY s_suppkey"
      ),
      doc = "ORC columnar sink round-trip: write ORC, re-scan (schema " +
        "self-described), compare against the source relation in " +
        "DuckDB — extends the sink matrix to the Hive-ecosystem " +
        "interchange format"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_k2_jsonl_roundtrip",
      covers = "K2,S2",
      fn = (s, dir) => {
        // K2 is an APPEND sink; idempotence for the repeated-run
        // contract comes from clearing the target first (one fresh
        // append = exactly one copy)
        val f = new java.io.File(
          sys.props("java.io.tmpdir"), "graft_k2_roundtrip")
        def rm(x: java.io.File): Unit = {
          if (x.isDirectory) x.listFiles().foreach(rm)
          x.delete(): Unit
        }
        if (f.exists()) rm(f)
        graft.io.Sinks.appendJsonl(
          table(s, dir, "region").select("r_regionkey", "r_name"), f.getPath)
        s.read
          .schema("r_regionkey INT, r_name STRING")
          .json(f.getPath)
          .orderBy("r_regionkey")
      },
      oracle = Some(
        "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"
      ),
      doc = "K2 JSONL sink round-trip: append JSON lines, re-scan with " +
        "schema, compare against the source relation in DuckDB"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_k7_skiplog_roundtrip",
      covers = "K7",
      fn = (s, dir) => {
        val path = new java.io.File(
          sys.props("java.io.tmpdir"), "graft_k7_roundtrip").getPath
        val src = table(s, dir, "customer").select(
          col("c_custkey").cast("string").as("channel_id"),
          when(col("c_acctbal") < 0, "NEGATIVE_BALANCE")
            .otherwise(lit(null).cast("string")).as("reason"))
        graft.io.Sinks.writeSkipLog(src, "channel_id", "reason", path)
        s.read.text(path)
          .select(
            substring_index(col("value"), "|", 1).as("channel_id"),
            substring_index(col("value"), "|", -1).as("reason"))
          .orderBy("channel_id")
      },
      oracle = Some(
        """SELECT CAST(c_custkey AS VARCHAR) AS channel_id,
          |  'NEGATIVE_BALANCE' AS reason
          |FROM customer WHERE c_acctbal < 0
          |ORDER BY channel_id""".stripMargin
      ),
      doc = "K7 skip-log round-trip: null reasons filtered, " +
        "'id|reason' text lines written and re-parsed, oracle = the " +
        "negative-balance channels (string order both sides)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_k_shard_write",
      covers = "K-shards,seq-packing",
      fn = (s, dir) => {
        // the training-shard sink verified through its own scan face:
        // write token-balanced shards (assignment = the packSequences
        // prefix sum at seqLen = tokensPerShard), read the partitioned
        // dir back, and roll it up — the oracle replays the prefix sum
        val path = new java.io.File(
          sys.props("java.io.tmpdir"), "graft_shards_roundtrip").getPath
        graft.io.Sinks.writeTrainingShards(
          table(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text", path, tokensPerShard = 4096L)
        s.read.parquet(path)
          .groupBy(col("shard").cast("long").as("shard"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(graft.text.TextAnalysis.tokenCountWs(col("text"))).as("n_tokens"),
            min(col("start_off")).as("min_start"))
          .orderBy("shard")
      },
      oracle = Some(
        """WITH n AS (SELECT doc_id,
          |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
          |      AS n_tok
          |  FROM documents),
          |o AS (SELECT doc_id, n_tok,
          |    coalesce(sum(n_tok) OVER (ORDER BY doc_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
          |  FROM n)
          |SELECT CAST(start_off // 4096 AS BIGINT) AS shard,
          |  CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
          |  CAST(min(start_off) AS BIGINT) AS min_start
          |FROM o GROUP BY 1 ORDER BY shard""".stripMargin
      ),
      doc = "training-shard sink round-trip: token-balanced shard " +
        "assignment via the distributed prefix sum, partitionBy(shard) " +
        "parquet write, partitioned read-back rollup vs the prefix-sum " +
        "replay — documents whole, boundaries deterministic in id order"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_k5_wav_sink",
      covers = "K5,G7",
      fn = (s, dir) => {
        // WAV segment sink verified structurally: encoded payload size
        // must be exactly 44 + 2·n for PCM16, and the filename scheme
        // is the zero-padded reference layout — both oracle-predictable
        // from the source relation alone
        val path = new java.io.File(
          sys.props("java.io.tmpdir"), "graft_k5_roundtrip").getPath
        val segs = table(s, dir, "events")
          .groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("event_id"), col("value"))))
            .as("evs"))
          .select(
            concat(lit("vid_"), col("user_id")).as("video_id"),
            (col("user_id") % 3L).cast("int").as("seg_idx"),
            expr("transform(evs, e -> e.value)").as("samples"),
            lit(true).as("selected"))
        graft.io.Sinks.writeSegments(segs, path)
        s.read.parquet(path)
          .select(
            col("file_name"),
            length(col("wav")).cast("long").as("n_bytes"))
          .orderBy("file_name")
      },
      oracle = Some(
        """SELECT 'vid_' || CAST(user_id AS VARCHAR) || '_' ||
          |    lpad(CAST(user_id % 3 AS VARCHAR), 8, '0') || '.wav' AS file_name,
          |  44 + 2 * CAST(count(*) AS BIGINT) AS n_bytes
          |FROM events GROUP BY user_id
          |ORDER BY file_name""".stripMargin
      ),
      doc = "K5 WAV segment sink: per-channel sample arrays encoded to " +
        "PCM16 WAV payloads in parquet; the oracle predicts the " +
        "filename scheme and the exact 44+2n byte length from the " +
        "source relation"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_s3_url_scan",
      covers = "S3,F5",
      fn = (s, dir) => {
        // the S3 face end to end: write a URL list with whitespace
        // padding and blank lines, scan it back through urlList —
        // trim + empty-filter must recover exactly the clean set
        val path = new java.io.File(
          sys.props("java.io.tmpdir"), "graft_s3_urls").getPath
        table(s, dir, "customer")
          .filter(col("c_custkey") % 100L === 0L)
          .select(concat(lit("  https://yt/c/"), col("c_custkey"), lit("  "))
            .as("value"))
          .unionByName(s.range(3).select(lit("   ").as("value")))
          .write.mode("overwrite").text(path)
        graft.io.Sources.urlList(s, path).orderBy("url")
      },
      oracle = Some(
        """SELECT 'https://yt/c/' || CAST(c_custkey AS VARCHAR) AS url
          |FROM customer WHERE c_custkey % 100 = 0
          |ORDER BY url""".stripMargin
      ),
      doc = "S3 text-line scan round-trip: padded lines trimmed, blank " +
        "lines dropped, oracle = the clean URL set from the source " +
        "relation (string order)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_s4_json_document",
      covers = "S4",
      fn = (s, dir) => {
        // whole-file JSON document (multiLine array), the shape the
        // reference's meta files use: built driver-side from the
        // region relation (metadata-sized), scanned back through the
        // S4 face
        val f = new java.io.File(
          sys.props("java.io.tmpdir"), "graft_s4_doc.json")
        val rows = table(s, dir, "region")
          .select("r_regionkey", "r_name")
          .orderBy("r_regionkey")
          .collect()
        val doc = rows.map(r =>
          s"""{"r_regionkey": ${r.getInt(0)}, "r_name": "${r.getString(1)}"}""")
          .mkString("[\n", ",\n", "\n]")
        java.nio.file.Files.write(f.toPath,
          doc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        graft.io.Sources.jsonDocument(s, f.getPath)
          .select(col("r_regionkey"), col("r_name"))
          .orderBy("r_regionkey")
      },
      oracle = Some(
        "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"
      ),
      doc = "S4 whole-file JSON document scan (multiLine array) " +
        "round-trip against the source relation"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_s9_wav_scan",
      covers = "S9,G7",
      fn = (s, dir) => {
        // the S9 face end to end over REAL PCM16 files: per-user waves
        // (value/1000, all in (0,1)) encoded to .wav fixtures
        // driver-side (bounded: |users|/7 files), scanned back through
        // binaryFile + wavDecode. The oracle replays the codec's
        // integer core: encode quantizes to floor(v*32767+0.5) and
        // decode's s/32767.0 round-trips back to s exactly, so the
        // per-file quantized sum is engine-exact integer arithmetic.
        val base = new java.io.File(
          sys.props("java.io.tmpdir"), "graft_s9_wavs")
        def rm(x: java.io.File): Unit = {
          if (x.isDirectory) x.listFiles().foreach(rm)
          x.delete(): Unit
        }
        if (base.exists()) rm(base)
        base.mkdirs()
        table(s, dir, "events")
          .filter(col("user_id") % 7L === 0L)
          .groupBy("user_id")
          .agg(sort_array(collect_list(struct(col("event_id"), col("value"))))
            .as("evs"))
          .select(col("user_id"),
            expr("transform(evs, e -> e.value / 1000.0)").as("w"))
          .collect()
          .foreach { r =>
            val uid = r.getLong(0)
            val w = r.getSeq[Double](1).toArray
            java.nio.file.Files.write(
              new java.io.File(base, f"u$uid%06d.wav").toPath,
              graft.signal.Signal.wavEncode(w, 16000))
          }
        graft.io.Sources.wavFiles(s, base.getPath)
          .select(
            regexp_extract(col("path"), "u(\\d+)\\.wav$", 1).cast("long")
              .as("user_id"),
            col("sample_rate").cast("long").as("sample_rate"),
            size(col("samples")).cast("long").as("n_samples"),
            expr("aggregate(samples, 0L, " +
              "(acc, x) -> acc + CAST(floor(x * 32767.0 + 0.5) AS LONG))")
              .as("sum_q"))
          .orderBy("user_id")
      },
      oracle = Some(
        """SELECT user_id, 16000 AS sample_rate,
          |  CAST(count(*) AS BIGINT) AS n_samples,
          |  CAST(sum(CAST(floor(value / 1000.0 * 32767.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_q
          |FROM events WHERE user_id % 7 = 0
          |GROUP BY user_id ORDER BY user_id""".stripMargin
      ),
      doc = "S9 WAV file scan round-trip over REAL PCM16 fixtures: " +
        "binaryFile + wavDecode recovers sample rate, length, and the " +
        "exact quantized-integer sum predicted from the source " +
        "relation (codec round-trip s = floor(v*32767+0.5) is " +
        "integer-exact both ways)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_k4_metajson_roundtrip",
      covers = "K4,A5",
      fn = (s, dir) => {
        // K4's real payload shape is NESTED (the channel-meta document:
        // scalars + an array of structs) — write one JSON document line
        // per parent through the actual sink, read back with the full
        // nested schema, flatten, and the oracle is the flat source
        // relation
        val path = new java.io.File(
          sys.props("java.io.tmpdir"), "graft_k4_roundtrip").getPath
        val nested = table(s, dir, "nation")
          .groupBy(col("n_regionkey"))
          .agg(sort_array(collect_list(struct(col("n_nationkey"), col("n_name"))))
            .as("nations"))
        graft.io.Sinks.writeMetaJson(nested, path)
        s.read
          .schema("n_regionkey INT, " +
            "nations ARRAY<STRUCT<n_nationkey: INT, n_name: STRING>>")
          .json(path)
          .select(col("n_regionkey"), explode(col("nations")).as("n"))
          .select(col("n_regionkey"), col("n.n_nationkey").as("n_nationkey"),
            col("n.n_name").as("n_name"))
          .orderBy("n_nationkey")
      },
      oracle = Some(
        "SELECT n_regionkey, n_nationkey, n_name FROM nation ORDER BY n_nationkey"
      ),
      doc = "K4 nested JSON document sink round-trip: array-of-struct " +
        "payload written one document per line, re-read with the " +
        "nested schema and flattened back to the source relation"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_j7_salted_join",
      covers = "J1",
      fn = (s, dir) => {
        // Hot-key posture: lineitem shuffles on (l_suppkey, salt) so a
        // pathological supplier spreads over 8 reducers; the supplier
        // dim is replicated once per salt. The RESULT is salt-invariant
        // (row multiplicity preserved exactly), so the plain inner join
        // is an exact oracle for the whole salting mechanism.
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // lineitem, so row-level output would tie-order differently per
        // engine; per-key aggregates (count + integer row checksum +
        // decimal sum) pin the join multiplicity exactly instead.
        val li = table(s, dir, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_suppkey", "l_quantity")
        val sup = table(s, dir, "supplier")
          .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
        graft.ops.Skew
          .saltedJoin(li, sup, "l_suppkey", salts = 8)
          .groupBy("l_suppkey", "s_name")
          .agg(
            count(lit(1)).as("n_rows"),
            sum(col("l_orderkey") * 8L + col("l_linenumber")).as("checksum"),
            sum(col("l_quantity").cast("decimal(20,2)"))
              .cast("double").as("sum_qty"))
          .orderBy("l_suppkey")
      },
      oracle = Some(
        """SELECT l_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_rows,
          |  CAST(sum(l_orderkey * 8 + l_linenumber) AS BIGINT) AS checksum,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty
          |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          |GROUP BY l_suppkey, s_name ORDER BY l_suppkey""".stripMargin
      ),
      doc = "salted skew join: big side salted over 8 shuffle keys, dim " +
        "replicated per salt; oracle = the plain join it must equal " +
        "(the 100 TB hot-channel posture, ops/Skew.scala)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_j8_skew_split_join",
      covers = "J1",
      fn = (s, dir) => {
        // Extreme-skew posture: keys above the hot threshold join via
        // broadcast of their dim rows, cold keys join normally, union
        // restores the full result. skew_key sends ~1/4 of lineitem to
        // key 1 (hot — and present in dim at every SF since s_suppkey=1
        // always exists) while the rest spread over cold keys ≥3 —
        // both branches are exercised. Result is split-invariant.
        val li = table(s, dir, "lineitem")
          .withColumn(
            "skew_key",
            when(col("l_orderkey") % 4L === 0L, lit(1L))
              .otherwise(col("l_suppkey") % 97L + 2L))
          .select("l_orderkey", "l_linenumber", "skew_key", "l_quantity")
        val dim = table(s, dir, "supplier")
          .select((col("s_suppkey") % 98L).as("skew_key"))
          .distinct()
          .withColumn("dim_tag", concat(lit("grp_"), col("skew_key")))
        graft.ops.Skew
          .skewSplitJoin(li, dim, "skew_key", hotKeyThreshold = 500L)
          .groupBy("skew_key", "dim_tag")
          .agg(
            count(lit(1)).as("n_rows"),
            sum(col("l_orderkey") * 8L + col("l_linenumber")).as("checksum"),
            sum(col("l_quantity").cast("decimal(20,2)"))
              .cast("double").as("sum_qty"))
          .orderBy("skew_key")
      },
      oracle = Some(
        """WITH li AS (
          |  SELECT l_orderkey, l_linenumber,
          |    CASE WHEN l_orderkey % 4 = 0 THEN 1
          |         ELSE l_suppkey % 97 + 2 END AS skew_key,
          |    l_quantity
          |  FROM lineitem),
          |dim AS (
          |  SELECT skew_key, 'grp_' || skew_key AS dim_tag FROM (
          |    SELECT DISTINCT s_suppkey % 98 AS skew_key FROM supplier))
          |SELECT li.skew_key, dim_tag, CAST(count(*) AS BIGINT) AS n_rows,
          |  CAST(sum(l_orderkey * 8 + l_linenumber) AS BIGINT) AS checksum,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty
          |FROM li JOIN dim ON li.skew_key = dim.skew_key
          |GROUP BY li.skew_key, dim_tag ORDER BY li.skew_key""".stripMargin
      ),
      doc = "split skew join: hot keys (>threshold rows) broadcast their " +
        "dim rows, cold keys shuffle normally, union restores the plain " +
        "join exactly (ops/Skew.scala skewSplitJoin)"
    )
  )
}
