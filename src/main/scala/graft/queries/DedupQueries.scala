package graft.queries

import graft.core.Graft.table
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (north-star training-data
  * ops). Exact and n-gram-Jaccard are DuckDB-checkable; MinHash-LSH and
  * SimHash use engine hash functions (xxhash64) with no portable SQL
  * equivalent → rows-only checks, with the Jaccard query validating the
  * shared shingle/verify machinery exactly.
  */
object DedupQueries {

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    QueryDef(
      "q_dedup_exact",
      covers = "dedup-exact,D1",
      fn = (s, dir) =>
        Dedup
          .exact(table(s, dir, "documents"), "doc_id", "text")
          .select("content_key", "doc_id", "n_copies")
          .orderBy("content_key"),
      oracle = Some(
        """SELECT md5(text) AS content_key, min(doc_id) AS doc_id,
          |       count(*) AS n_copies
          |FROM documents GROUP BY md5(text) ORDER BY content_key""".stripMargin
      ),
      doc = "exact dedup: content-digest hash-groupBy, only (digest,id) " +
        "shuffles"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_dedup_ngram_jaccard",
      covers = "dedup-jaccard",
      fn = (s, dir) =>
        Dedup
          .ngramJaccardPairs(
            table(s, dir, "documents"),
            "doc_id", "text",
            n = 3, minJaccard = 0.12, maxDf = Long.MaxValue
          )
          .orderBy("a", "b"),
      oracle = Some(
        """WITH sh0 AS (
          |  SELECT doc_id,
          |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
          |                   FOR i IN range(1, len(t) - 1)]) AS shs
          |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
          |sh AS (SELECT doc_id, unnest(shs) AS shingle FROM sh0),
          |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
          |pairs AS (
          |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_common
          |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
          |  GROUP BY x.doc_id, y.doc_id)
          |SELECT p.a, p.b, p.n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
          |  CAST(p.n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - p.n_common AS DOUBLE) AS jaccard
          |FROM pairs p
          |JOIN sizes sa ON sa.doc_id = p.a
          |JOIN sizes sb ON sb.doc_id = p.b
          |WHERE CAST(p.n_common AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - p.n_common AS DOUBLE) >= 0.12
          |ORDER BY a, b""".stripMargin
      ),
      doc = "exact word-3-gram Jaccard near-dup pairs via shingle " +
        "inverted-index self-join"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_dedup_clusters",
      covers = "dedup-clusters",
      fn = (s, dir) =>
        Dedup
          // oracle exactness requires the UNGUARDED join: the DuckDB
          // side computes exact Jaccard with no df cap, so this query
          // opts out of the library-default skew guard explicitly
          .jaccardClusters(table(s, dir, "documents"), "doc_id", "text",
            n = 3, minJaccard = 0.12, maxDf = Long.MaxValue)
          .orderBy("doc_id"),
      oracle = Some(
        """WITH sh0 AS (
          |  SELECT doc_id,
          |    list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
          |                   FOR i IN range(1, len(t) - 1)]) AS shs
          |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
          |sh AS (SELECT doc_id, unnest(shs) AS shingle FROM sh0),
          |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
          |cm AS (
          |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_common
          |  FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
          |  GROUP BY x.doc_id, y.doc_id),
          |pairs AS (
          |  SELECT p.a, p.b FROM cm p
          |  JOIN sizes sa ON sa.doc_id = p.a
          |  JOIN sizes sb ON sb.doc_id = p.b
          |  WHERE CAST(p.n_common AS DOUBLE)
          |    / CAST(sa.n_sh + sb.n_sh - p.n_common AS DOUBLE) >= 0.12),
          |edges AS (SELECT a AS src, b AS dst FROM pairs
          |          UNION SELECT b, a FROM pairs),
          |reach AS (
          |  WITH RECURSIVE r(node, mn) AS (
          |    SELECT src, src FROM edges
          |    UNION
          |    SELECT e.dst, r.mn FROM r JOIN edges e ON e.src = r.node
          |  ) SELECT node, min(mn) AS component FROM r GROUP BY node),
          |csize AS (SELECT component, count(*) AS cluster_size
          |          FROM reach GROUP BY component)
          |SELECT r.node AS doc_id, r.component, c.cluster_size,
          |       r.node = r.component AS is_canonical
          |FROM reach r JOIN csize c USING (component)
          |ORDER BY doc_id""".stripMargin
      ),
      doc = "near-dup clustering: connected components over the Jaccard " +
        "pair graph (min-label propagation vs recursive-CTE oracle), " +
        "canonical per cluster"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_dedup_minhash_lsh",
      covers = "dedup-minhash",
      fn = (s, dir) =>
        Dedup
          .minHashLshPairs(
            table(s, dir, "documents"),
            "doc_id", "text",
            n = 3, bands = 8, rowsPerBand = 4, minJaccard = 0.12
          )
          .orderBy("a", "b"),
      oracle = None, // xxhash64 permutations are engine-specific
      doc = "MinHash(32 perms) + 8-band LSH candidates, exact-Jaccard " +
        "verified (Broder '97 / MMDS ch.3)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_dedup_simhash",
      covers = "dedup-simhash",
      fn = (s, dir) =>
        Dedup
          .simHashPairs(table(s, dir, "documents"), "doc_id", "text", maxHamming = 7)
          .orderBy("a", "b"),
      oracle = None,
      doc = "64-bit SimHash (Charikar '02) with pigeonhole band blocking"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_mm_binary_meta",
      covers = "multimodal-binary",
      fn = (s, dir) =>
        // multimodal plumbing: opaque binary payload column + typed
        // metadata extracted without decoding (the decode path itself is
        // graft.multimodal with its stubbed codec)
        table(s, dir, "documents")
          .withColumn("payload", encode(col("text"), "UTF-8").cast("binary"))
          .select(
            col("doc_id"),
            expr("octet_length(payload)").cast("long").as("byte_len"),
            hex(expr("substring(payload, 1, 8)")).as("head8"),
            md5(col("payload")).as("payload_md5")
          )
          .orderBy("doc_id"),
      oracle = Some(
        """SELECT doc_id,
          |  octet_length(encode(text)) AS byte_len,
          |  hex(encode(substr(text, 1, 8))) AS head8,
          |  md5(text) AS payload_md5
          |FROM documents ORDER BY doc_id""".stripMargin
      ),
      doc = "binary-column metadata: byte length, header hex, digest — " +
        "schema plumbing for image/audio payloads"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_mm_frames",
      covers = "multimodal-frames",
      fn = (s, dir) => {
        val d = table(s, dir, "documents")
          .withColumn("payload", encode(col("text"), "UTF-8").cast("binary"))
        graft.multimodal.Multimodal
          .sampleFrames(d, "doc_id", "payload",
            graft.multimodal.StubFrameSampler, n = 3, batchSize = 64)
          .select(
            col("id").as("doc_id"),
            col("frame_idx"),
            col("ts_ms"),
            md5(col("frame")).as("frame_md5")
          )
          .orderBy("doc_id", "frame_idx")
      },
      oracle = Some(
        """WITH b AS (SELECT doc_id, text, length(text) // 3 AS flen FROM documents),
          |fr AS (SELECT doc_id, unnest(range(3)) AS i, flen, text
          |       FROM b WHERE flen > 0),
          |frames AS (
          |  SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
          |         CAST(i * 1000 AS BIGINT) AS ts_ms,
          |         md5(substr(text, CAST(i * flen + 1 AS BIGINT), flen)) AS frame_md5
          |  FROM fr
          |  UNION ALL
          |  SELECT doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT), md5(text)
          |  FROM b WHERE flen = 0)
          |SELECT doc_id, frame_idx, ts_ms, frame_md5
          |FROM frames ORDER BY doc_id, frame_idx""".stripMargin
      ),
      doc = "frame sampling — the 1→N multimodal generator: batched " +
        "partition-local extraction, frames digest-compared (sampler " +
        "stubbed as char slices; a real one seeks keyframes behind the " +
        "same trait)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_mm_resize",
      covers = "multimodal-transform",
      fn = (s, dir) => {
        val d = table(s, dir, "documents")
          .withColumn("payload", encode(col("text"), "UTF-8").cast("binary"))
        graft.multimodal.Multimodal
          .transformPayloads(d, "doc_id", "payload",
            graft.multimodal.StubResize(64), batchSize = 64)
          .select(col("id").as("doc_id"), col("out_len"),
            md5(col("payload_out")).as("out_md5"))
          .orderBy("doc_id")
      },
      oracle = None, // byte-stride resize stub has no portable SQL face
      doc = "payload resize/transcode shape: binary→binary batched " +
        "partition-local transform (pixel math stubbed, plumbing real)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_mm_features",
      covers = "multimodal-features",
      fn = (s, dir) => {
        // batched feature extraction over opaque payloads (the
        // mapInPandas-shaped path); stub decoder = deterministic
        val d = table(s, dir, "documents")
          .withColumn("payload", encode(col("text"), "UTF-8").cast("binary"))
        graft.multimodal.Multimodal
          .extractFeatures(d, "doc_id", "payload",
            graft.multimodal.StubImageDecoder, batchSize = 64)
          .select(
            col("id").as("doc_id"),
            size(col("features")).cast("long").as("dim"),
            round(element_at(col("features"), 1).cast("double"), 6).as("f0")
          )
          .orderBy("doc_id")
      },
      oracle = None, // stub decoder features have no SQL equivalent
      doc = "batched multimodal feature extraction via mapPartitions " +
        "(batch shape real, image decode stubbed — no image libs here)"
    )
  )
}
