package graft.queries

import graft.core.Graft.table
import graft.layout.Layout
import graft.ops.LinkGraph
import graft.text.{CorpusAudit, Html}
import org.apache.spark.sql.functions._

/** Web-corpus front-door + table-maintenance operators added in round
  * 10's continuation: HTML→text extraction, link-graph PageRank, the
  * Lee-et-al duplicated-n-gram audit, the robust MAD length gate, and
  * partition-pruned MERGE upsert.
  *
  * Every face is integer/string-exact end to end (PageRank is scaled
  * BIGINT floor division; MAD medians are rank-picked, not
  * interpolated; the merge face aggregates prices in DECIMAL), so all
  * five are fully DuckDB-oracled under the QueryDef determinism rules.
  */
object WebQueries {

  /** The HTML fixture both engines build verbatim from `documents`:
    * head boilerplate (style + script that must vanish), a comment,
    * nav links (the href fixture), an entity-bearing paragraph, the
    * document text in a div, a trailing lang paragraph.
    */
  private def htmlCol = concat(
    lit("<html><head><title>Doc "), col("doc_id"), lit("</title>"),
    lit("<style>body { color: #333; }</style>"),
    lit("<script type=\"text/javascript\">var t = \"<b>not text</b>\";</script>"),
    lit("</head><body>"),
    lit("<!-- crawl-id: "), col("doc_id"), lit(" -->"),
    lit("<h1>Doc "), col("doc_id"), lit("</h1>"),
    lit("<nav><a href=\"https://example.com/home\">Home</a>"),
    lit("<a href=\"https://example.com/d/"), col("doc_id"), lit("\">Self</a></nav>"),
    lit("<p>Tom &amp; Jerry &lt;3 &quot;quoted&quot; it&#39;s&nbsp;here</p>"),
    lit("<div>"), col("text"), lit("</div>"),
    lit("<p>lang: "), col("lang"), lit("</p>"),
    lit("</body></html>"))

  /** Oracle-side rendering of the same fixture + the same extraction
    * chain. Patterns live in the RE2 ∩ java.util.regex common subset;
    * DuckDB needs the explicit 'g' flag (its regexp_replace is
    * first-match by default, Spark's is global).
    */
  private val htmlExtractOracle = {
    // NB: concatenation operators stay at line END — a leading "||"
    // would lose a pipe to the outer stripMargin
    val fixture =
      "'<html><head><title>Doc ' || doc_id || '</title>' || " +
        "'<style>body { color: #333; }</style>' || " +
        "'<script type=\"text/javascript\">var t = \"<b>not text</b>\";</script>' || " +
        "'</head><body>' || " +
        "'<!-- crawl-id: ' || doc_id || ' -->' || " +
        "'<h1>Doc ' || doc_id || '</h1>' || " +
        "'<nav><a href=\"https://example.com/home\">Home</a>' || " +
        "'<a href=\"https://example.com/d/' || doc_id || '\">Self</a></nav>' || " +
        "'<p>Tom &amp; Jerry &lt;3 &quot;quoted&quot; it&#39;s&nbsp;here</p>' || " +
        "'<div>' || text || '</div>' || " +
        "'<p>lang: ' || lang || '</p>' || " +
        "'</body></html>'"
    s"""WITH h AS (SELECT doc_id, $fixture AS html FROM documents),
       |s1 AS (SELECT doc_id, html,
       |  regexp_replace(html, '(?is)<script[^>]*>.*?</script>', '', 'g') AS t
       |  FROM h),
       |s2 AS (SELECT doc_id, html,
       |  regexp_replace(t, '(?is)<style[^>]*>.*?</style>', '', 'g') AS t FROM s1),
       |s3 AS (SELECT doc_id, html,
       |  regexp_replace(t, '(?s)<!--.*?-->', '', 'g') AS t FROM s2),
       |s4 AS (SELECT doc_id, html,
       |  regexp_replace(t, '(?i)<(?:br|/p|/div|/li|/tr|/h[1-6]|/title)[^>]*>',
       |                 chr(10), 'g') AS t FROM s3),
       |s5 AS (SELECT doc_id, html,
       |  regexp_replace(t, '<[^>]*>', '', 'g') AS t FROM s4),
       |e AS (SELECT doc_id, html,
       |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |  regexp_replace(regexp_replace(t,
       |    '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
       |    '&#39;', chr(39), 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS t
       |  FROM s5),
       |w AS (SELECT doc_id, html,
       |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
       |    '[ \t\r]+', ' ', 'g'), ' ?\n ?', chr(10), 'g'),
       |    '\n{3,}', chr(10)||chr(10), 'g'), '^[\n ]+|[\n ]+$$', '', 'g') AS t
       |  FROM e),
       |lk AS (SELECT doc_id,
       |  regexp_extract_all(html, 'href\\s*=\\s*"([^"]*)"', 1) AS links
       |  FROM h)
       |SELECT w.doc_id,
       |  CAST(length(w.t) AS BIGINT) AS text_len,
       |  md5(w.t) AS text_md5,
       |  CAST(len(lk.links) AS BIGINT) AS n_links,
       |  array_to_string(lk.links, '|') AS links
       |FROM w JOIN lk ON w.doc_id = lk.doc_id
       |ORDER BY w.doc_id""".stripMargin
  }

  /** PageRank oracle: 3 unrolled rounds of integer floor-division mass
    * propagation over the deterministic order-graph (even orderkeys
    * send customer→supplier, odd send supplier→customer, so both node
    * classes receive mass and the graph has cycles).
    */
  private val pageRankOracle =
    """WITH e AS (
      |  SELECT DISTINCT
      |    CASE WHEN l_orderkey % 2 = 0 THEN o_custkey * 2
      |         ELSE l_suppkey * 2 + 1 END AS src,
      |    CASE WHEN l_orderkey % 2 = 0 THEN l_suppkey * 2 + 1
      |         ELSE o_custkey * 2 END AS dst
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
      |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM n),
      |c1 AS (SELECT e.dst, SUM((r0.rank * 85) // (100 * od.outdeg)) AS m
      |       FROM e JOIN r0 ON e.src = r0.node JOIN od ON e.src = od.src
      |       GROUP BY e.dst),
      |r1 AS (SELECT n.node, CAST(150000 + COALESCE(c1.m, 0) AS BIGINT) AS rank
      |       FROM n LEFT JOIN c1 ON n.node = c1.dst),
      |c2 AS (SELECT e.dst, SUM((r1.rank * 85) // (100 * od.outdeg)) AS m
      |       FROM e JOIN r1 ON e.src = r1.node JOIN od ON e.src = od.src
      |       GROUP BY e.dst),
      |r2 AS (SELECT n.node, CAST(150000 + COALESCE(c2.m, 0) AS BIGINT) AS rank
      |       FROM n LEFT JOIN c2 ON n.node = c2.dst),
      |c3 AS (SELECT e.dst, SUM((r2.rank * 85) // (100 * od.outdeg)) AS m
      |       FROM e JOIN r2 ON e.src = r2.node JOIN od ON e.src = od.src
      |       GROUP BY e.dst),
      |r3 AS (SELECT n.node, CAST(150000 + COALESCE(c3.m, 0) AS BIGINT) AS rank
      |       FROM n LEFT JOIN c3 ON n.node = c3.dst)
      |SELECT CAST(node AS BIGINT) AS node, rank
      |FROM r3 ORDER BY rank DESC, node LIMIT 100""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    QueryDef(
      "q_text_html_extract",
      covers = "html-extract,web-front-door,P6",
      fn = (s, dir) => {
        val d = table(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("lang"))
          .withColumn("html", htmlCol)
        d.select(
          col("doc_id"),
          length(Html.htmlToText(col("html"))).cast("long").as("text_len"),
          md5(Html.htmlToText(col("html"))).as("text_md5"),
          size(Html.extractHrefs(col("html"))).cast("long").as("n_links"),
          array_join(Html.extractHrefs(col("html")), "|").as("links"))
          .orderBy("doc_id")
      },
      oracle = Some(htmlExtractOracle),
      doc = "HTML → text extraction (the web-corpus front door ahead " +
        "of every text gate): script/style/comment removal, block-tag " +
        "newlines, tag strip, entity decode (&amp; last), whitespace " +
        "normalization — one codegen'd regexp_replace chain, zero " +
        "shuffle; href extraction feeds the link graph. The oracle " +
        "renders the identical HTML fixture and replays the identical " +
        "chain (RE2 ∩ java.util.regex patterns), md5-matching the " +
        "extracted text"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_graph_pagerank",
      covers = "graph-pagerank,iterative",
      fn = (s, dir) => {
        val o = table(s, dir, "orders")
        val l = table(s, dir, "lineitem")
        val even = col("l_orderkey") % 2 === 0
        // pin the fact-dim preamble join to shuffled-hash: sort-merge
        // would sort all 6|orders| lineitem rows just to throw the
        // order away in the distinct (probed: 32 s vs 7 s at sf10)
        val e = o.hint("shuffle_hash")
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .select(
            when(even, col("o_custkey") * 2)
              .otherwise(col("l_suppkey") * 2 + 1).cast("long").as("src"),
            when(even, col("l_suppkey") * 2 + 1)
              .otherwise(col("o_custkey") * 2).cast("long").as("dst"))
          .distinct()
        LinkGraph.pageRank(e, iters = 3)
          .orderBy(col("rank").desc, col("node").asc)
          .limit(100)
      },
      oracle = Some(pageRankOracle),
      doc = "integer-exact PageRank (3 rounds, damping 85/100, scaled " +
        "BIGINT floor division — no float touches a rank) over the " +
        "deterministic customer↔supplier order graph; the canonical " +
        "Pregel iteration as DataFrame joins: edge list pre-joined " +
        "with out-degrees once and cached, two 8-byte-key shuffles " +
        "per round, localCheckpoint lineage truncation. The oracle " +
        "unrolls all three rounds as CTEs"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_text_top_ngrams",
      covers = "dedup-audit,ngram,O2",
      fn = (s, dir) =>
        CorpusAudit.topDuplicatedNgrams(
          table(s, dir, "documents"), "doc_id", "text", n = 3, k = 100),
      oracle = Some(
        """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
          |           FROM documents),
          |g AS (SELECT doc_id, array_to_string(toks[p:p+2], ' ') AS gram
          |      FROM t, UNNEST(generate_series(1, len(toks) - 2)) AS u(p)
          |      WHERE len(toks) >= 3),
          |c AS (SELECT gram, count(*) AS occurrences,
          |             count(DISTINCT doc_id) AS n_docs,
          |             min(doc_id) AS example_doc
          |      FROM g WHERE length(gram) > 0 GROUP BY gram)
          |SELECT gram, occurrences, n_docs, example_doc
          |FROM c WHERE occurrences > 1
          |ORDER BY occurrences DESC, gram ASC LIMIT 100""".stripMargin),
      doc = "most-duplicated token 3-grams corpus-wide (Lee et al. " +
        "'22's dedup audit — the boilerplate-family exposure run " +
        "before picking dedup thresholds): per-row gram generation " +
        "in one compiled loop per doc (no self-join, no interpreted " +
        "HOF lambdas), one count shuffle keyed on 16-byte digests " +
        "with a min-exemplar gram, TakeOrderedAndProject top-k"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_text_mad_gate",
      covers = "quality-gate,robust-stats",
      fn = (s, dir) =>
        CorpusAudit.madLengthGate(
          table(s, dir, "documents"),
          "doc_id", "source", "n_chars", madNum = 3L, madDen = 1L)
          .orderBy("doc_id"),
      oracle = Some(
        """WITH b AS (SELECT doc_id, source AS grp, n_chars AS len
          |           FROM documents),
          |mr AS (SELECT grp, len, doc_id,
          |         row_number() OVER (PARTITION BY grp ORDER BY len, doc_id) AS rn,
          |         count(*) OVER (PARTITION BY grp) AS cnt FROM b),
          |m AS (SELECT grp, len AS med FROM mr WHERE rn = (cnt + 1) // 2),
          |d AS (SELECT b.doc_id, b.grp, abs(b.len - m.med) AS adev
          |      FROM b JOIN m USING (grp)),
          |dr AS (SELECT grp, adev, doc_id,
          |         row_number() OVER (PARTITION BY grp ORDER BY adev, doc_id) AS rn,
          |         count(*) OVER (PARTITION BY grp) AS cnt FROM d),
          |md AS (SELECT grp, adev AS mad FROM dr WHERE rn = (cnt + 1) // 2)
          |SELECT b.doc_id, b.grp, CAST(b.len AS BIGINT) AS len,
          |  CAST(m.med AS BIGINT) AS med, CAST(md.mad AS BIGINT) AS mad,
          |  abs(b.len - m.med) * 1 <= md.mad * 3 AS keep
          |FROM b JOIN m USING (grp) JOIN md USING (grp)
          |ORDER BY b.doc_id""".stripMargin),
      doc = "robust per-source length-outlier gate: EXACT lower " +
        "medians picked by rank (never interpolated — every statistic " +
        "stays integer), MAD dispersion, keep ⇔ |len−med|·den ≤ " +
        "k·MAD·num with integer cross-multiplication; two rank-by-" +
        "group passes shuffling (group,len,id) triples, then a " +
        "group-cardinality-sized broadcast onto the corpus"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_layout_merge_upsert",
      covers = "merge-upsert,layout,T2",
      fn = (s, dir) => {
        val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
        val path = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft_merge_tgt_$key").getPath
        val base = table(s, dir, "orders").select(
          col("o_orderkey").as("k"), col("o_custkey").as("c"),
          col("o_totalprice").as("p"), col("o_orderpriority").as("pr"))
        // fresh base every run: the merge batch is absolute-valued, so
        // merge∘merge = merge, but a clean base keeps the face
        // self-contained at any SF
        Layout.writePartitioned(base, path, "pr")
        val batch = base.select(col("k"), col("c"), col("p"), col("pr"))
          .withColumn("__deleted", lit(false))
        val updates = batch.where(col("k") % 7 === 0 && col("k") % 13 =!= 0)
          .withColumn("p", (col("k") % 997).cast("double") + 0.25)
        val deletes = batch.where(col("k") % 13 === 0)
          .withColumn("__deleted", lit(true))
        val inserts = batch.where(col("k") % 11 === 0)
          .withColumn("k", col("k") + 100000000L)
          .withColumn("p", lit(1.5))
        Layout.mergeUpsert(
          s, path, "pr", "k",
          updates.unionByName(deletes).unionByName(inserts))
        s.read.parquet(path)
          .groupBy("pr")
          .agg(
            count(lit(1)).as("n"),
            // floor(double) is IEEE-identical cross-engine; a
            // double→DECIMAL cast of raw prices is NOT (Spark casts via
            // the shortest decimal rendering, DuckDB via the exact
            // binary value — they differ in the 10th decimal)
            sum(floor(col("p")).cast("long")).as("sum_pf"),
            min("k").as("min_k"), max("k").as("max_k"),
            countDistinct("k").as("n_keys"))
          .orderBy("pr")
      },
      oracle = Some(
        """WITH base AS (SELECT o_orderkey AS k, o_custkey AS c,
          |                     o_totalprice AS p, o_orderpriority AS pr
          |              FROM orders),
          |upd AS (SELECT k, c, CAST(k % 997 AS DOUBLE) + 0.25 AS p, pr
          |        FROM base WHERE k % 7 = 0 AND k % 13 <> 0),
          |ins AS (SELECT k + 100000000 AS k, c, 1.5 AS p, pr
          |        FROM base WHERE k % 11 = 0),
          |final AS (
          |  SELECT * FROM base WHERE k % 13 <> 0 AND k % 7 <> 0
          |  UNION ALL SELECT * FROM upd
          |  UNION ALL SELECT * FROM ins)
          |SELECT pr, CAST(count(*) AS BIGINT) AS n,
          |  CAST(SUM(CAST(floor(p) AS BIGINT)) AS BIGINT) AS sum_pf,
          |  min(k) AS min_k, max(k) AS max_k,
          |  CAST(count(DISTINCT k) AS BIGINT) AS n_keys
          |FROM final GROUP BY pr ORDER BY pr""".stripMargin),
      doc = "Delta-style MERGE on a partitioned parquet table: one " +
        "batch carrying updates (absolute-valued), deletes, and " +
        "inserts applied via partition-pruned copy-on-write (the " +
        "scan reads only the batch's partitions; dynamic partition " +
        "overwrite rewrites only those directories — LayoutSpec " +
        "proves untouched partitions' files are byte-identical). " +
        "The face verifies the post-merge table against a relational " +
        "replay of the merge semantics"
    )
  )
}
