package graft.queries

import graft.core.Graft.table
import graft.layout.Layout
import org.apache.spark.sql.functions._

/** Physical-layout faces: bucketed (pre-hashed) corpus tables whose
  * downstream joins and aggregations carry NO exchange. The query
  * results are layout-independent (the oracle is a plain join over the
  * raw parquet), so correctness checks the relational semantics while
  * LayoutSpec asserts the plan property that is the actual point:
  * zero ShuffleExchangeExec.
  */
object LayoutQueries {

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    QueryDef(
      "q_layout_bucketed_join",
      covers = "layout,bucketing,colocated-join",
      fn = (s, dir) => {
        // Write-once: corpus + embeddings bucketed IDENTICALLY on the
        // doc key (8 buckets at test scale; SCALE.md sizes 2^18+ for
        // 100 TB). The join then runs per-bucket with no shuffle on
        // either side — the merge hint forces the sort-merge path so
        // the assertion can't be satisfied vacuously by a broadcast.
        val docs = table(s, dir, "documents")
          .select("doc_id", "lang", "source", "n_chars")
        val embs = table(s, dir, "embeddings")
          .select(col("vec_id"), size(col("embedding")).cast("long").as("dim"),
            col("label").cast("long").as("label"))
        Layout.writeBucketed(docs, "graft_bkt_docs", "doc_id", buckets = 8)
        Layout.writeBucketed(embs, "graft_bkt_embs", "vec_id", buckets = 8)
        val l = Layout.readTable(s, "graft_bkt_docs").hint("merge")
        val r = Layout.readTable(s, "graft_bkt_embs")
        l.join(r, l("doc_id") === r("vec_id"))
          .select(l("doc_id"), col("lang"), col("source"), col("n_chars"),
            col("dim"), col("label"))
          .orderBy("doc_id")
      },
      oracle = Some(
        """SELECT doc_id, lang, source, n_chars,
          |  CAST(len(embedding) AS BIGINT) AS dim,
          |  CAST(label AS BIGINT) AS label
          |FROM documents JOIN embeddings ON doc_id = vec_id
          |ORDER BY doc_id""".stripMargin
      ),
      doc = "bucketed corpus layout: documents and embeddings written " +
        "CLUSTERED BY key INTO 8 BUCKETS, then joined co-located — " +
        "scan partitioning satisfies the join distribution, so the " +
        "plan has zero ShuffleExchangeExec (LayoutSpec asserts this); " +
        "at 100 TB this converts every per-pass corpus re-shuffle " +
        "into a write-once layout cost"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_layout_bucketed_agg",
      covers = "layout,bucketing,agg",
      fn = (s, dir) => {
        val docs = table(s, dir, "documents")
          .select("doc_id", "lang", "source", "n_chars")
        Layout.writeBucketed(docs, "graft_bkt_docs_agg", "doc_id", buckets = 8)
        // Aggregation keyed by the bucket column: partial+final agg
        // collapse into one exchange-free pass over the buckets.
        Layout.readTable(s, "graft_bkt_docs_agg")
          .groupBy(col("doc_id"))
          .agg(sum(col("n_chars")).as("sum_chars"),
            count(lit(1)).as("n_rows"))
          .orderBy("doc_id")
      },
      oracle = Some(
        """SELECT doc_id, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
          |  CAST(count(*) AS BIGINT) AS n_rows
          |FROM documents GROUP BY doc_id ORDER BY doc_id""".stripMargin
      ),
      doc = "aggregation on the bucket key of a bucketed table: the " +
        "scan's HashPartitioning satisfies the aggregate's required " +
        "distribution, so no exchange at all (plan-asserted)"
    )
  )
}
