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

  /** Idempotent per-sfDir build of the month-partitioned fact the DPP
    * query reads: ~83 ship-month directories under tmpdir, marker-file
    * guarded so repeat invocations (and the Bench timed run, after
    * Bench's untimed prepare pass) skip straight to the read.
    */
  private[queries] def dppFixture(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val path = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_dpp_fact_$key").getPath
    val marker = new java.io.File(path, "_GRAFT_READY")
    // staleness guard: the marker records the source table's file
    // signature, so a regenerated testdata dir forces a rebuild
    def sig(f: java.io.File): String =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName)
          .map(c => s"${c.getName}:${c.length}:${c.lastModified}")
          .mkString("|")
      else s"${f.length}:${f.lastModified}"
    val want = sig(new java.io.File(dir, "lineitem.parquet"))
    val fresh = marker.exists &&
      java.nio.file.Files.readString(marker.toPath) == want
    if (!fresh) {
      val li = table(s, dir, "lineitem")
        .select(
          (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
            .as("ship_month"),
          col("l_quantity"))
      Layout.writePartitioned(li, path, "ship_month")
      java.nio.file.Files.writeString(marker.toPath, want)
    }
    path
  }

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
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_layout_zorder",
      covers = "layout,zorder,native-expression",
      fn = (s, dir) =>
        table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            graft.plans.ZOrderExpr
              .zorder(col("o_custkey"), col("o_orderkey")).as("z"))
          .orderBy("z", "o_orderkey"),
      // the oracle replays the 5-step shift-or-mask spread ladder on
      // BIGINT; masks keep every intermediate non-negative, and the
      // 31-bit input mask bounds z under 2^62
      oracle = Some(
        """WITH base AS (SELECT o_orderkey, o_custkey,
          |    o_custkey & 2147483647 AS x0, o_orderkey & 2147483647 AS y0
          |  FROM orders),
          |s1 AS (SELECT *, (x0 | (x0 << 16)) & 281470681808895 AS x1,
          |                 (y0 | (y0 << 16)) & 281470681808895 AS y1 FROM base),
          |s2 AS (SELECT *, (x1 | (x1 << 8)) & 71777214294589695 AS x2,
          |                 (y1 | (y1 << 8)) & 71777214294589695 AS y2 FROM s1),
          |s3 AS (SELECT *, (x2 | (x2 << 4)) & 1085102592571150095 AS x3,
          |                 (y2 | (y2 << 4)) & 1085102592571150095 AS y3 FROM s2),
          |s4 AS (SELECT *, (x3 | (x3 << 2)) & 3689348814741910323 AS x4,
          |                 (y3 | (y3 << 2)) & 3689348814741910323 AS y4 FROM s3),
          |s5 AS (SELECT *, (x4 | (x4 << 1)) & 6148914691236517205 AS x5,
          |                 (y4 | (y4 << 1)) & 6148914691236517205 AS y5 FROM s4)
          |SELECT o_orderkey, o_custkey, x5 | (y5 << 1) AS z
          |FROM s5 ORDER BY z, o_orderkey""".stripMargin
      ),
      doc = "Morton/Z-order interleave as a native codegen expression " +
        "(plans.ZOrderExpr): the clustering key of Layout.zorderWrite, " +
        "which makes parquet min/max stats tight on BOTH filter " +
        "dimensions at once (LayoutSpec quantifies the per-file span " +
        "shrink); bit-exact across engines, replayed in DuckDB"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_layout_bucket_prune",
      covers = "layout,bucket-pruning,point-lookup",
      fn = (s, dir) => {
        // Point lookups on the bucket key: hash(doc_id) names the ONE
        // bucket each probe can live in, so the scan opens ≤ 4 of the
        // 8 bucket files — at 100 TB with 2^18 buckets that is a
        // corpus/262144-sized read per probe, the index-free point-get
        // this layout exists for. autoBucketedScan would turn the
        // bucketed scan (and with it bucket pruning) OFF here because
        // no join/agg wants the hash distribution; pinned off at the
        // SESSION BOOTSTRAP (Graft.session), not here — a query fn
        // must not flip planner config the rest of the registry runs
        // under, or results would depend on execution order.
        // LayoutSpec asserts SelectedBucketsCount on this exact shape.
        val docs = table(s, dir, "documents")
          .select("doc_id", "lang", "source", "n_chars")
        Layout.writeBucketed(docs, "graft_bkt_point", "doc_id", buckets = 8)
        Layout.readTable(s, "graft_bkt_point")
          .filter(col("doc_id").isin(7L, 42L, 123L, 444L))
          .orderBy("doc_id")
      },
      oracle = Some(
        """SELECT doc_id, lang, source, n_chars FROM documents
          |WHERE doc_id IN (7, 42, 123, 444) ORDER BY doc_id""".stripMargin
      ),
      doc = "bucket-pruned point lookup: an IN-list filter on the " +
        "bucket key scans only the buckets the probed keys hash to " +
        "(SelectedBucketsCount ≤ 4 of 8, plan-asserted in LayoutSpec) " +
        "— the oracle replays the lookup over the raw table"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_layout_partition_dpp",
      covers = "layout,partition-pruning,dpp",
      fn = (s, dir) => {
        // Month-partitioned fact (83 ship months in the testdata); the
        // dim keeps only 1996's urgent-order months, so the runtime
        // subquery prunes the fact scan to ≤12 of 83 directories
        // BEFORE any file is opened. The join key stays the raw
        // inferred partition column (int) — a cast there would defeat
        // the PartitionPruning rule; the long cast happens after the
        // aggregate, where the driver hash needs int64. The fixture
        // build is idempotent and Bench pre-builds it untimed, so the
        // bench number measures the pruned read, not the 83-dir write.
        val fact = s.read.parquet(dppFixture(s, dir))
        val dim = table(s, dir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT" &&
            year(col("o_orderdate")) === 1996)
          .select((year(col("o_orderdate")) * 100 +
            month(col("o_orderdate"))).as("ship_month"))
          .distinct()
        fact.join(dim, "ship_month")
          .groupBy("ship_month")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_quantity").cast("decimal(20,2)"))
              .cast("double").as("sum_qty"))
          .select(col("ship_month").cast("long").as("ship_month"),
            col("n_rows"), col("sum_qty"))
          .orderBy("ship_month")
      },
      oracle = Some(
        """WITH dim AS (
          |  SELECT DISTINCT year(o_orderdate)*100 + month(o_orderdate)
          |    AS ship_month
          |  FROM orders
          |  WHERE o_orderpriority = '1-URGENT'
          |    AND year(o_orderdate) = 1996),
          |f AS (
          |  SELECT year(l_shipdate)*100 + month(l_shipdate) AS ship_month,
          |    l_quantity
          |  FROM lineitem)
          |SELECT CAST(f.ship_month AS BIGINT) AS ship_month,
          |  CAST(count(*) AS BIGINT) AS n_rows,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(20,2))) AS DOUBLE) AS sum_qty
          |FROM f JOIN dim USING (ship_month)
          |GROUP BY f.ship_month ORDER BY ship_month""".stripMargin
      ),
      doc = "month-partitioned fact layout + dynamic partition pruning: " +
        "joining against a filtered dimension inserts a " +
        "dynamicpruningexpression on the fact scan, so only the " +
        "surviving month directories are read (LayoutSpec asserts the " +
        "plan shape and that pruned-scan output rows shrink ~7x); the " +
        "oracle replays the join over the raw table",
      prepare = Some((s, dir) => { dppFixture(s, dir); () })
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_layout_compaction",
      covers = "layout,compaction,small-files",
      fn = (s, dir) => {
        val path = compactionFixture(s, dir)
        // the compaction PLANNER's sizing decisions at three targets:
        // pure metadata arithmetic (listing + ceil division), which is
        // exactly what must be deterministic for a rewrite of a 100 TB
        // corpus to be right-sized instead of guess-partitioned
        val rows = Seq(4096L, 65536L, 1048576L).map { target =>
          val (nFiles, totalBytes, nOut) =
            Layout.compactionPlan(s, path, target)
          (target, nFiles, totalBytes, nOut.toLong)
        }
        import s.implicits._
        rows.toDF("target_bytes", "n_files", "total_bytes", "n_out")
          .orderBy("target_bytes")
      },
      oracle = Some(
        """WITH g AS (
          |  SELECT doc_id % 12 AS grp,
          |    CAST(sum(n_chars) AS BIGINT) AS bytes
          |  FROM documents GROUP BY 1),
          |tot AS (
          |  SELECT CAST(count(*) AS BIGINT) AS n_files,
          |    CAST(sum(bytes) AS BIGINT) AS total_bytes
          |  FROM g),
          |t AS (SELECT CAST(unnest([4096, 65536, 1048576]) AS BIGINT)
          |        AS target_bytes)
          |SELECT t.target_bytes, tot.n_files, tot.total_bytes,
          |  CAST(greatest(1, (tot.total_bytes + t.target_bytes - 1)
          |    // t.target_bytes) AS BIGINT) AS n_out
          |FROM t CROSS JOIN tot ORDER BY t.target_bytes""".stripMargin
      ),
      doc = "compaction planner oracle: a small-files directory whose " +
        "per-file sizes are data-derived (group-g file holds exactly " +
        "sum(n_chars) of doc_id%12==g bytes) is listed and sized at " +
        "three targets; DuckDB replays the listing as the group sums " +
        "and the plan as ceil-division — files, total bytes, and " +
        "output count all integer-exact",
      prepare = Some((s, dir) => { compactionFixture(s, dir); () })
    )
  )

  /** Idempotent small-files fixture for the compaction planner: one
    * `part-gNN` file per doc_id%12 group, each holding EXACTLY the
    * group's sum(n_chars) bytes — so the directory listing the
    * planner sees is a pure function of the documents table and the
    * DuckDB oracle can replay it relationally. Marker-guarded like
    * [[dppFixture]]; Bench pre-builds it untimed.
    */
  private[queries] def compactionFixture(
      s: org.apache.spark.sql.SparkSession, dir: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
    val path = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_compact_src_$key").getPath
    val marker = new java.io.File(path, "_GRAFT_READY")
    def sig(f: java.io.File): String =
      if (f.isDirectory)
        f.listFiles().sortBy(_.getName)
          .map(c => s"${c.getName}:${c.length}:${c.lastModified}")
          .mkString("|")
      else s"${f.length}:${f.lastModified}"
    val want = sig(new java.io.File(dir, "documents.parquet"))
    val fresh = marker.exists &&
      java.nio.file.Files.readString(marker.toPath) == want
    if (!fresh) {
      // 12 (grp, bytes) rows — metadata-sized driver collect
      val sizes = table(s, dir, "documents")
        .groupBy((col("doc_id") % 12L).as("grp"))
        .agg(sum(col("n_chars")).as("bytes"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val d = new java.io.File(path)
      if (d.exists()) d.listFiles().foreach(_.delete()) else d.mkdirs()
      sizes.foreach { case (grp, bytes) =>
        val f = new java.io.File(d, f"part-g$grp%02d")
        val out = new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(f))
        try {
          val chunk = new Array[Byte](65536)
          var left = bytes
          while (left > 0) {
            val n = math.min(left, chunk.length.toLong).toInt
            out.write(chunk, 0, n)
            left -= n
          }
        } finally out.close()
      }
      java.nio.file.Files.writeString(marker.toPath, want)
    }
    path
  }
}
