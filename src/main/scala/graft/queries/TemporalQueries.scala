package graft.queries

import graft.core.Graft.table
import graft.ops.Temporal
import org.apache.spark.sql.functions._

/** Temporal-join extensions (beyond the reference surface) + approx
  * sketches. Time arithmetic stays in raw nanosecond longs → integer-
  * exact on both engines.
  */
object TemporalQueries {

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    QueryDef(
      "q_j5_range_join",
      covers = "range-join",
      fn = (s, dir) => {
        val e = table(s, dir, "events")
        val a = e.select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
        val b = e.select(col("user_id").as("user_id_b"), col("event_id").as("b_id"),
          col("ts").as("b_ts"))
        Temporal
          .rangeJoin(a, b.withColumnRenamed("user_id_b", "user_id"),
            "user_id", "a_ts", "b_ts", windowNs = 86400L * 1000000000L)
          .filter(col("a_id") < col("b_id"))
          .groupBy(a("user_id"))
          .agg(
            count(lit(1)).as("n_pairs"),
            min(expr("(b_ts - a_ts) div 1000000000")).as("min_gap_s"),
            max(expr("(b_ts - a_ts) div 1000000000")).as("max_gap_s")
          )
          .orderBy("user_id")
      },
      oracle = Some(
        """WITH x AS (SELECT user_id, event_id, epoch_ns(ts) AS tns FROM events)
          |SELECT a.user_id, count(*) AS n_pairs,
          |  CAST(min((b.tns - a.tns) // 1000000000) AS BIGINT) AS min_gap_s,
          |  CAST(max((b.tns - a.tns) // 1000000000) AS BIGINT) AS max_gap_s
          |FROM x a JOIN x b ON a.user_id = b.user_id
          |  AND b.tns >= a.tns AND b.tns - a.tns < 86400000000000
          |  AND a.event_id < b.event_id
          |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin
      ),
      doc = "bounded time-window range self-join per key (co-partitioned " +
        "equi-join + range condition)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_j6_asof_join",
      covers = "asof-join",
      fn = (s, dir) => {
        val o = table(s, dir, "orders")
          .filter(col("o_custkey") < 150L)
          // o_orderdate is parquet TIMESTAMP_NTZ; session is UTC so the
          // NTZ→instant cast matches DuckDB's epoch_ns interpretation
          .withColumn("ons", expr("unix_millis(cast(o_orderdate as timestamp))") * 1000000L)
          .select("o_orderkey", "o_custkey", "ons")
        val e = table(s, dir, "events")
          .select(col("user_id").as("o_custkey"), col("event_id"), col("ts"))
        Temporal
          // merge-scan path: sorted union + last-seen state — no
          // (left × earlier-right) pair materialization; event_id
          // tiebreak matches the oracle's DESC-DESC rn=1 pick
          .asOfJoinMergeScan(o, e, "o_custkey", "ons", "ts",
            rightCols = Seq("event_id"), rightTieBreak = Seq("event_id"))
          .select(
            col("o_orderkey"),
            col("o_custkey"),
            col("asof.event_id").as("last_event_id"),
            expr("CASE WHEN asof_time IS NULL THEN NULL " +
              "ELSE (ons - asof_time) div 1000000000 END").as("gap_s")
          )
          .orderBy("o_orderkey")
      },
      oracle = Some(
        """WITH o AS (SELECT o_orderkey, o_custkey, epoch_ns(o_orderdate) AS ons
          |           FROM orders WHERE o_custkey < 150),
          |j AS (SELECT o.o_orderkey, o.o_custkey, o.ons, e.event_id,
          |        epoch_ns(e.ts) AS ens,
          |        row_number() OVER (PARTITION BY o.o_orderkey
          |          ORDER BY epoch_ns(e.ts) DESC NULLS LAST, e.event_id DESC) AS rn
          |      FROM o LEFT JOIN events e
          |        ON e.user_id = o.o_custkey AND epoch_ns(e.ts) <= o.ons)
          |SELECT o_orderkey, o_custkey, event_id AS last_event_id,
          |  CAST(CASE WHEN ens IS NULL THEN NULL
          |       ELSE (ons - ens) // 1000000000 END AS BIGINT) AS gap_s
          |FROM j WHERE rn = 1 ORDER BY o_orderkey""".stripMargin
      ),
      doc = "as-of join: latest event per key at/before each order's " +
        "timestamp via merge-scan (sorted union + last-seen state, " +
        "O(|L|+|R|) per key — no pair materialization)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_approx_sketches",
      covers = "approx-distinct,approx-quantile",
      fn = (s, dir) =>
        // HLL++ distinct + quantile sketches: algorithms are engine-
        // specific → rows-only check; exactness is covered by
        // q_d3_distinct_count
        table(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
            percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_price"),
            percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000)).as("p95_price"),
            count(lit(1)).as("n")
          )
          .orderBy("l_returnflag"),
      oracle = None,
      doc = "HLL++ approximate distinct + approximate quantiles — " +
        "sketch path for cardinalities too big to count exactly"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_sketch_cms",
      covers = "count-min-sketch,native-aggregate",
      fn = (s, dir) => {
        // The whole 4×64 grid built by the native aggregate, exploded
        // to nonzero (d, cell, cnt) rows; the oracle rebuilds every
        // cell from the published hash constants
        val cms = table(s, dir, "events")
          .agg(graft.plans.CountMinAgg
            .countMin(col("user_id"), depth = 4, width = 64).as("cms"))
        cms
          .select(posexplode(col("cms")).as(Seq("idx", "cnt")))
          .filter(col("cnt") > 0L)
          .select(expr("CAST(idx DIV 64 AS BIGINT)").as("d"),
            (col("idx") % 64).cast("long").as("cell"), col("cnt"))
          .orderBy("d", "cell")
      },
      oracle = Some {
        val rows = (0 until 4).map { d =>
          s"SELECT $d AS d, ${graft.plans.CountMinAgg.cellSql("user_id", d, 64)} AS cell FROM events"
        }.mkString(" UNION ALL ")
        s"""SELECT CAST(d AS BIGINT) AS d, CAST(cell AS BIGINT) AS cell,
           |  CAST(count(*) AS BIGINT) AS cnt
           |FROM ($rows)
           |GROUP BY d, cell ORDER BY d, cell""".stripMargin
      },
      doc = "Count-Min sketch grid (native TypedImperativeAggregate, " +
        "constant 4x64-long buffer, cell-wise-add merge): per-key " +
        "counting whose shuffle size is independent of key " +
        "cardinality; hash rows are pairwise-independent " +
        "((a*x+b) mod 2^31-1) mod w with published constants, so the " +
        "oracle rebuilds the grid integer-exactly"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_sketch_cms_estimate",
      covers = "count-min-sketch,heavy-hitters",
      fn = (s, dir) => {
        import graft.plans.CountMinAgg
        // Point queries against the finished sketch: est(key) = min of
        // the key's 4 cells — broadcast one 2 KiB row, never re-touch
        // the corpus. est >= true always; equality whenever the key's
        // cells saw no collision.
        val ev = table(s, dir, "events")
        val sketch = ev.agg(
          CountMinAgg.countMin(col("user_id"), depth = 4, width = 64)
            .as("cms"))
        val truth = ev.groupBy("user_id")
          .agg(count(lit(1)).as("true_cnt"))
        val estCols = (0 until 4).map { d =>
          element_at(col("cms"),
            (lit(d * 64) + expr(CountMinAgg.cellSql("user_id", d, 64)))
              .cast("int") + 1)
        }
        truth.crossJoin(broadcast(sketch))
          .withColumn("est_cnt", least(estCols: _*))
          .select(col("user_id"), col("true_cnt"), col("est_cnt"),
            (col("est_cnt") >= col("true_cnt")).as("upper_bound_holds"))
          .orderBy("user_id")
      },
      oracle = Some {
        import graft.plans.CountMinAgg
        val rows = (0 until 4).map { d =>
          s"SELECT $d AS d, ${CountMinAgg.cellSql("user_id", d, 64)} AS cell FROM events"
        }.mkString(" UNION ALL ")
        val ests = (0 until 4).map { d =>
          s"""(SELECT cnt FROM cells
             | WHERE d = $d AND cell = ${CountMinAgg.cellSql("t.user_id", d, 64)})"""
            .stripMargin.replace("\n", " ")
        }.mkString(", ")
        s"""WITH cells AS (
           |  SELECT d, cell, CAST(count(*) AS BIGINT) AS cnt
           |  FROM ($rows) GROUP BY d, cell),
           |t AS (SELECT user_id, CAST(count(*) AS BIGINT) AS true_cnt
           |      FROM events GROUP BY user_id)
           |SELECT user_id, true_cnt,
           |  least($ests) AS est_cnt,
           |  least($ests) >= true_cnt AS upper_bound_holds
           |FROM t ORDER BY user_id""".stripMargin
      },
      doc = "Count-Min point estimates vs exact truth for every key: " +
        "est = min of the key's depth cells, read from the broadcast " +
        "sketch row (no second corpus pass); the upper-bound invariant " +
        "est >= true is part of the checked output"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_profile_columns",
      covers = "data-profiling",
      fn = (s, dir) =>
        graft.ops.Profile
          .profile(table(s, dir, "documents"),
            Seq("doc_id", "text", "lang", "source", "n_chars"))
          .orderBy("col_name"),
      oracle = Some(
        """SELECT * FROM (
          |  SELECT 'doc_id' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
          |    CAST(count(*) - count(doc_id) AS BIGINT) AS n_null,
          |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
          |    CAST(min(doc_id) AS VARCHAR) AS min_val,
          |    CAST(max(doc_id) AS VARCHAR) AS max_val FROM documents
          |  UNION ALL
          |  SELECT 'text', CAST(count(*) AS BIGINT),
          |    CAST(count(*) - count(text) AS BIGINT),
          |    CAST(count(DISTINCT text) AS BIGINT),
          |    min(text), max(text) FROM documents
          |  UNION ALL
          |  SELECT 'lang', CAST(count(*) AS BIGINT),
          |    CAST(count(*) - count(lang) AS BIGINT),
          |    CAST(count(DISTINCT lang) AS BIGINT),
          |    min(lang), max(lang) FROM documents
          |  UNION ALL
          |  SELECT 'source', CAST(count(*) AS BIGINT),
          |    CAST(count(*) - count(source) AS BIGINT),
          |    CAST(count(DISTINCT source) AS BIGINT),
          |    min(source), max(source) FROM documents
          |  UNION ALL
          |  SELECT 'n_chars', CAST(count(*) AS BIGINT),
          |    CAST(count(*) - count(n_chars) AS BIGINT),
          |    CAST(count(DISTINCT n_chars) AS BIGINT),
          |    CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
          |  FROM documents)
          |ORDER BY col_name""".stripMargin
      ),
      doc = "column profiling: per-column null/distinct counts and " +
        "native-order min/max in ONE wide aggregation pass, exploded " +
        "to a row per column"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_profile_quantiles",
      covers = "data-profiling,exact-percentiles",
      fn = (s, dir) =>
        graft.ops.Profile
          .quantiles(table(s, dir, "documents"), "lang", "n_chars",
            Seq(0.25, 0.5, 0.75, 0.95))
          .orderBy("lang"),
      // PERCENTILE_DISC picks an actual element (smallest value whose
      // cume_dist >= p) — integer-exact, no interpolation float;
      // DuckDB's quantile_disc implements the same definition
      oracle = Some(
        """SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
          |  CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS p25,
          |  CAST(quantile_disc(n_chars, 0.5)  AS BIGINT) AS p50,
          |  CAST(quantile_disc(n_chars, 0.75) AS BIGINT) AS p75,
          |  CAST(quantile_disc(n_chars, 0.95) AS BIGINT) AS p95
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
      ),
      doc = "exact per-language length percentiles (percentile_disc — " +
        "an actual corpus element, cross-engine exact): the " +
        "calibration pass that adaptive quality gates read their " +
        "thresholds from"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_gate_adaptive_band",
      covers = "data-profiling,adaptive-gate",
      fn = (s, dir) =>
        graft.ops.Profile
          .adaptiveBandGate(
            table(s, dir, "documents").select("doc_id", "lang", "n_chars"),
            "lang", "n_chars", pLo = 0.05, pHi = 0.95)
          .select(col("doc_id"), col("lang"), col("n_chars"),
            col("band_lo"), col("band_hi"), col("in_band"))
          .orderBy("doc_id"),
      oracle = Some(
        """WITH bands AS (
          |  SELECT lang,
          |    CAST(quantile_disc(n_chars, 0.05) AS BIGINT) AS band_lo,
          |    CAST(quantile_disc(n_chars, 0.95) AS BIGINT) AS band_hi
          |  FROM documents GROUP BY lang)
          |SELECT doc_id, d.lang, n_chars, band_lo, band_hi,
          |  n_chars >= band_lo AND n_chars <= band_hi AS in_band
          |FROM documents d JOIN bands ON d.lang = bands.lang
          |ORDER BY doc_id""".stripMargin
      ),
      doc = "adaptive per-group outlier gate: each language's [p5,p95] " +
        "band comes from its OWN length distribution (broadcast back — " +
        "no corpus shuffle), so low-resource languages aren't " +
        "mis-trimmed by a global constant"
    )
  )
}
