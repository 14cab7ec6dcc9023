package graft.queries

import graft.core.Graft.table
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.apache.spark.sql.Column

/** Aggregations (SURVEY §2.6) and sorts/limits/windows (§2.7).
  *
  * Double sums follow the determinism rule: accumulate in DECIMAL
  * (order-independent, exact) and cast to double once — so Spark's
  * shuffle-order-dependent double addition can never diverge from the
  * DuckDB oracle.
  */
object AggWindowQueries {

  /** Exact order-independent sum of a 2-decimal-place double column. */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(28, 6))).cast(DoubleType)

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    QueryDef(
      "q_a1_array_stats",
      covers = "A1,S2",
      fn = (s, dir) =>
        table(s, dir, "events")
          .groupBy("user_id")
          .agg(sort_array(collect_list(col("value"))).as("snrss"))
          .select(
            col("user_id"),
            size(col("snrss")).cast("long").as("n_total"),
            size(filter(col("snrss"), _ > 20.0d)).cast("long").as("n_snr_ok"),
            size(filter(col("snrss"), _ > 100.0d)).cast("long").as("n_ac_ok")
          )
          .orderBy("user_id"),
      oracle = Some(
        """WITH q AS (SELECT user_id, list(value ORDER BY value) AS snrss
          |           FROM events GROUP BY user_id)
          |SELECT user_id, len(snrss) AS n_total,
          |  len(list_filter(snrss, x -> x > 20.0)) AS n_snr_ok,
          |  len(list_filter(snrss, x -> x > 100.0)) AS n_ac_ok
          |FROM q ORDER BY user_id""".stripMargin
      ),
      doc = "within-array stats via higher-order functions, no extra " +
        "shuffle (yt_channel_list_quality_merge c4)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_a2_minmax_score",
      covers = "A2,F7",
      fn = (s, dir) => {
        val counts = table(s, dir, "events")
          .groupBy("user_id")
          .agg(
            count(when(col("value") > 20.0d, 1)).as("n_snr_ok"),
            count(when(col("value") > 100.0d, 1)).as("n_ac_ok"),
            count(lit(1)).as("n_total")
          )
        // global max as a 1-row aggregate broadcast back — unlike an
        // empty-partition window this never funnels the (at scale,
        // huge) per-key table through a single partition.
        val maxes = counts.agg(
          max(col("n_snr_ok")).as("mx_snr"),
          max(col("n_ac_ok")).as("mx_ac")
        )
        counts
          .crossJoin(broadcast(maxes))
          .withColumn(
            "score",
            col("n_snr_ok").cast("double") / col("mx_snr").cast("double") +
              col("n_ac_ok").cast("double") / col("mx_ac").cast("double")
          )
          .filter(
            col("n_total") > 0L &&
              col("n_snr_ok").cast("double") / col("n_total").cast("double") > 0.1d
          )
          .select("user_id", "n_snr_ok", "n_ac_ok", "score")
          .orderBy("user_id")
      },
      oracle = Some(
        """WITH c AS (
          |  SELECT user_id,
          |    count(CASE WHEN value > 20.0 THEN 1 END) AS n_snr_ok,
          |    count(CASE WHEN value > 100.0 THEN 1 END) AS n_ac_ok,
          |    count(*) AS n_total
          |  FROM events GROUP BY user_id)
          |SELECT user_id, n_snr_ok, n_ac_ok,
          |  CAST(n_snr_ok AS DOUBLE) / CAST(max(n_snr_ok) OVER () AS DOUBLE)
          |    + CAST(n_ac_ok AS DOUBLE) / CAST(max(n_ac_ok) OVER () AS DOUBLE) AS score
          |FROM c
          |WHERE n_total > 0 AND CAST(n_snr_ok AS DOUBLE) / CAST(n_total AS DOUBLE) > 0.1
          |ORDER BY user_id""".stripMargin
      ),
      doc = "global-max min-max score normalization + ratio quality filter " +
        "(yt_channel_list_quality_merge c4, c8)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_a3_channel_stats",
      covers = "A3,A4,A6",
      fn = (s, dir) =>
        table(s, dir, "events")
          .groupBy("user_id")
          .agg(
            (dsum(col("value")) / 3600.0d).as("total_h"),
            (dsum(col("value")) / count(col("value"))).as("mean_value"),
            count(when(col("event_type") === "error", 1)).as("n_error"),
            count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
            count(lit(1)).as("n_events")
          )
          .orderBy("user_id"),
      oracle = Some(
        """SELECT user_id,
          |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / 3600.0 AS total_h,
          |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / count(value) AS mean_value,
          |  count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
          |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
          |  count(*) AS n_events
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
      ),
      doc = "per-channel duration-sum (fixed end-start sign bug of " +
        "data_pipeline.py:677-678), mean stats, counter tallies"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_a7_speech_score",
      covers = "A7,G5,J4",
      fn = (s, dir) =>
        // per-segment classifier output analog: (label, score-cents) pairs
        // reduced with the signed label weights — integer cents keep the
        // fold exact regardless of order. Quantization is floor(x+0.5),
        // not round(): round() on doubles is not cross-engine portable
        // (Spark rounds the shortest-decimal BigDecimal HALF_UP, DuckDB
        // rounds the binary double — they disagree at .5 boundaries).
        table(s, dir, "events")
          .withColumn("score_c", floor(col("value") * 100.0d + 0.5d).cast("long"))
          .groupBy("user_id")
          .agg(
            sum(
              when(col("event_type").isin("click", "view", "signup"), col("score_c"))
                .when(col("event_type").isin("error", "purchase"), -col("score_c"))
                .otherwise(0L)
            ).as("speech_score_c"),
            count(lit(1)).as("n_preds")
          )
          .orderBy("user_id"),
      oracle = Some(
        """WITH p AS (SELECT user_id, event_type,
          |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS score_c FROM events)
          |SELECT user_id,
          |  CAST(sum(CASE WHEN event_type IN ('click','view','signup') THEN score_c
          |           WHEN event_type IN ('error','purchase') THEN -score_c
          |           ELSE 0 END) AS BIGINT) AS speech_score_c,
          |  count(*) AS n_preds
          |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin
      ),
      doc = "signed label-weight score reduction (audio_ac.py:53-79)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_o1_o2_topk",
      covers = "O1,O2",
      fn = (s, dir) =>
        table(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal")
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
          .limit(50),
      oracle = Some(
        """SELECT c_custkey, c_name, c_acctbal FROM customer
          |ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 50""".stripMargin
      ),
      doc = "global sort + top-k → TakeOrderedAndProject, no full sort " +
        "(yt_channel_list_quality_merge c6, c14)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_o3_dynamic_group_limit",
      covers = "O3,P2",
      fn = (s, dir) => {
        // per-channel quota column drives a dynamic per-group limit
        val o = table(s, dir, "orders")
          .withColumn(
            "quota",
            when(col("o_custkey") % 3L === 0L, 2L)
              .when(col("o_custkey") % 3L === 1L, 5L)
              .otherwise(8L)
          )
        val w = Window
          .partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        o.withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= col("quota"))
          .select("o_custkey", "o_orderkey", "rn", "quota")
          .orderBy("o_custkey", "rn")
      },
      oracle = Some(
        """SELECT o_custkey, o_orderkey, rn, quota FROM (
          |  SELECT o_custkey, o_orderkey,
          |    CAST(row_number() OVER (PARTITION BY o_custkey
          |      ORDER BY o_orderdate ASC, o_orderkey ASC) AS BIGINT) AS rn,
          |    CASE WHEN o_custkey % 3 = 0 THEN 2
          |         WHEN o_custkey % 3 = 1 THEN 5 ELSE 8 END AS quota
          |  FROM orders)
          |WHERE rn <= quota ORDER BY o_custkey, rn""".stripMargin
      ),
      doc = "per-group dynamic top-k, quota as a column " +
        "(data_pipeline.py:561,575-598)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_o3_topk_native",
      covers = "O3,custom-plan",
      fn = (s, dir) =>
        // the custom TopKPerKey physical operator (bounded heap per
        // key, no per-partition sort) — same semantics as the window
        // formulation, checked against the same SQL oracle
        graft.plans.TopKPerKey
          .topKPerKey(
            table(s, dir, "orders"),
            keyCols = Seq(col("o_custkey")),
            orderCols = Seq(col("o_orderdate").asc, col("o_orderkey").asc),
            k = 3
          )
          .select("o_custkey", "o_orderkey", "o_totalprice")
          .orderBy("o_custkey", "o_orderkey"),
      oracle = Some(
        """SELECT o_custkey, o_orderkey, o_totalprice FROM (
          |  SELECT o_custkey, o_orderkey, o_totalprice,
          |    row_number() OVER (PARTITION BY o_custkey
          |      ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
          |  FROM orders)
          |WHERE rn <= 3 ORDER BY o_custkey, o_orderkey""".stripMargin
      ),
      doc = "per-group top-k via the custom TopKPerKeyExec operator " +
        "(LogicalPlan+Strategy+SparkPlan, O(n log k) heap vs full sort)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_o4_sequence_numbers",
      covers = "O4,P6",
      fn = (s, dir) => {
        val w = Window
          .partitionBy("l_orderkey")
          .orderBy(col("l_shipdate").asc, col("l_linenumber").asc)
        table(s, dir, "lineitem")
          .withColumn("seg_idx", (row_number().over(w) - 1).cast("long"))
          .withColumn("seg_name", format_string("%08d", col("seg_idx")))
          .select("l_orderkey", "l_linenumber", "seg_idx", "seg_name")
          .orderBy("l_orderkey", "seg_idx")
      },
      oracle = Some(
        """SELECT l_orderkey, l_linenumber,
          |  CAST(row_number() OVER (PARTITION BY l_orderkey
          |    ORDER BY l_shipdate ASC, l_linenumber ASC) AS BIGINT) - 1 AS seg_idx,
          |  printf('%08d', row_number() OVER (PARTITION BY l_orderkey
          |    ORDER BY l_shipdate ASC, l_linenumber ASC) - 1) AS seg_name
          |FROM lineitem ORDER BY l_orderkey, seg_idx""".stripMargin
      ),
      doc = "zero-padded per-group sequence numbering (audio_vad.py:53-60)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_o5_fixed_batching",
      covers = "O5,S6",
      fn = (s, dir) => {
        // 50-ids-per-API-call batching key. Positional batching needs a
        // global order — r14: via GlobalSeq (range exchange +
        // shuffle-reused zipWithIndex), never the single-reducer
        // Window.orderBy the old formulation paid; the per-batch
        // rollup keeps the output tiny. At cluster scale the same op
        // also runs per-partition (connector-side grouped(50)).
        graft.ops.GlobalSeq
          .withGlobalSeq(table(s, dir, "events").select("event_id"),
            Seq(col("event_id").asc), "__seq")
          .withColumn("batch_id", ((col("__seq") - 1L) / 50L).cast("long"))
          .groupBy("batch_id")
          .agg(
            count(lit(1)).as("n"),
            min(col("event_id")).as("first_id"),
            max(col("event_id")).as("last_id")
          )
          .orderBy("batch_id")
      },
      oracle = Some(
        """WITH b AS (SELECT event_id,
          |    CAST((row_number() OVER (ORDER BY event_id ASC) - 1) // 50 AS BIGINT) AS batch_id
          |  FROM events)
          |SELECT batch_id, count(*) AS n, min(event_id) AS first_id,
          |       max(event_id) AS last_id
          |FROM b GROUP BY batch_id ORDER BY batch_id""".stripMargin
      ),
      doc = "fixed-size API batching key (starngage_crawler c4)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_o6_scan_until",
      covers = "O6,T4",
      fn = (s, dir) => {
        // scan-until-duration-target: keep rows while the PRECEDING
        // cumulative total is under target. Decimal running sum keeps
        // the comparison exact on both engines.
        val w = Window
          .partitionBy("o_custkey")
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
        table(s, dir, "orders")
          .withColumn(
            "spent_before",
            coalesce(
              sum(col("o_totalprice").cast(DecimalType(28, 6))).over(w),
              lit(0).cast(DecimalType(28, 6))
            )
          )
          .filter(col("spent_before") < 300000L)
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            col("spent_before").cast(DoubleType).as("spent_before")
          )
          .orderBy("o_custkey", "o_orderkey")
      },
      oracle = Some(
        """SELECT o_custkey, o_orderkey, CAST(spent_before AS DOUBLE) AS spent_before
          |FROM (
          |  SELECT o_custkey, o_orderkey,
          |    coalesce(sum(CAST(o_totalprice AS DECIMAL(28,6))) OVER (
          |      PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          |      CAST(0 AS DECIMAL(28,6))) AS spent_before
          |  FROM orders)
          |WHERE spent_before < 300000 ORDER BY o_custkey, o_orderkey""".stripMargin
      ),
      doc = "running-sum scan-until threshold, the one true window-frame " +
        "op (data_pipeline.py:572,589-598)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_t1_windowed_rollup",
      covers = "T1,A6",
      fn = (s, dir) =>
        // event-time tumbling-window rollup: the batch formulation of the
        // incremental publish cadence; streaming variant lives in
        // graft.streaming (same groupBy(window) shape + watermark).
        table(s, dir, "events")
          .withColumn("hour", date_trunc("hour", graft.core.Graft.tsCol(col("ts"))))
          .groupBy("hour", "event_type")
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
          .orderBy("hour", "event_type"),
      oracle = Some(
        """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
          |  CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total
          |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin
      ),
      doc = "event-time tumbling rollup — batch face of the T1 incremental " +
        "publish (data_pipeline.py:682-696)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_o7_sessionize",
      covers = "O6,T1,D3",
      fn = (s, dir) => {
        // gap-based sessionization: new session when >1h since the
        // previous event. Raw nanosecond longs keep the gap arithmetic
        // integer-exact on both engines.
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val cum = w.rowsBetween(Window.unboundedPreceding, 0)
        table(s, dir, "events")
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn(
            "new_sess",
            when(
              col("prev_ts").isNull ||
                col("ts") - col("prev_ts") >= 3600L * 1000000000L,
              1L
            ).otherwise(0L)
          )
          .withColumn("session_id", sum(col("new_sess")).over(cum))
          .groupBy("user_id", "session_id")
          .agg(
            count(lit(1)).as("n_events"),
            min(col("event_id")).as("first_event"),
            max(col("event_id")).as("last_event"),
            expr("(max(ts) - min(ts)) div 1000000000").as("dur_s")
          )
          .orderBy("user_id", "session_id")
      },
      oracle = Some(
        """WITH x AS (SELECT user_id, event_id, epoch_ns(ts) AS tns FROM events),
          |f AS (SELECT *, CASE WHEN lag(tns) OVER w IS NULL
          |        OR tns - lag(tns) OVER w >= 3600000000000 THEN 1 ELSE 0 END AS new_sess
          |      FROM x WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
          |s AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
          |        ORDER BY tns, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
          |      FROM f)
          |SELECT user_id, session_id, count(*) AS n_events,
          |       min(event_id) AS first_event, max(event_id) AS last_event,
          |       CAST((max(tns) - min(tns)) // 1000000000 AS BIGINT) AS dur_s
          |FROM s GROUP BY user_id, session_id
          |ORDER BY user_id, session_id""".stripMargin
      ),
      doc = "gap-based sessionization via lag + running sum — the batch " +
        "face of session windows"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_o7_session_window_native",
      covers = "O6,T1",
      fn = (s, dir) => {
        // Spark's built-in session_window — the same sessions as
        // q_o7_sessionize's hand-rolled gaps-and-islands, but as the
        // native streaming-capable operator (one shuffle on the group
        // key, sessions merged by the SessionWindow node; in streaming
        // this is the stateful session operator with watermark expiry).
        // ts is micros-lossless (Graft.tsCol), so window bounds replay
        // exactly: start = min event time, end = max event time + gap.
        val ev = table(s, dir, "events")
          .withColumn("tts", graft.core.Graft.tsCol(col("ts")))
        ev.groupBy(col("user_id"),
            session_window(col("tts"), "1 hour").as("sw"))
          .agg(
            count(lit(1)).as("n_events"),
            min(col("event_id")).as("first_event"),
            max(col("event_id")).as("last_event"))
          .select(col("user_id"),
            unix_micros(col("sw.start")).as("start_us"),
            unix_micros(col("sw.end")).as("end_us"),
            col("n_events"), col("first_event"), col("last_event"))
          .orderBy("user_id", "start_us")
      },
      oracle = Some(
        """WITH x AS (SELECT user_id, event_id,
          |        epoch_ns(ts) // 1000 AS tus FROM events),
          |f AS (SELECT *, CASE WHEN lag(tus) OVER w IS NULL
          |        OR tus - lag(tus) OVER w >= 3600000000 THEN 1 ELSE 0 END
          |        AS new_sess
          |      FROM x WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)),
          |s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id
          |        ORDER BY tus, event_id ROWS UNBOUNDED PRECEDING) AS sid
          |      FROM f)
          |SELECT user_id, CAST(min(tus) AS BIGINT) AS start_us,
          |       CAST(max(tus) + 3600000000 AS BIGINT) AS end_us,
          |       CAST(count(*) AS BIGINT) AS n_events,
          |       min(event_id) AS first_event, max(event_id) AS last_event
          |FROM s GROUP BY user_id, sid
          |ORDER BY user_id, start_us""".stripMargin
      ),
      doc = "native session_window operator (streaming-capable session " +
        "semantics) checked against the independent gaps-and-islands " +
        "formulation: merge-while-gap<1h, window end = last event + gap"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_flagship_quality_join",
      covers = "S1,S2,U1,D1,F1,A1,A2,J1,O1,O2,P1",
      fn = (s, dir) => flagship(s, dir),
      oracle = Some(
        s"""WITH chan AS (
           |  SELECT DISTINCT c_custkey, c_name, c_mktsegment,
           |         (c_custkey * 9973) % 250000 AS n_subs
           |  FROM customer WHERE (c_custkey * 9973) % 250000 > 10000),
           |qual AS (
           |  SELECT user_id,
           |    count(CASE WHEN value > 20.0 THEN 1 END) AS n_snr_ok,
           |    count(CASE WHEN value > 100.0 THEN 1 END) AS n_ac_ok
           |  FROM events GROUP BY user_id),
           |scored AS (
           |  SELECT user_id, n_snr_ok, n_ac_ok,
           |    CAST(n_snr_ok AS DOUBLE) / CAST(max(n_snr_ok) OVER () AS DOUBLE)
           |      + CAST(n_ac_ok AS DOUBLE) / CAST(max(n_ac_ok) OVER () AS DOUBLE) AS score
           |  FROM qual)
           |SELECT c.c_custkey, c.c_name, c.c_mktsegment, c.n_subs,
           |       s.n_snr_ok, s.n_ac_ok, s.score
           |FROM chan c JOIN scored s ON c.c_custkey = s.user_id
           |ORDER BY s.score DESC, c.c_custkey ASC LIMIT 20""".stripMargin
      ),
      doc = "slice-0 flagship: the full catalog-curation chain of " +
        "yt_channel_list_quality_merge.ipynb (SURVEY §3.3b)"
    )
  )

  /** The flagship chain: union→dedup→filter→array-stats→minmax-score→
    * join→sort→limit (SURVEY §7.2 slice 0). Quality side aggregates to
    * 150 rows before the join → Spark broadcasts it automatically.
    */
  def flagship(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val chan = table(s, dir, "customer")
      .select("c_custkey", "c_name", "c_mktsegment")
      .withColumn("n_subs", expr("(c_custkey * 9973) % 250000"))
      .dropDuplicates()
      .filter(col("n_subs") > 10000L)
    val qual = table(s, dir, "events")
      .groupBy("user_id")
      .agg(
        count(when(col("value") > 20.0d, 1)).as("n_snr_ok"),
        count(when(col("value") > 100.0d, 1)).as("n_ac_ok")
      )
    val maxes = qual.agg(
      max(col("n_snr_ok")).as("mx_snr"),
      max(col("n_ac_ok")).as("mx_ac")
    )
    val scored = qual
      .crossJoin(broadcast(maxes))
      .withColumn(
        "score",
        col("n_snr_ok").cast("double") / col("mx_snr").cast("double") +
          col("n_ac_ok").cast("double") / col("mx_ac").cast("double")
      )
    chan
      .join(scored, chan("c_custkey") === scored("user_id"), "inner")
      .select(
        chan("c_custkey"),
        col("c_name"),
        col("c_mktsegment"),
        col("n_subs"),
        col("n_snr_ok"),
        col("n_ac_ok"),
        col("score")
      )
      .orderBy(col("score").desc, col("c_custkey").asc)
      .limit(20)
  }
}
