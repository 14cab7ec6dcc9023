package graft.queries

import graft.core.Graft.table
import org.apache.spark.sql.functions._

/** OLAP aggregation breadth: multi-level rollup and pivot (the skew
  * join family already lives in q_j7/q_j8 — ops.Skew). All
  * integer-exact (quantity sums go through floor→BIGINT; counts are
  * BIGINT on both engines).
  */
object OlapQueries {

  val defs: Seq[QueryDef] = Seq(
    // ----------------------------------------------------------------
    QueryDef(
      "q_agg_rollup",
      covers = "A6,rollup,grouping-sets",
      fn = (s, dir) =>
        table(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            count(lit(1)).as("n"),
            sum(floor(col("l_quantity")).cast("long")).as("sum_qty"),
            countDistinct(col("l_orderkey")).as("n_orders"))
          // rollup's ALL level arrives as null — label it so the output
          // carries no engine-specific null semantics
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
            coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
            col("n"), col("sum_qty"), col("n_orders"))
          .orderBy("rf", "ls"),
      oracle = Some(
        """SELECT coalesce(l_returnflag, 'ALL') AS rf,
          |       coalesce(l_linestatus, 'ALL') AS ls,
          |       CAST(count(*) AS BIGINT) AS n,
          |       CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
          |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          |FROM lineitem
          |GROUP BY ROLLUP (l_returnflag, l_linestatus)
          |ORDER BY rf, ls""".stripMargin),
      doc = "multi-level ROLLUP aggregation (flag × status × grand " +
        "total in ONE pass — Spark plans the Expand operator, one " +
        "shuffle for all grouping sets instead of one job per level); " +
        "quantity sums floor→BIGINT so every cell is integer-exact"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_agg_pivot",
      covers = "A6,pivot",
      fn = (s, dir) =>
        table(s, dir, "documents")
          .groupBy(col("source"))
          .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy("source"),
      oracle = Some(
        """SELECT source,
          |  CAST(SUM(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
          |  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
          |  CAST(SUM(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
          |  CAST(SUM(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
          |  CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh
          |FROM documents GROUP BY source ORDER BY source""".stripMargin),
      doc = "pivot (long → wide): per-source language distribution as " +
        "columns. Values are DECLARED (the five fixture languages) — " +
        "an undeclared pivot forces an extra distinct-values job and " +
        "an unbounded column fan-out, which a 100 TB pipeline never " +
        "wants; the declared form is one aggregation pass"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_event_funnel",
      covers = "funnel,O6,T4",
      fn = (s, dir) => {
        val ev = table(s, dir, "events")
          .select(col("user_id"), col("event_type"), col("ts"))
        def stage(prev: org.apache.spark.sql.DataFrame,
                  prevCol: String, step: String, out: String) =
          ev.filter(col("event_type") === step)
            .join(prev.select("user_id", prevCol), "user_id")
            .filter(col("ts") > col(prevCol))
            .groupBy("user_id").agg(min("ts").as(out))
        val t1 = ev.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min("ts").as("t1"))
        val t2 = stage(t1, "t1", "view", "t2")
        val t3 = stage(t2, "t2", "purchase", "t3")
        t1.join(t2, Seq("user_id"), "left")
          .join(t3, Seq("user_id"), "left")
          .select(col("user_id"), col("t1"), col("t2"), col("t3"),
            when(col("t3").isNotNull, 3L)
              .when(col("t2").isNotNull, 2L)
              .otherwise(1L).as("depth"))
          .orderBy("user_id")
      },
      oracle = Some(
        """WITH x AS (SELECT user_id, event_type, epoch_ns(ts) AS tns
          |           FROM events),
          |t1 AS (SELECT user_id, min(tns) AS t1 FROM x
          |       WHERE event_type = 'signup' GROUP BY user_id),
          |t2 AS (SELECT x.user_id, min(tns) AS t2
          |       FROM x JOIN t1 USING (user_id)
          |       WHERE event_type = 'view' AND tns > t1 GROUP BY x.user_id),
          |t3 AS (SELECT x.user_id, min(tns) AS t3
          |       FROM x JOIN t2 USING (user_id)
          |       WHERE event_type = 'purchase' AND tns > t2 GROUP BY x.user_id)
          |SELECT t1.user_id, t1.t1, t2.t2, t3.t3,
          |  CAST(CASE WHEN t3.t3 IS NOT NULL THEN 3
          |            WHEN t2.t2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT)
          |    AS depth
          |FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
          |ORDER BY user_id""".stripMargin),
      doc = "ordered 3-step event funnel (signup → later view → later " +
        "purchase) per user: the conditional-min cascade — each stage " +
        "is one user-keyed aggregation joined forward, so the whole " +
        "funnel is three shuffles on the user key regardless of event " +
        "volume; timestamps stay long epoch-nanos (no float, no " +
        "timezone) and every min is deterministic"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_event_retention",
      covers = "retention,cohort,A6",
      fn = (s, dir) => {
        val wk = expr("ts DIV 604800000000000").as("wk") // absolute week
        val ev = table(s, dir, "events").select(col("user_id"), wk)
        val cohort = ev.groupBy("user_id").agg(min("wk").as("cw"))
        ev.distinct()
          .join(cohort, "user_id")
          .groupBy("cw", "wk")
          .agg(countDistinct("user_id").as("n_users"))
          .select(col("cw"), col("wk"), (col("wk") - col("cw")).as("week_offset"),
            col("n_users"))
          .orderBy("cw", "wk")
      },
      oracle = Some(
        """WITH x AS (SELECT user_id, epoch_ns(ts) // 604800000000000 AS wk
          |           FROM events),
          |c AS (SELECT user_id, min(wk) AS cw FROM x GROUP BY user_id),
          |a AS (SELECT DISTINCT user_id, wk FROM x)
          |SELECT c.cw, a.wk, a.wk - c.cw AS week_offset,
          |  CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
          |FROM a JOIN c USING (user_id)
          |GROUP BY c.cw, a.wk ORDER BY c.cw, a.wk""".stripMargin),
      doc = "cohort retention matrix: users bucketed by first-activity " +
        "week, counted per (cohort, activity week). Weeks are integer " +
        "floor-divisions of epoch-nanos (absolute week index — no " +
        "calendar library, no timezone); the per-user distinct " +
        "pre-aggregation shrinks events to user×week BEFORE the " +
        "cohort join, so the matrix costs two keyed shuffles"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_schema_evolution",
      covers = "schema-evolution,S1,U1",
      fn = (s, dir) => {
        val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
        val path = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft_schevo_$key").getPath
        val o = table(s, dir, "orders")
        // two ingest generations: batch b=1 predates the priority
        // column, batch b=2 carries it — the standard live-pipeline
        // schema widening
        o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
          .write.mode("overwrite").parquet(s"$path/b=1")
        o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"),
            col("o_orderpriority").as("pr"))
          .write.mode("overwrite").parquet(s"$path/b=2")
        s.read.option("mergeSchema", "true").parquet(path)
          .groupBy(coalesce(col("pr"), lit("MISSING")).as("pr"))
          .agg(count(lit(1)).as("n"),
            sum(floor(col("p")).cast("long")).as("sum_pf"),
            min("k").as("min_k"))
          .orderBy("pr")
      },
      oracle = Some(
        """SELECT CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority
          |            ELSE 'MISSING' END AS pr,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(SUM(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_pf,
          |  min(o_orderkey) AS min_k
          |FROM orders GROUP BY 1 ORDER BY pr""".stripMargin),
      doc = "schema evolution on read: two parquet generations (one " +
        "written before a column existed) scan as ONE relation via " +
        "mergeSchema — the old generation surfaces the new column as " +
        "null, no rewrite of historical data; the standard widening " +
        "path for a corpus that gains metadata columns mid-life. " +
        "Footer-only schema merge, no data pass"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_layout_incremental_rollup",
      covers = "incremental-rollup,A6,T2",
      fn = (s, dir) => {
        val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
        val path = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft_incroll_$key").getPath
        // fresh build each run (two folds of disjoint halves = exactly
        // one full aggregation — rerunning cannot double-count)
        val fsPath = new org.apache.hadoop.fs.Path(path)
        val fs = fsPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(fsPath)) fs.delete(fsPath, true)
        val ev = graft.core.Graft.table(s, dir, "events")
          .select(col("event_type"), (col("user_id") % 10).as("ub"),
            col("event_id"), floor(col("value") * 1000).cast("long").as("vq"))
        def partial(half: org.apache.spark.sql.DataFrame) =
          half.groupBy("event_type", "ub")
            .agg(count(lit(1)).as("n"), sum("vq").as("sum_vq"))
        graft.layout.Layout.mergeRollup(s, path, Seq("event_type", "ub"),
          partial(ev.filter(col("event_id") % 2 === 0)))
        graft.layout.Layout.mergeRollup(s, path, Seq("event_type", "ub"),
          partial(ev.filter(col("event_id") % 2 === 1)))
        s.read.parquet(path).orderBy("event_type", "ub")
      },
      oracle = Some(
        """SELECT event_type, user_id % 10 AS ub,
          |  CAST(count(*) AS BIGINT) AS n,
          |  CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS sum_vq
          |FROM events GROUP BY event_type, user_id % 10
          |ORDER BY event_type, ub""".stripMargin),
      doc = "incremental materialized rollup: two delta batches fold " +
        "their PARTIAL aggregates into the stored rollup " +
        "(Layout.mergeRollup) and the result equals one full " +
        "aggregation — the algebraic-merge property that lets a " +
        "dashboard rollup refresh from deltas without ever re-reading " +
        "the fact table; each fold shuffles group-cardinality rows, " +
        "never event volume"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_window_range_frame",
      covers = "O6,window-range-frame",
      fn = (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts")
          .rangeBetween(-86400L * 1000000000L, 0L) // trailing 24 h
        graft.core.Graft.table(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"),
            floor(col("value") * 1000).cast("long").as("vq"))
          .select(col("user_id"), col("event_id"), col("ts"),
            sum("vq").over(w).as("trail_sum"),
            count(lit(1)).over(w).as("trail_n"))
          .filter(col("event_id") % 20 === 0)
          .orderBy("user_id", "ts", "event_id")
      },
      oracle = Some(
        """WITH x AS (SELECT user_id, event_id, epoch_ns(ts) AS tns,
          |    CAST(floor(value * 1000) AS BIGINT) AS vq FROM events),
          |w AS (SELECT user_id, event_id, tns AS ts,
          |    CAST(SUM(vq) OVER (PARTITION BY user_id ORDER BY tns
          |      RANGE BETWEEN 86400000000000 PRECEDING AND CURRENT ROW)
          |      AS BIGINT) AS trail_sum,
          |    CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY tns
          |      RANGE BETWEEN 86400000000000 PRECEDING AND CURRENT ROW)
          |      AS BIGINT) AS trail_n
          |  FROM x)
          |SELECT user_id, event_id, ts, trail_sum, trail_n
          |FROM w WHERE event_id % 20 = 0
          |ORDER BY user_id, ts, event_id""".stripMargin),
      doc = "event-time RANGE-frame window: trailing-24 h sum/count " +
        "per user over epoch-nanos longs (the moving-metric shape " +
        "behind rate limits and rolling dashboards); values quantize " +
        "through one IEEE multiply + floor so every frame sum is " +
        "integer-exact. One user-keyed sort window, no self-join " +
        "(the naive trailing-window formulation is an O(n²) range " +
        "self-join)"
    ),
    // ----------------------------------------------------------------
    QueryDef(
      "q_k_zstd_roundtrip",
      covers = "K1,codec",
      fn = (s, dir) => {
        val key = dir.replaceAll("[^A-Za-z0-9.]", "_")
        val path = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft_zstd_$key").getPath
        table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .write.mode("overwrite").option("compression", "zstd").parquet(path)
        val fsPath = new org.apache.hadoop.fs.Path(path)
        val fs = fsPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        val allZstd = fs.listStatus(fsPath)
          .filter(_.getPath.getName.startsWith("part-"))
          .forall(_.getPath.getName.endsWith(".zstd.parquet"))
        s.read.parquet(path)
          .agg(count(lit(1)).as("n"),
            sum(floor(col("l_quantity")).cast("long")).as("sum_qty"),
            countDistinct("l_orderkey").as("n_orders"))
          .withColumn("all_zstd", lit(allZstd))
      },
      oracle = Some(
        """SELECT CAST(count(*) AS BIGINT) AS n,
          |  CAST(SUM(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
          |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
          |  TRUE AS all_zstd
          |FROM lineitem""".stripMargin),
      doc = "zstd-compressed parquet round-trip (the archival-tier " +
        "codec choice beside the snappy default — ~2× smaller at " +
        "similar scan cost, the right trade for a corpus written once " +
        "and scanned occasionally); the face proves the codec actually " +
        "landed (every part file suffixed .zstd.parquet) and the data " +
        "survives bit-exact aggregation"
    )
  )
}
