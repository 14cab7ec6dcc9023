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
    )
  )
}
