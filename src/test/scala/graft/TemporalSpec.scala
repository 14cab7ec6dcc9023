package graft

import graft.ops.Temporal
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._

/** As-of join: merge-scan vs window-formulation parity, deterministic
  * tie handling, null semantics, and the plan-shape guarantee that the
  * merge-scan path materializes no (left × earlier-right) pairs.
  */
class TemporalSpec extends SparkTestBase {
  import spark.implicits._

  private def leftDf = Seq(
    // (order_id, key, t)
    (1L, "a", 100L),
    (2L, "a", 250L),
    (3L, "b", 50L),   // before any b event → no match
    (4L, "b", 300L),
    (5L, "c", 100L),  // key with no right rows at all
    (6L, null.asInstanceOf[String], 100L) // null key → no match
  ).toDF("order_id", "k", "t")

  private def rightDf = Seq(
    (10L, "a", 100L), // ties order 1's timestamp exactly → eligible
    (11L, "a", 200L),
    (12L, "a", 200L), // tie on t=200: higher event_id must win
    (13L, "b", 60L),
    (14L, null.asInstanceOf[String], 10L) // null key: never matches
  ).toDF("event_id", "k", "rt")

  private def mergeScan =
    Temporal.asOfJoinMergeScan(leftDf, rightDf, "k", "t", "rt",
      rightCols = Seq("event_id"), rightTieBreak = Seq("event_id"))

  test("merge-scan semantics: latest-at-or-before, tie by max tiebreak, nulls unmatched") {
    val got = mergeScan
      .select(col("order_id"), col("asof_time"), col("asof.event_id"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 100L, 10L),  // rt == t is eligible
      (2L, 200L, 12L),  // tie on 200 → max event_id 12
      (3L, -1L, -1L),   // before first b event
      (4L, 60L, 13L),
      (5L, -1L, -1L),   // no right rows for key c
      (6L, -1L, -1L)    // null key
    ))
  }

  test("merge-scan matches the window formulation on the real events table") {
    val dir = "/root/testdata/sf0.001"
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_custkey") < 50L)
      .withColumn("ons", expr("unix_millis(cast(o_orderdate as timestamp))") * 1000000L)
      .select("o_orderkey", "o_custkey", "ons")
    val e = graft.core.Graft.table(spark, dir, "events")
      .select(col("user_id").as("o_custkey"), col("event_id"), col("ts"))
    val ms = Temporal.asOfJoinMergeScan(o, e, "o_custkey", "ons", "ts",
      rightCols = Seq("event_id"), rightTieBreak = Seq("event_id"))
      .select(col("o_orderkey"), col("asof_time"))
    val win = Temporal.asOfJoin(o, e, "o_custkey", "ons", "ts", "o_orderkey",
      rightCols = Seq("event_id"))
      .select(col("o_orderkey"), col("asof_time").as("asof_time_w"))
    // compare on asof_time (the window impl's tie pick is arbitrary, so
    // event_id may legitimately differ on ties; the matched TIME cannot)
    val joined = ms.join(win, "o_orderkey")
    assert(joined.count() == o.count())
    val diff = joined.filter(
      (col("asof_time").isNull =!= col("asof_time_w").isNull) ||
        (col("asof_time").isNotNull && col("asof_time") =!= col("asof_time_w"))).count()
    assert(diff == 0L)
  }

  test("merge-scan plan contains NO join operator (no pair materialization)") {
    val plan = mergeScan.queryExecution.executedPlan
    val joins = plan.collectWithSubqueries { case j: BaseJoinExec => j }
    assert(joins.isEmpty, s"unexpected join operators: ${joins.map(_.nodeName)}")
    // exactly one exchange: the repartition-by-key both sides share
    val s = plan.toString
    assert(!s.contains("CartesianProduct"))
  }

  test("profile: nulls, exact distincts, native-order min/max, one row per column") {
    val d = Seq(
      (Option(1L), Option("b")),
      (Option(2L), None),
      (Option.empty[Long], Option("a")),
      (Option(10L), Option("a"))
    ).toDF("k", "s")
    val p = graft.ops.Profile.profile(d, Seq("k", "s"))
      .orderBy("col_name").collect()
    assert(p.length == 2)
    val k = p(0); val s = p(1)
    assert(k.getString(0) == "k" && s.getString(0) == "s")
    assert(k.getLong(1) == 4L && k.getLong(2) == 1L && k.getLong(3) == 3L)
    // native numeric order: max is "10", not the lexicographic "2"
    assert(k.getString(4) == "1" && k.getString(5) == "10")
    assert(s.getLong(2) == 1L && s.getLong(3) == 2L)
    assert(s.getString(4) == "a" && s.getString(5) == "b")
  }
}
