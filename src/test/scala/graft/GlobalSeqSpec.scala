package graft

import graft.ops.GlobalSeq
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalSeq: the distributed global row number (range exchange +
  * shuffle-reused zipWithIndex) must equal `row_number() OVER
  * (ORDER BY ...)` exactly, and the faces that moved onto it must
  * have shed their single-reducer global WindowExec.
  */
class GlobalSeqSpec extends SparkTestBase {
  import spark.implicits._

  test("withGlobalSeq equals row_number over the same total order, " +
    "across many partitions and skewed input layout") {
    val df = spark.range(0L, 10000L)
      .select(col("id"),
        (pmod(hash(col("id")), lit(997L))).as("k"))
      .repartition(17) // scrambled input layout
    val got = GlobalSeq
      .withGlobalSeq(df, Seq(col("k").asc, col("id").asc), "seq")
      .select("id", "seq")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ref = df
      .withColumn("seq",
        row_number().over(Window.orderBy(col("k").asc, col("id").asc))
          .cast("long"))
      .select("id", "seq")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == ref)
    assert(got.values.min == 1L && got.values.max == 10000L)
  }

  test("ntileCol / ntileOf equal SQL ntile for uneven n % k") {
    for (n <- Seq(1L, 3L, 7L, 100L, 101L, 103L); k <- Seq(1, 4, 7)) {
      val df = spark.range(1L, n + 1L).select(col("id").as("r"))
      val ref = df
        .withColumn("t", ntile(k).over(Window.orderBy(col("r").asc))
          .cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gotCol = df.withColumn("t", GlobalSeq.ntileCol(col("r"), n, k))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotCol == ref, s"ntileCol n=$n k=$k")
      (1L to n).foreach { r =>
        assert(GlobalSeq.ntileOf(r, n, k) == ref(r), s"ntileOf($r,$n,$k)")
      }
    }
  }

  test("the rewritten faces carry no corpus-sized global window: " +
    "curriculum/o5 have NO WindowExec, zipf ranks via top-k heap") {
    val dir = "/root/testdata/sf0.001"
    def planOf(q: String) = {
      val df = graft.queries.Registry.byName(q).fn(spark, dir)
      df.queryExecution.executedPlan.toString
    }
    val curr = planOf("q_curriculum_order")
    assert(!curr.contains("Window"), s"q_curriculum_order plan:\n$curr")
    val o5 = planOf("q_o5_fixed_batching")
    assert(!o5.contains("Window"), s"q_o5 plan:\n$o5")
    val zipf = planOf("q_text_zipf")
    assert(zipf.contains("TakeOrderedAndProject"),
      s"q_text_zipf should rank via top-k heap:\n$zipf")
  }
}
