package graft.tools

import graft.core.Graft
import graft.plans.{ArrayOps, TopKPerKey}
import graft.similarity.Ann
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Micro-benchmarks backing SCALE.md's claims: custom paths vs the
  * stock formulations, on sf0.1. Prints min-of-3 wall times.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session("graft-microbench")
    spark.sparkContext.setLogLevel("ERROR")

    def best(f: => Long): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    val orders = Graft.table(spark, dir, "orders").cache()
    orders.count() // materialize

    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val tWindow = best(
      orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).count())
    val tTopK = best(
      TopKPerKey.topKPerKey(orders, Seq(col("o_custkey")),
        Seq(col("o_orderdate").asc, col("o_orderkey").asc), 3).count())
    println(f"[microbench] per-key top-3 on ${orders.count()} orders: " +
      f"window=$tWindow%.3fs topKPerKey=$tTopK%.3fs (${tWindow / tTopK}%.2fx)")

    val emb = Graft.table(spark, dir, "embeddings").cache()
    emb.count()
    val probes = emb.filter(col("vec_id") < 16L)
      .select(col("vec_id").as("probe_id"), col("embedding").as("va"))
    def pairScan(cosFn: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column) =
      emb.crossJoin(broadcast(probes))
        .select(sum(cosFn(col("va"), col("embedding"))).as("s"))
        .count()
    val tHof = best(pairScan(Ann.cosineHof))
    val tNative = best(pairScan(Ann.cosineFast))
    println(f"[microbench] ${emb.count()}x16 cosine scan: " +
      f"HOF=$tHof%.3fs nativeExpr=$tNative%.3fs (${tHof / tNative}%.2fx)")

    spark.stop()
  }
}
