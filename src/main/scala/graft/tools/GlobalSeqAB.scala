package graft.tools

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** A/B: native GlobalSeqExec (InternalRow append) vs the r14
  * `rdd.zipWithIndex + createDataFrame` formulation (external Row
  * round-trip), on a wide-ish row (id + 2 longs + a string payload)
  * so the encoder cost the native exec removes is visible.
  */
object GlobalSeqAB {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 5000000L
    val spark = graft.core.Graft.session("globalseq-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def input(): DataFrame = spark.range(0L, rows)
      .select(col("id"),
        pmod(hash(col("id")), lit(9973L)).as("k"),
        (col("id") * 31L % 1000003L).as("v"),
        concat(lit("payload-"), col("id") % 1000L).as("s"))

    def oldForm(df: DataFrame): DataFrame = {
      val sorted = df
        .repartitionByRange(col("k").asc, col("id").asc)
        .sortWithinPartitions(col("k").asc, col("id").asc)
      val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (i + 1L))
      }
      spark.createDataFrame(indexed, sorted.schema.add("seq", LongType))
    }

    def newForm(df: DataFrame): DataFrame =
      graft.ops.GlobalSeq.withGlobalSeq(
        df, Seq(col("k").asc, col("id").asc), "seq")

    def time(label: String)(f: => DataFrame): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val r = f.agg(sum(col("seq") * col("v"))).head().getLong(0)
        ((System.nanoTime() - t0) / 1e9, r)
      }
      println(f"[gseq-ab] $label rows=$rows min=${runs.map(_._1).min}%.2f " +
        f"runs=${runs.map(r => f"${r._1}%.2f").mkString(",")} sum=${runs.head._2}")
    }

    time("old_rdd_zip")(oldForm(input()))
    time("native_exec")(newForm(input()))
    time("old_rdd_zip2")(oldForm(input()))
    time("native_exec2")(newForm(input()))
    spark.stop()
  }
}
