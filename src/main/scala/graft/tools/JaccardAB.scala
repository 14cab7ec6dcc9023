package graft.tools

import graft.core.Graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch harness: stage-level timing of the ngram-Jaccard pair join. */
object JaccardAB {

  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[ab] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = Graft.session("jaccard-ab")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").cache()
    docs.count()
    spark.range(100000L).selectExpr("sum(id)").collect()

    for (round <- 1 to 2) {
      spark.catalog.clearCache()
      docs.cache(); docs.count()
      println(s"[ab] --- round $round")
      val toks = split(col("text"), " ")
      val shArr = when(
        size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws(" ", slice(toks, i, lit(3))))
      ).otherwise(array().cast("array<string>"))
      val ex = docs.select(col("doc_id"), array_distinct(shArr).as("xs"))
        .select(col("doc_id"), size(col("xs")).cast("long").as("n_sh"),
          explode(col("xs")).as("shingle"))
      val exOnly = time("explode-count") { ex.count() }
      val rare = ex.withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
        .filter(col("df") <= 1000L).drop("df").cache()
      time("rare-cache-count") { rare.count() }
      val a = rare.select(col("doc_id").as("a"), col("n_sh").as("n_a"), col("shingle"))
      val b = rare.select(col("doc_id").as("b"), col("n_sh").as("n_b"), col("shingle"))
      val joined = a.join(b, Seq("shingle")).filter(col("a") < col("b"))
      time("join-count") { joined.count() }
      val agged = joined.groupBy("a", "b", "n_a", "n_b").agg(count(lit(1)).as("n_common"))
        .withColumn("jaccard", col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
        .filter(col("jaccard") >= 0.8)
      time("agg-count") { agged.count() }
      rare.unpersist()
    }
    spark.stop()
  }
}
