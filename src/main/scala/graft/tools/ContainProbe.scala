package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off A/B probe: containmentPairs wall at a given
  * spark.sql.shuffle.partitions (env SHUF), isolating whether the
  * sf10 superlinearity is aggregation-width starvation (32-partition
  * spill) rather than candidate growth. Usage:
  *   SHUF=128 sbt "runMain graft.tools.ContainProbe testdata/sf10"
  */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val shuf = sys.env.getOrElse("SHUF", "32")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
    // warm codegen once at tiny scale
    graft.dedup.Dedup.containmentPairs(
      graft.core.Graft.table(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", 3, 0.8, Long.MaxValue).unpersist()
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    // stage 1: shingle arrays (cached, same as the operator)
    val ds = docs
      .select(col("doc_id"), graft.dedup.Dedup.shingleHashesUdf(3)(col("text")).as("xs"))
      .filter(size(col("xs")) > 0)
      .cache()
    val nd = ds.count()
    val t1 = System.nanoTime()
    val prefixUdf = udf { (xs: Seq[Long]) =>
      val s = xs.length
      val minOverlap = math.max(1, math.ceil(0.8 * s - 1e-9).toInt)
      xs.take(s - minOverlap + 1)
    }
    val withSz = ds.withColumn("sz", size(col("xs")).cast("long"))
    val pa0 = withSz.select(col("doc_id").as("a"), col("sz").as("sa"),
      posexplode(prefixUdf(col("xs"))).as(Seq("pa", "shingle")))
    val pb0 = withSz.select(col("doc_id").as("b"), col("sz").as("sb"),
      posexplode(col("xs")).as(Seq("pb", "shingle_b")))
    // stage 2: raw join volume
    val joined = pa0.join(pb0,
      col("shingle") === col("shingle_b") && col("a") =!= col("b") &&
        col("sb").cast("double") >= lit(0.8) * col("sa").cast("double") - lit(1e-9) &&
        (col("sb") - col("pb")).cast("double") >=
          lit(0.8) * col("sa").cast("double") - lit(1e-9))
    val nj = joined.count()
    val t2 = System.nanoTime()
    // stage 3: pair aggregation
    val cand = joined.groupBy("a", "b")
      .agg(min("pa").as("pa"), min("pb").as("pb"),
        min("sa").as("sa"), min("sb").as("sb"))
      .filter(
        (lit(1L) + least(col("sa") - col("pa") - 1L,
          col("sb") - col("pb") - 1L)).cast("double") >=
          lit(0.8) * col("sa").cast("double") - lit(1e-9))
      .select("a", "b")
    val nc = cand.count()
    val t3 = System.nanoTime()
    println(f"[containprobe] shuf=$shuf docs=$nd shingle=${(t1 - t0) / 1e9}%.1f " +
      f"joinrows=$nj join=${(t2 - t1) / 1e9}%.1f cand=$nc agg=${(t3 - t2) / 1e9}%.1f s")
    spark.stop()
  }
}
