package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state measurement: absorb JVM/JIT/codegen/session warmup
    // outside the timed loop. Each query's physical plan compiles to
    // generated code the first time it runs, so the warmup executes
    // every registered query once at the smallest available scale
    // factor (sibling sf0.001 of sfDir when present, else sfDir
    // itself) — the timed loop then measures execution, not compiler
    // activity. Warmup failures are reported, never silently ignored.
    val warmDir = {
      val sibling = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sibling.isDirectory) sibling.getPath else sfDir
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try { fn(spark, warmDir).count() } catch {
        case e: Throwable => System.err.println(s"[bench-warmup] $name: ${e.getMessage}")
      }
    }
    // Each timed query starts cold-cache: queries cache internal
    // relations (funnel stages, self-join sides) and CacheManager
    // matches canonicalized plans across invocations — without the
    // clear, later queries would partly measure cache reads.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Driver captures a bounded tail of stdout: keep the JSON line
    // compact (ms precision) and make it the LAST stdout line (after
    // spark.stop()) so it survives the tail window intact and parses.
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    spark.stop()
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
  }
}
