package graft.tools
import graft.core.Graft
object IsoBench {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = Graft.session("iso")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000L).selectExpr("sum(id)").collect()
    for (name <- args) {
      val times = (1 to 3).map { _ =>
        // cold-cache, warm-JIT: the driver bench never sees a prior
        // identical plan, so cross-invocation CacheManager hits here
        // would flatter the number
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.queries.Registry.byName(name).fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[iso] $name min=${times.min}%.2f times=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
