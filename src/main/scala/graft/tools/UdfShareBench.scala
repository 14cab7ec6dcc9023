package graft.tools
import graft.core.Graft
import org.apache.spark.sql.functions._

/** Evidence harness for the "promote shingle/minhash UDFs to codegen
  * expressions" decision (NOTES round 6): stage-level min-of-3 timings
  * that separate (a) the parquet scan, (b) the UDF *boundary* cost (a
  * no-op String UDF — the ser/de a native expression would remove),
  * and (c) the real shingle/minhash compute, against the full query
  * times from IsoBench. If (b) is a small slice of the query, an
  * Expression rewrite cannot reach the 1.3x bar and the UDFs stay.
  */
object UdfShareBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session("udfshare")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000L).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[udfshare] $label min=${ts.min}%.3f times=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val noopUdf = udf { (s: String) => if (s == null) 0 else s.length }
    time("scan_native_length") {
      docs.select(sum(length(col("text")))).collect()
    }
    time("scan_noop_string_udf") {
      docs.select(sum(noopUdf(col("text")))).collect()
    }
    time("shingle_udf") {
      docs.select(sum(size(
        graft.dedup.Dedup.shingleHashesUdf(3)(col("text"))))).collect()
    }
    time("shingle_plus_minhash_udf") {
      val xs = graft.dedup.Dedup.shingleHashesUdf(3)(col("text"))
      docs.select(sum(size(
        graft.dedup.Dedup.minHashSigUdf(32)(xs)))).collect()
    }
    spark.stop()
  }
}
