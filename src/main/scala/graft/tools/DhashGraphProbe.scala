package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A-B probe for the image-dedup pair graph at a given SF: pair count,
  * clusterize tier taken, wall per stage. Written while diagnosing the
  * sf0.1 bench wedge (label-propagation lineage blowup — see
  * Dedup.connectedComponentsDistributed's localCheckpoint note).
  */
object DhashGraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stripePngUdf =
      udf { (id: Long) => graft.multimodal.PerceptualHash.fixtureStripePng(id) }
    val d = graft.core.Graft.table(spark, dir, "documents")
      .select(col("doc_id")).withColumn("payload", stripePngUdf(col("doc_id")))
    val t0 = System.nanoTime
    val pairs = graft.multimodal.PerceptualHash
      .nearDupImagePairs(d, "doc_id", "payload", maxHamming = 7)
    val n = pairs.count()
    println(f"PAIRS=$n in ${(System.nanoTime - t0) / 1e9}%.1fs")
    val t1 = System.nanoTime
    val cl = graft.dedup.Dedup.clusterize(pairs, "doc_id")
    val m = cl.count()
    println(f"CLUSTER_ROWS=$m in ${(System.nanoTime - t1) / 1e9}%.1fs")
    spark.stop()
  }
}
