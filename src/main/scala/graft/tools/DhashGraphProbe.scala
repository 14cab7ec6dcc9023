package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage probe for the image-dedup graph at a given SF, kept in sync
  * with q_mm_dhash_clusters' PRODUCTION shape (FixtureCache payload
  * corpus → decode+dHash → clusterizeHamming64). Splits the wall into
  * (a) scan+decode+fingerprint, (b) distinct-print count, (c) the
  * exact-group-collapsed clustering — so a decade-ratio regression can
  * be attributed: (a) is per-row and should scale linearly with
  * images; (b)/(c) are bounded by the striped fixture's FINITE
  * fingerprint space (patterns cycle every 7392 groups).
  *
  * Earlier vintage of this file diagnosed the sf0.1 label-propagation
  * lineage blowup (see connectedComponentsDistributed's
  * localCheckpoint note).
  *
  *   sbt "runMain graft.tools.DhashGraphProbe testdata/sf10"
  */
object DhashGraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet(
      graft.queries.PerceptualQueries.payloadFixture(spark, dir))
    val t0 = System.nanoTime
    val fps = graft.multimodal.PerceptualHash
      .imageHashes(d, "doc_id", "payload").cache()
    val nImg = fps.count()
    val tFp = (System.nanoTime - t0) / 1e9
    val nPrints = fps.select("phash").distinct().count()
    val t1 = System.nanoTime
    val cl = graft.dedup.Dedup
      .clusterizeHamming64(fps, "doc_id", "phash", maxHamming = 7)
    val m = cl.count()
    val tCl = (System.nanoTime - t1) / 1e9
    println(f"[dhashprobe] dir=$dir images=$nImg prints=$nPrints " +
      f"decode+hash=$tFp%.1f s cluster_rows=$m cluster=$tCl%.1f s")
    cl.unpersist()
    fps.unpersist()
    spark.stop()
  }
}
