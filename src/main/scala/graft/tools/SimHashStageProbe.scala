package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage decomposition of the simHashPairs wall (VERDICT r12 next #1):
  * per posture — (2 chunks, cap 512) = the r12 auto tier at sf10,
  * (2, uncapped) = the exact cover the cap replaced, (3, uncapped) =
  * the r13 ladder's sf10 tier — times the END-TO-END engine operator
  * first (the honest wall), then re-times the stages standalone:
  * banding(+cap window), raw band self-join volume, distinct+popcount
  * verify. Stage joins run with autoBroadcastJoinThreshold=-1: they
  * re-plan the engine's intermediates from a probe-side cache, whose
  * small static size estimate would otherwise pick a 6 GiB broadcast
  * build the engine plan never attempts.
  *
  * Usage: sbt "runMain graft.tools.SimHashStageProbe testdata/sf10"
  */
object SimHashStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
    val k = 7

    // shared stage: fingerprints (identical across postures)
    val t0 = System.nanoTime()
    val tokenful = docs.filter(
      coalesce(translate(col("text"), " ", ""), lit("")) =!= "")
    val fps = graft.dedup.Dedup.simHash(tokenful, "doc_id", "text").cache()
    val nDocs = fps.count()
    val tFp = (System.nanoTime() - t0) / 1e9
    val nPrints = fps.select("simhash").distinct().count()
    println(f"[simhashprobe] docs=$nDocs prints=$nPrints fp=$tFp%.2f s")

    for ((chunks, cap) <- Seq((3, None), (2, Some(512)), (2, None))) {
      // dead plans' broadcast/cache blocks are reaped only after a JVM
      // GC notices the weak refs (see Verify/ScaleBench)
      System.gc()
      // end-to-end engine wall at this posture (engine-planned)
      val t4 = System.nanoTime()
      val out = graft.dedup.Dedup.hammingPairs64(
        fps, "doc_id", "simhash", k, cap, chunks)
      val nOut = out.count()
      val tAll = (System.nanoTime() - t4) / 1e9
      out.unpersist()
      System.gc()

      // stage re-timings (diagnostic plans, broadcast disabled)
      val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val m = k + chunks
        val starts = (0 to m).map(i => i * 64 / m)
        def chunk(c: org.apache.spark.sql.Column, i: Int) = {
          val lo = starts(i)
          val w = starts(i + 1) - lo
          val mask = if (w >= 64) -1L else (1L << w) - 1
          shiftright(c, lo).bitwiseAND(mask)
        }
        val combos = (0 until m).combinations(chunks).map(_.toSeq).toSeq
        val bandCols = combos.zipWithIndex.map { case (cs, idx) =>
          val (key, _) = cs.foldLeft((lit(0L), 0)) { case ((acc, off), i) =>
            val w = starts(i + 1) - starts(i)
            (acc.bitwiseOR(shiftleft(chunk(col("simhash"), i), off)), off + w)
          }
          struct(lit(idx).as("band"), key.as("key"))
        }
        val bandedAll = fps.select(col("simhash")).distinct()
          .select(col("simhash"), explode(array(bandCols: _*)).as("bk"))
          .select(col("simhash"), col("bk.band").as("band"),
            col("bk.key").as("key"))
        val banded = cap match {
          case None => bandedAll
          case Some(c) =>
            val w = Window.partitionBy(col("band"), col("key"))
              .orderBy(col("simhash").asc)
            bandedAll.withColumn("__bn", row_number().over(w))
              .filter(col("__bn") <= c).drop("__bn")
        }
        val t1 = System.nanoTime()
        val nBand = banded.count()
        val tBand = (System.nanoTime() - t1) / 1e9
        val l = banded.select(col("simhash").as("fa"), col("band"), col("key"))
        val r = banded.select(col("simhash").as("fb"), col("band"), col("key"))
        // raw band-join candidate volume (pre-distinct, pre-popcount)
        val t2 = System.nanoTime()
        val nRaw = l.join(r, Seq("band", "key"))
          .filter(col("fa") < col("fb")).count()
        val tRaw = (System.nanoTime() - t2) / 1e9
        // surviving fp pairs after distinct + popcount
        val t3 = System.nanoTime()
        val nFpPairs = l.join(r, Seq("band", "key"))
          .filter(col("fa") < col("fb"))
          .select(col("fa"), col("fb")).distinct()
          .filter(bit_count(col("fa").bitwiseXOR(col("fb"))) <= k)
          .count()
        val tVerify = (System.nanoTime() - t3) / 1e9
        println(f"[simhashprobe] chunks=$chunks cap=$cap pairs=$nOut " +
          f"e2e=$tAll%.2f s | bandrows=$nBand band=$tBand%.2f s " +
          f"rawcand=$nRaw rawjoin=$tRaw%.2f s fppairs=$nFpPairs " +
          f"verify=$tVerify%.2f s")
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
    fps.unpersist()
    spark.stop()
  }
}
