package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of q_audio_fingerprint_pairs (34.7 s at sf10 in
  * BENCH_sf10_e2e.json — the heaviest gated decade face). Splits the
  * wall into: (1) the events→per-user quantized-waveform preamble
  * (groupBy + collect_list + interpreted HOF lambdas), (2) fingerprint
  * fold, (3) the Manku Hamming join over the cached fingerprint
  * relation, and prints print-duplication stats (how many ids share a
  * fingerprint — the pair-output density driver).
  *
  * Usage: tools/run_main.sh graft.tools.AudioPairsProbe testdata/sf10
  */
object AudioPairsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${graft.core.Graft.cpus}]")
      .config("spark.sql.shuffle.partitions", graft.core.Graft.cpus)
      .config("spark.sql.files.openCostInBytes", "16384")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[aprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val e = graft.core.Graft.table(spark, sfDir, "events")
      .filter(col("user_id") % 5 === 0)
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("event_id"), col("value"))))
        .as("evs"))
      .select(col("user_id"),
        expr("transform(evs, e -> CAST(floor(e.value / 1000.0 * 32767.0 + 0.5) AS BIGINT))")
          .as("q"))
    val nUsers = time("preamble: events -> per-user waveform") { e.count() }
    println(s"[aprobe] users=$nUsers")

    // frame = 1 sample since r14 (matches the face): per-sample
    // energies fill the full 63-bit print capacity — see the face's
    // doc for why 4-sample frames made the pair set quadratic
    def energies(scale: Int) =
      s"transform(q, x -> (x * $scale) * (x * $scale))"
    def fp(eCol: String) =
      s"""CASE WHEN size($eCol) < 2 THEN 0L
         |ELSE aggregate(sequence(0, least(size($eCol) - 2, 63)), 0L,
         |  (acc, f) -> acc + IF(element_at($eCol, f + 2) > element_at($eCol, f + 1),
         |                       shiftleft(1L, f), 0L)) END""".stripMargin
    val scored = e
      .withColumn("e1", expr(energies(1)))
      .withColumn("e3", expr(energies(3)))
    val fps = scored.select((col("user_id") * 2).as("id"),
        expr(fp("e1")).as("fp"))
      .unionByName(scored.select((col("user_id") * 2 + 1).as("id"),
        expr(fp("e3")).as("fp")))
      .cache()
    val nFps = time("fingerprint fold (incl. preamble recompute)") { fps.count() }
    val nDistinct = fps.select("fp").distinct().count()
    val grp = fps.groupBy("fp").count()
    val maxGrp = grp.agg(max("count")).collect()(0).getLong(0)
    println(s"[aprobe] fps=$nFps distinct=$nDistinct maxGroup=$maxGrp")

    for (rep <- 1 to 2) time(s"hammingPairs64 over cached fps run$rep") {
      val out = graft.dedup.Dedup.hammingPairs64(
        fps, "id", "fp", maxHamming = 4)
      val n = out.count()
      out.unpersist()
      println(s"[aprobe]   pairs=$n")
    }
    spark.stop()
  }
}
