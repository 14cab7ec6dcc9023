package graft

import graft.similarity.Iclm
import org.apache.spark.sql.functions._

class IclmSpec extends SparkTestBase {
  import spark.implicits._

  // 2-D unit-ish vectors at known angles: the greedy chain from the
  // min id must walk the angular neighbors in order
  private def vec(deg: Double): Seq[Float] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  test("iclmOrder walks the angular nearest-neighbor chain within one cluster") {
    // ids at angles: 1→0°, 2→50°, 3→10°, 4→25°, 5→90°
    // chain from id 1 (0°): nearest 10° (3), then 25° (4), then 50° (2),
    // then 90° (5)
    val df = Seq(
      (1L, vec(0)), (2L, vec(50)), (3L, vec(10)), (4L, vec(25)), (5L, vec(90))
    ).toDF("vec_id", "embedding")
    val out = Iclm.iclmOrder(df, "vec_id", "embedding", nLists = 1, iters = 1)
      .orderBy("pos").collect()
      .map(r => r.getLong(1))
    assert(out.toSeq == Seq(1L, 3L, 4L, 2L, 5L))
  }

  test("iclmOrder emits every id exactly once with contiguous per-cluster positions") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val out = Iclm.iclmOrder(df, "vec_id", "embedding", nLists = 8, iters = 2)
      .cache()
    try {
      assert(out.count() == 500L)
      assert(out.select("vec_id").distinct().count() == 500L)
      // positions are 1..m in every cluster
      val bad = out.groupBy("cluster")
        .agg(count(lit(1)).as("m"), max("pos").as("mx"), min("pos").as("mn"),
          countDistinct("pos").as("np"))
        .where(col("mx") =!= col("m") || col("mn") =!= 1 || col("np") =!= col("m"))
        .count()
      assert(bad == 0L)
    } finally out.unpersist()
  }

  test("targetCell below the floor leaves the ordering bit-identical") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // 500 vectors / 4096 target << 8 lists → the floor wins and the
    // output must equal the fixed-nLists run row for row
    val fixed = Iclm.iclmOrder(df, "vec_id", "embedding", nLists = 8, iters = 2)
      .orderBy("cluster", "pos").collect().toSeq
    val auto = Iclm.iclmOrder(df, "vec_id", "embedding", nLists = 8, iters = 2,
      targetCell = 4096)
      .orderBy("cluster", "pos").collect().toSeq
    assert(auto == fixed)
  }

  test("targetCell grows the list count once cells would exceed it") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // 500 vectors / target 50 → ceil = 10 lists > the 4 requested
    val out = Iclm.iclmOrder(df, "vec_id", "embedding", nLists = 4, iters = 2,
      targetCell = 50).cache()
    try {
      assert(out.count() == 500L)
      assert(out.select("cluster").distinct().count() > 4L)
      // contiguity invariant holds under the grown list count too
      val bad = out.groupBy("cluster")
        .agg(count(lit(1)).as("m"), max("pos").as("mx"), min("pos").as("mn"))
        .where(col("mx") =!= col("m") || col("mn") =!= 1)
        .count()
      assert(bad == 0L)
    } finally out.unpersist()
  }

  test("maxClusterSize guard fires instead of silently running an oversized cell") {
    val df = Seq.tabulate(10)(i => (i.toLong, vec(i * 7.0))).toDF("vec_id", "embedding")
    val ex = intercept[org.apache.spark.SparkException] {
      Iclm.iclmOrder(df, "vec_id", "embedding", nLists = 1, iters = 1,
        maxClusterSize = 4).collect()
    }
    assert(ex.getMessage.contains("members") || ex.getCause != null)
  }
}
