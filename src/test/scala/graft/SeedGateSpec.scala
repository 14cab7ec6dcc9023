package graft

import graft.similarity.Ann
import org.apache.spark.sql.functions._

/** Seed-centroid similarity gate. */
class SeedGateSpec extends SparkTestBase {
  import spark.implicits._

  test("a seed identical to the centroid scores exactly 1.0") {
    val v = Array(0.5f, 0.25f, -0.75f, 0.125f)
    val seeds = Seq((1L, v), (2L, v)).toDF("vec_id", "embedding")
    val corpus = Seq((1L, v), (3L, Array(-0.5f, -0.25f, 0.75f, -0.125f)))
      .toDF("vec_id", "embedding")
    val out = Ann.seedCentroidScores(corpus, seeds, "vec_id", "embedding",
      minCos = 0.5).orderBy("vec_id").collect()
    assert(out(0).getAs[Double]("cos_centroid") == 1.0)
    assert(out(0).getAs[Boolean]("keep"))
    assert(out(1).getAs[Double]("cos_centroid") == -1.0) // antipode
    assert(!out(1).getAs[Boolean]("keep"))
  }

  test("orthogonal vector scores zero") {
    val seeds = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq((2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Ann.seedCentroidScores(corpus, seeds, "vec_id", "embedding", 0.0)
      .collect()(0)
    assert(out.getAs[Long]("dot_centroid") == 0L)
    assert(out.getAs[Double]("cos_centroid") == 0.0)
  }

  test("integer mean uses the shift trick: negative sums divide portably") {
    // seeds sum to (-3, 3) over n=2 -> true mean (-1.5, 1.5); the
    // shifted truncating division gives floor: (-2, 1) on the quant
    // grid scaled by 2^20: csum=(-3*2^20, 3*2^20) -> cq = floor(-1.5*2^20),
    // floor(1.5*2^20)
    val seeds = Seq(
      (1L, Array(-1.0f, 1.0f)),
      (2L, Array(-2.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val corpus = Seq((3L, Array(-1.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = Ann.seedCentroidScores(corpus, seeds, "vec_id", "embedding", 0.0)
      .collect()(0)
    // cq = (-1572864, 1572864) exactly (half-integer grid, floor = exact
    // here since -1.5*2^20 is integral); dot = 2^20*1572864*2 = 3298534883328
    assert(out.getAs[Long]("dot_centroid") == 2L * 1048576L * 1572864L)
    assert(out.getAs[Double]("cos_centroid") == 1.0)
  }

  test("empty seed set is rejected") {
    val e = Seq((1L, Array(1.0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Ann.seedCentroidScores(e, e.filter(col("vec_id") < 0L),
        "vec_id", "embedding", 0.0)
    }
  }
}
