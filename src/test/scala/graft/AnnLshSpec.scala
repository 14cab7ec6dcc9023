package graft

import graft.similarity.Ann
import org.apache.spark.sql.functions._

/** Sign-LSH bucketing: the compiled per-row projection loop must emit
  * bit-identical bucket ids to the relational HOF formulation it
  * replaced (pmod(xxhash64(i, j), 1000003)/1000003 - 0.5 planes,
  * j-ascending double accumulation).
  */
class AnnLshSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  /** The round-2 relational formulation, kept here as the reference. */
  private def relationalBuckets(
      df: org.apache.spark.sql.DataFrame,
      vecCol: String,
      bits: Int
  ): org.apache.spark.sql.DataFrame = {
    def planeComponent(i: Int, j: org.apache.spark.sql.Column) =
      (pmod(xxhash64(lit(i), j), lit(1000003L)).cast("double") / 1000003.0d) - 0.5d
    val proj = (0 until bits).map { i =>
      val s = aggregate(
        zip_with(
          col(vecCol),
          sequence(lit(0), size(col(vecCol)) - 1),
          (x, j) => x.cast("double") * planeComponent(i, j)
        ),
        lit(0.0d),
        (acc, v) => acc + v
      )
      when(s >= 0.0d, shiftleft(lit(1L), i)).otherwise(0L)
    }
    df.withColumn("bucket_ref", proj.reduce((a, b) => a.bitwiseOR(b)))
  }

  test("compiled signLshBuckets matches the relational xxhash64 formulation bit-for-bit") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val got = Ann.signLshBuckets(e, "vec_id", "embedding", bits = 8)
      .select(col("vec_id"), col("bucket"))
    val ref = relationalBuckets(e, "embedding", bits = 8)
      .select(col("vec_id"), col("bucket_ref"))
    val joined = got.join(ref, "vec_id")
    assert(joined.count() == e.count())
    val diff = joined.filter(col("bucket") =!= col("bucket_ref")).count()
    assert(diff == 0L, s"$diff rows bucketed differently")
  }

  test("planeComponent matches catalyst xxhash64 on a scalar grid") {
    val pairs = for { i <- 0 until 8; j <- 0 until 64 } yield (i, j)
    val df = spark.createDataFrame(pairs).toDF("i", "j")
      .withColumn(
        "ref",
        (pmod(xxhash64(col("i"), col("j")), lit(1000003L)).cast("double") / 1000003.0d) - 0.5d)
    val rows = df.collect()
    rows.foreach { r =>
      val got = Ann.planeComponent(r.getInt(0), r.getInt(1))
      assert(got == r.getDouble(2), s"(${r.getInt(0)},${r.getInt(1)}): $got vs ${r.getDouble(2)}")
    }
  }

  test("bucket ids stay within [0, 2^bits)") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val b = Ann.signLshBuckets(e, "vec_id", "embedding", bits = 6)
    val bad = b.filter(col("bucket") < 0L || col("bucket") >= (1L << 6)).count()
    assert(bad == 0L)
  }
}
