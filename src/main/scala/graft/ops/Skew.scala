package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helpers (the 100 TB posture for hot keys).
  *
  * AQE's skew-join split handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in our
  * sessions); explicit salting remains the tool when one side must
  * shuffle on a key whose distribution is pathological (a channel with
  * millions of segments) and the other side is small enough to
  * replicate per salt but too big to broadcast whole.
  */
object Skew {

  /** Salted inner equi-join: the skewed (big) side gets a random salt
    * in [0, salts); the small side is replicated once per salt value.
    * Shuffle keys become (key, salt) → hot keys spread over `salts`
    * reducers. Row multiplicity is preserved exactly; only the
    * partitioning changes.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int
  ): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = big.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
    val replicated = small.withColumn(
      "__salt",
      explode(sequence(lit(0), lit(salts - 1)))
    )
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Per-key frequency profile — decide whether a key needs salting.
    * Returns keys whose row count exceeds `threshold`.
    */
  def hotKeys(df: DataFrame, key: String, threshold: Long): DataFrame =
    df.groupBy(key)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > threshold)

  /** Split-join for extreme skew: hot keys join via broadcast of their
    * small-side rows, cold keys join normally; union preserves
    * semantics. Avoids replicating the small side when only a handful
    * of keys are hot.
    */
  def skewSplitJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      hotKeyThreshold: Long
  ): DataFrame = {
    val hot = hotKeys(big, key, hotKeyThreshold).select(key)
    val bigHot = big.join(broadcast(hot), Seq(key), "left_semi")
    val bigCold = big.join(broadcast(hot), Seq(key), "left_anti")
    val smallHot = small.join(broadcast(hot), Seq(key), "left_semi")
    bigHot
      .join(broadcast(smallHot), Seq(key))
      .unionByName(bigCold.join(small, Seq(key)))
  }
}
