package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators — extensions beyond the reference surface
  * (it has none, SURVEY §2.5 note) that a training-data event pipeline
  * needs: bounded range self-joins and as-of joins.
  */
object Temporal {

  /** Range join: pairs from `left` × `right` sharing `key` whose time
    * difference lies in [0, window). Executes as an equi-join on the
    * key with the range as a join condition — co-partitioned by key,
    * no cross product. For keys with dense timelines add a time-bucket
    * to the join key (bucket + neighbor bucket) to bound the per-key
    * fan-out; that variant is the 100 TB path.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      windowNs: Long
  ): DataFrame =
    left.join(
      right,
      left(key) === right(key) &&
        right(rightTime) >= left(leftTime) &&
        right(rightTime) - left(leftTime) < windowNs,
      "inner"
    )

  /** As-of join: for every left row, the single latest right row with
    * the same key and rightTime ≤ leftTime. Implemented as range-less
    * equi-join + per-left-row max — correct and shuffle-minimal when
    * per-key cardinalities are moderate; a merge-scan implementation
    * (sorted union, last-seen state) is the path for very deep keys.
    * `leftId` must uniquely identify left rows.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      leftId: String,
      rightCols: Seq[String]
  ): DataFrame = {
    val r = right.select(
      col(key).as("__k"),
      col(rightTime).as("__rt"),
      struct(rightCols.map(col): _*).as("__r")
    )
    val joined = left.join(
      r,
      left(key) === col("__k") && col("__rt") <= left(leftTime),
      "left"
    )
    val w = Window
      .partitionBy(col(leftId))
      .orderBy(col("__rt").desc_nulls_last)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__k", "__rn")
      .withColumnRenamed("__rt", "asof_time")
      .withColumnRenamed("__r", "asof")
  }
}
