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
    * per-key cardinalities are moderate. This formulation materializes
    * every (left, earlier-right) pair before row_number, so for very
    * deep keys use [[asOfJoinMergeScan]], which is O(|L|+|R|) per key.
    * Among right rows tied on rightTime the winner is arbitrary (use
    * the merge-scan variant's tiebreak for determinism).
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

  /** Merge-scan as-of join — the deep-key path. Both sides are tagged
    * and unioned, hash-partitioned by key, and sorted within each
    * partition by (key, time, side, tiebreak) with right rows ahead of
    * left rows at equal timestamps; one linear pass then carries the
    * last-seen right row per key. NO (left × earlier-right) pair is
    * ever materialized: cost is sort + O(|L|+|R|) per key, versus the
    * window formulation's O(|L|·|R|) pair blow-up on deep keys, and
    * the only shuffle is the one repartition-by-key both sides need
    * anyway.
    *
    * Determinism: right rows tied on rightTime resolve by
    * `rightTieBreak` ascending — the LAST seen (max tiebreak) wins,
    * matching `ORDER BY time DESC, tiebreak DESC ... rn=1` semantics.
    *
    * Semantics match [[asOfJoin]]: left rows with NULL key or NULL
    * time emit with a NULL match (left-join behavior); right rows with
    * NULL key or NULL time can never match and are dropped at the
    * scan. `leftTime` and `rightTime` must share a data type (cast
    * upstream otherwise).
    *
    * Output: all left columns + `asof_time` + `asof` struct(rightCols)
    * — identical to [[asOfJoin]].
    */
  def asOfJoinMergeScan(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightCols: Seq[String],
      rightTieBreak: Seq[String] = Seq.empty
  ): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    val spark = left.sparkSession
    val tT = right.schema(rightTime).dataType
    require(left.schema(leftTime).dataType == tT,
      s"asOfJoinMergeScan: $leftTime and $rightTime must share a type")
    val lStructT = StructType(left.schema.fields)
    val rStructT = right.select(struct(rightCols.map(col): _*)).schema.head.dataType
    val tieExpr =
      struct((if (rightTieBreak.isEmpty) Seq(lit(0)) else rightTieBreak.map(col)): _*)
    val tieT = right.select(tieExpr).schema.head.dataType
    val rT = right
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .select(
        col(key).as("__k"),
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        tieExpr.as("__tie"),
        lit(null).cast(lStructT).as("__l"),
        struct(rightCols.map(col): _*).as("__r"))
    val lT = left.select(
      col(key).as("__k"),
      col(leftTime).as("__t"),
      lit(1).as("__side"),
      lit(null).cast(tieT).as("__tie"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rStructT).as("__r"))
    val parted = rT
      .unionByName(lT)
      .repartition(col("__k"))
      .sortWithinPartitions(
        col("__k"), col("__t").asc_nulls_first, col("__side"),
        col("__tie").asc_nulls_first)
    val outSchema = StructType(
      lStructT.fields :+ StructField("asof_time", tT) :+
        StructField("asof", rStructT))
    val outRdd = parted.rdd.mapPartitions { it =>
      // per-key running state; a fresh sentinel never equals a key
      var curKey: Any = new Object
      var lastT: Any = null
      var lastR: Row = null
      it.flatMap { row =>
        val k = row.get(0)
        if (!java.util.Objects.equals(k, curKey)) {
          curKey = k; lastT = null; lastR = null
        }
        if (row.getInt(2) == 0) { // right: advance last-seen state
          lastT = row.get(1); lastR = row.getStruct(5)
          None
        } else { // left: emit with current state (null-key/time → no match)
          val lrow = row.getStruct(4)
          val matched = k != null && !row.isNullAt(1)
          Some(Row.fromSeq(
            lrow.toSeq :+ (if (matched) lastT else null)
              :+ (if (matched) lastR else null)))
        }
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }
}
