package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the standard first look at a new corpus drop:
  * per-column row/null/distinct counts and native-order min/max
  * (stringified after aggregating, so numeric columns keep numeric
  * order). ONE aggregation job over the table produces every
  * column's profile (a single wide agg row, exploded to one row per
  * column) — never one pass per column.
  *
  * `count(DISTINCT ...)` is exact and therefore shuffles per column
  * (Spark plans multiple distinct aggregates via expand); at corpus
  * scale swap in approx_count_distinct — the sketches operator
  * (q_approx_sketches) is the shipped approximate face.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__${c}_nn"),
        countDistinct(col(c)).as(s"__${c}_nd"),
        min(col(c)).cast("string").as(s"__${c}_min"),
        max(col(c)).cast("string").as(s"__${c}_max")
      )
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val structs = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__${c}_nn")).as("n_null"),
        col(s"__${c}_nd").as("n_distinct"),
        col(s"__${c}_min").as("min_val"),
        col(s"__${c}_max").as("max_val")
      )
    }
    row.select(explode(array(structs: _*)).as("p")).select("p.*")
  }
}
