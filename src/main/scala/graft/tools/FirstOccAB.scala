package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A/B harness for the first-occurrence rank inside
  * paragraph/window dedup (Dedup.firstOccurrenceRank) — the stage the
  * r14 de-skew rewrote and the sf0.1 bench priced at +30–50% on the
  * funnels. Times four formulations of "keep the globally-first
  * occurrence of each window digest" over the same 32-word window
  * stream the funnel generates:
  *
  *   window   — row_number() over (partitionBy digest orderBy id,pos)
  *              (r13: one sort reducer per digest — the skew hazard)
  *   aggjoin  — min(struct) agg + join back, separate branches
  *              (r14: skew-proof but the chunk/md5 upstream runs twice)
  *   repart   — aggjoin over a shared repartition(digest)
  *              (column pruning splits the exchange → still twice)
  *   ckpt     — aggjoin over a localCheckpoint'd occurrence frame
  *              (upstream runs once, lineage truncated)
  *
  * Prints min-of-3 walls plus the kept-count so equivalence is
  * checked in the same run.
  */
object FirstOccAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.Graft.session("firstocc-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    val docs = graft.core.Graft.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))

    def occ(): DataFrame = graft.text.TextAnalysis
      .chunkByTokens(docs, "doc_id", "text", maxTokens = 32, overlap = 0)
      .select(col("doc_id"), col("chunk_idx").as("pos"),
        md5(col("chunk")).as("__digest"))

    def keptCount(kept: DataFrame): Long =
      kept.groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"))
        .agg(sum("n_kept")).head().getLong(0)

    def windowForm(): Long = {
      val w = Window.partitionBy(col("__digest"))
        .orderBy(col("doc_id").asc, col("pos").asc)
      keptCount(occ().withColumn("__occ", row_number().over(w))
        .filter(col("__occ") === 1))
    }

    def aggJoin(base: DataFrame): Long = {
      val withKey = base.withColumn("__k", struct(col("doc_id"), col("pos")))
      val firsts = withKey.groupBy(col("__digest"))
        .agg(min(col("__k")).as("__first"))
      keptCount(withKey.join(firsts.hint("shuffle_hash"), Seq("__digest"))
        .filter(col("__k") === col("__first")))
    }

    def time(label: String)(f: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[firstocc-ab] $label min=${runs.map(_._1).min}%.2f " +
        f"runs=${runs.map(r => f"${r._1}%.2f").mkString(",")} kept=${runs.head._2}")
    }

    time("window")(windowForm())
    time("aggjoin")(aggJoin(occ()))
    time("repart")(aggJoin(occ().repartition(col("__digest"))))
    time("ckpt") {
      val c = occ().localCheckpoint(true)
      val n = aggJoin(c)
      n
    }
    spark.stop()
  }
}
