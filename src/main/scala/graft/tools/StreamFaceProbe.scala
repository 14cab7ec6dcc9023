package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Machinery-vs-operator decomposition of the two stream-driving bench
  * faces (VERDICT r13 #4) — at sf0.1 they are the top two bench rows
  * (q_dedup_containment_filter_stream ~4.0 s, q_dedup_span_scrub_stream
  * ~3.5 s). Each face pays, besides the operator itself:
  * fixture prep (percentile split + re-writing the input as two
  * parquet drops), starting a Structured Streaming query, TWO
  * AvailableNow micro-batch drains with checkpoint WAL/commit I/O,
  * stream shutdown, and the batchId-keyed sink writes + read-back.
  *
  * Stages timed independently (2 reps each):
  *   prep       — split + write the two input drops
  *   machinery  — the SAME stream shape with an IDENTITY foreachBatch
  *                (write the batch through untouched): start/drain×2/
  *                checkpoint/sink/stop, zero operator work
  *   operator   — the one-shot batch equivalent of the per-batch work
  *                (containment filter / history-only span scrub over
  *                the full new split), counted
  *   full       — the real front door end-to-end (stream + operator)
  *
  * machinery/full is the fixed-cost share: if ≥ half, the face's wall
  * is stream-harness cost that does NOT scale with data (flat-cost
  * face for decade purposes); the operator row is what scales.
  *
  * Usage: tools/run_main.sh graft.tools.StreamFaceProbe [sfDir]
  */
object StreamFaceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.core.Graft.session("stream-face-probe")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def t(label: String)(f: => Unit): Unit =
      (1 to 2).foreach { rep =>
        System.gc()
        val t0 = System.nanoTime()
        f
        println(f"[streamface] $label run$rep: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    val d = graft.core.Graft.table(spark, sfDir, "documents")
      .select("doc_id", "text")
    val newDocs = d.filter(col("doc_id") % 3L === 0L)
    val history = d.filter(col("doc_id") % 3L =!= 0L)

    def freshRoot() =
      graft.queries.FixtureCache.scratchDir("graft_streamface")

    def writeDrops(root: java.nio.file.Path): String = {
      val inDir = root.resolve("in")
      val half = newDocs
        .agg(expr("percentile(doc_id, 0.5)")).head().getDouble(0)
      // mirrors the faces: one file per drop = one micro-batch per drop
      newDocs.filter(col("doc_id") <= half).coalesce(1)
        .write.parquet(inDir.resolve("a").toString)
      newDocs.filter(col("doc_id") > half).coalesce(1)
        .write.parquet(inDir.resolve("b").toString)
      inDir.toString
    }

    t("prep (split + two drops)") { writeDrops(freshRoot()); () }

    t("machinery (identity foreachBatch stream)") {
      val root = freshRoot()
      val inDir = writeDrops(root)
      spark.readStream.schema(newDocs.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir + "/*")
        .writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          batch.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(root.resolve("clean").toString + s"/batch=$id")
          ()
        }
        .start().awaitTermination()
      spark.read.parquet(root.resolve("clean").toString).count()
      ()
    }

    t("operator: containment filter (one-shot batch)") {
      val pairs = graft.dedup.Dedup.containmentPairsAgainst(
        newDocs, history, "doc_id", "text", 3, 0.8, Long.MaxValue)
      val doomed = pairs.select(col("new_id").as("doc_id")).distinct()
      newDocs.join(doomed, Seq("doc_id"), "left_anti").count()
      pairs.unpersist()
      ()
    }

    t("operator: span scrub (one-shot history-only)") {
      graft.dedup.Dedup.removeDuplicateSpansAgainst(
        newDocs, history, "doc_id", "text", windowTokens = 8,
        batchInternal = false).count()
      ()
    }

    t("full: containmentFilterStream") {
      val root = freshRoot()
      val inDir = writeDrops(root)
      graft.streaming.Incremental.containmentFilterStream(
        spark.readStream.schema(newDocs.schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir + "/*"),
        history, "doc_id", "text",
        root.resolve("clean").toString, root.resolve("ckpt").toString,
        n = 3, minContainment = 0.8, maxDf = Long.MaxValue)
        .awaitTermination()
      spark.read.parquet(root.resolve("clean").toString).count()
      ()
    }

    t("full: spanScrubStream") {
      val root = freshRoot()
      val inDir = writeDrops(root)
      graft.streaming.Incremental.spanScrubStream(
        spark.readStream.schema(newDocs.schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir + "/*"),
        history, "doc_id", "text",
        root.resolve("clean").toString, root.resolve("ckpt").toString,
        windowTokens = 8)
        .awaitTermination()
      spark.read.parquet(root.resolve("clean").toString).count()
      ()
    }

    spark.stop()
  }
}
