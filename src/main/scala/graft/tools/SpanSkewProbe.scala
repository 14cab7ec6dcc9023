package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hot-window skew probe for the span-removal first-occurrence rank
  * (VERDICT r13 #2): a boilerplate window that appears in 30% of a
  * synthetic corpus makes ONE digest own 30% of all window rows. The
  * old formulation (`row_number() over (partitionBy(__digest)
  * orderBy(id, pos))`) must materialize every occurrence of that
  * digest in a single sort reducer — the classic hot-n-gram failure at
  * the 10⁷–10⁸-doc design point. The shipped rewrite
  * (`min(struct(id, pos))` per digest, map-side combinable, joined
  * back via shuffled HASH join whose probe side streams) keeps every
  * task's materialized state bounded by the DISTINCT digests it owns,
  * not by the hot key's occurrence count.
  *
  * The probe runs both formulations over the same corpus and reports,
  * per run: wall, the max per-task shuffle-read record count, max
  * per-task peak execution memory, and max per-task spill. The
  * shuffle-read max is ~equal by construction (the hot key routes to
  * one task either way); the SORT-side signature — peak memory / spill
  * / wall growing with the hot count on the window plan only — is the
  * degradation the rewrite removes.
  *
  * Usage: tools/run_main.sh graft.tools.SpanSkewProbe [nDocs]
  * (default 6,000,000 docs → ~1.8M-occurrence hot digest)
  */
object SpanSkewProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 6000000L
    val hotPct = if (args.length > 1) args(1).toLong else 3L // tenths
    val spark = SparkSession.builder()
      .master(s"local[${graft.core.Graft.cpus}]")
      .config("spark.sql.shuffle.partitions", graft.core.Graft.cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    // per-task maxima, reset per measured run
    object M extends SparkListener {
      @volatile var maxRead = 0L
      @volatile var maxPeakMem = 0L
      @volatile var maxSpill = 0L
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          maxRead = math.max(maxRead, m.shuffleReadMetrics.recordsRead)
          maxPeakMem = math.max(maxPeakMem, m.peakExecutionMemory)
          maxSpill = math.max(maxSpill,
            m.memoryBytesSpilled + m.diskBytesSpilled)
        }
      }
      def reset(): Unit = { maxRead = 0L; maxPeakMem = 0L; maxSpill = 0L
      }
    }
    spark.sparkContext.addSparkListener(M)

    // 30% of docs carry the SAME 8-token boilerplate window (one hot
    // digest); the rest are doc-unique. One window per doc keeps the
    // relation small enough that the hot key dominates the shape.
    val w = 8
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      when(col("id") % 10 < hotPct,
        lit("all rights reserved contact us terms privacy sitemap"))
        .otherwise(concat_ws(" ", (0 until w).map(j =>
          concat(lit(s"u${j}x"), col("id"))): _*)).as("text"))
      .persist()
    println(s"[spanskew] docs=${docs.count()} hot=${nDocs * hotPct / 10}")

    val wins = docs.select(col("doc_id"),
        posexplode(graft.text.CorpusAudit.gramsUdf(w)(col("text")))
          .as(Seq("pos", "__win")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        unhex(md5(col("__win"))).as("__digest"))

    def run(label: String)(drops: org.apache.spark.sql.DataFrame): Unit = {
      (1 to 2).foreach { rep =>
        M.reset(); System.gc()
        val t0 = System.nanoTime()
        val n = drops.groupBy().count().collect()(0).getLong(0)
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(800) // let async task-end events drain
        println(f"[spanskew] $label run$rep: drops=$n wall=$wall%.2f s " +
          f"maxTaskShuffleRead=${M.maxRead} " +
          f"maxTaskPeakMem=${M.maxPeakMem / 1048576.0}%.1f MiB " +
          f"maxTaskSpill=${M.maxSpill / 1048576.0}%.1f MiB")
      }
    }

    // OLD: per-digest sort rank — the hot digest is one sort reducer
    val rankW = Window.partitionBy("__digest")
      .orderBy(col("doc_id").asc, col("pos").asc)
    run("window-rank") {
      wins.withColumn("__occ", row_number().over(rankW))
        .filter(col("__occ") > 1).select("doc_id", "pos")
    }

    // NEW: two-phase min + shuffled-hash join-back (the shipped plan)
    run("min-join   ") {
      val withKey = wins.withColumn("__k", struct(col("doc_id"), col("pos")))
      val firsts = withKey.groupBy(col("__digest"))
        .agg(min(col("__k")).as("__first"))
      withKey.join(firsts.hint("shuffle_hash"), Seq("__digest"))
        .filter(col("__k") =!= col("__first")).select("doc_id", "pos")
    }

    // end-to-end: the full operator at this corpus (the shipped path)
    M.reset(); System.gc()
    val t0 = System.nanoTime()
    val out = graft.dedup.Dedup
      .removeDuplicateSpans(docs, "doc_id", "text", windowTokens = w)
      .agg(sum("n_removed")).collect()(0).getLong(0)
    println(f"[spanskew] full removeDuplicateSpans: n_removed=$out " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
