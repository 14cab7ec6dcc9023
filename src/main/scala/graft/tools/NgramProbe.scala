package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of the q_text_top_ngrams wall (9.4 s, 8.3x per
  * decade in BENCH_sf10_r13.json — the second face of the broad sweep).
  * Times, separately: gram generation alone (the per-row explode), the
  * current exact aggregation (md5 keys + Expand countDistinct), a pass-1
  * 8-byte-hash duplicate-count (the cheapest possible "which grams are
  * worth exact work" shuffle), and the hot-gram cardinality that decides
  * whether a prefiltered two-pass plan can broadcast its survivor set.
  *
  * Usage: tools/run_main.sh graft.tools.NgramProbe testdata/sf10
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${graft.core.Graft.cpus}]")
      .config("spark.sql.shuffle.partitions", graft.core.Graft.cpus)
      .config("spark.sql.files.openCostInBytes", "16384")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      System.gc()
      val t0 = System.nanoTime()
      val r = f
      println(f"[ngprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = graft.core.Graft.table(spark, sfDir, "documents")
    val n = 3
    val toks = docs.select(
      col("doc_id"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= n)
    def grams = toks
      .select(col("doc_id"),
        explode(
          transform(
            sequence(lit(0), size(col("toks")) - n),
            i => concat_ws(" ", slice(col("toks"), i + 1, lit(n))))).as("gram"))
      .where(length(col("gram")) > 0)

    val nGrams = time("gram generation (count only)") { grams.count() }
    println(s"[ngprobe] grams=$nGrams")

    // interleaved generation-only A/B (count(gram) forces the strings)
    def genHof() = grams.select(count(col("gram"))).collect()(0).getLong(0)
    def genUdf() = docs.select(col("doc_id"),
        explode(graft.text.CorpusAudit.gramsUdf(n)(col("text"))).as("gram"))
      .where(length(col("gram")) > 0)
      .select(count(col("gram"))).collect()(0).getLong(0)
    for (rep <- 1 to 3) {
      time(s"gen HOF run$rep") { genHof() }
      time(s"gen UDF run$rep") { genUdf() }
    }

    for (rep <- 1 to 2) time(s"r13-pre one-pass md5 agg (old shape) run$rep") {
      grams.select(col("doc_id"), md5(col("gram")).as("g"), col("gram"))
        .groupBy("g")
        .agg(min("gram").as("gram"),
          count(lit(1)).as("occurrences"),
          countDistinct("doc_id").as("n_docs"),
          min("doc_id").as("example_doc"))
        .where(col("occurrences") > 1)
        .select("gram", "occurrences", "n_docs", "example_doc")
        .orderBy(col("occurrences").desc, col("gram").asc)
        .limit(100).count()
    }

    for (rep <- 1 to 2) time(s"operator (compiled-loop generation) run$rep") {
      graft.text.CorpusAudit.topDuplicatedNgrams(
        docs, "doc_id", "text", n = 3, k = 100).count()
    }

    val nHot = time("pass-1 hash duplicate count (xxhash64 keys)") {
      grams.groupBy(xxhash64(col("gram")).as("h"))
        .agg(count(lit(1)).as("c")).where(col("c") > 1).count()
    }
    println(s"[ngprobe] hot grams=$nHot (${nHot * 8 / 1024 / 1024} MiB as longs)")

    time("two-pass prefiltered exact agg") {
      val hot = grams.groupBy(xxhash64(col("gram")).as("h"))
        .agg(count(lit(1)).as("c")).where(col("c") > 1).select("h")
      grams.join(broadcast(hot),
          xxhash64(col("gram")) === col("h"), "left_semi")
        .groupBy("gram")
        .agg(count(lit(1)).as("occurrences"),
          countDistinct("doc_id").as("n_docs"),
          min("doc_id").as("example_doc"))
        .where(col("occurrences") > 1)
        .orderBy(col("occurrences").desc, col("gram").asc)
        .limit(100).count()
    }
    spark.stop()
  }
}
