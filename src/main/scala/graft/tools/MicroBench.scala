package graft.tools

import graft.core.Graft
import org.apache.spark.sql.functions._

/** Scratch micro-bench: sub-steps of the curation para-dedup + LSH
  * stages at sf0.1 (cold cache per step, warm JIT).
  */
object MicroBench {
  def t[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[mb] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("micro")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Graft.table(spark, "/root/testdata/sf0.1", "documents")
    import graft.text.TextAnalysis
    import graft.dedup.Dedup
    spark.range(100000L).selectExpr("sum(id)").collect()
    // warm
    docs.count(); docs.count()
    val chunkUdf = udf { (text: String) =>
      val toks = if (text == null) null else text.split(" ", -1)
      if (toks == null) Array((0L, "", null: java.lang.Long))
      else {
        val stride = 32
        val n = math.max(1, math.ceil(toks.length.toDouble / stride).toInt)
        val out = new Array[(Long, String, java.lang.Long)](n)
        var i = 0
        while (i < n) {
          val from = i * stride
          val until = math.min(toks.length, from + 32)
          val sb = new java.lang.StringBuilder(256)
          var j = from
          while (j < until) { if (j > from) sb.append(' '); sb.append(toks(j)); j += 1 }
          out(i) = (i.toLong, sb.toString, java.lang.Long.valueOf(math.min(toks.length - from, 32).toLong))
          i += 1
        }
        out
      }
    }
    t("chunkUdf(32,0) explode+count") {
      docs.select(col("doc_id"), explode(chunkUdf(col("text"))).as("c")).count()
    }
    t("chunkUdf(32,0) explode+count run2") {
      docs.select(col("doc_id"), explode(chunkUdf(col("text"))).as("c")).count()
    }
    t("chunkByTokens(32,0) explode+count") {
      TextAnalysis.chunkByTokens(docs, "doc_id", "text", 32, 0).count()
    }
    t("chunkByTokens(32,0) md5 agg") {
      TextAnalysis.chunkByTokens(docs, "doc_id", "text", 32, 0)
        .select(md5(col("chunk"))).agg(count(lit(1))).collect()
    }
    t("windowDedup(32) full") {
      Dedup.windowDedup(docs.select(col("doc_id"), col("text")), "doc_id", "text", 32).count()
    }
    t("minHashLshPairs n=3 j=0.8") {
      Dedup.minHashLshPairs(docs, "doc_id", "text", 3, minJaccard = 0.8).unpersist()
    }
    // --- minHashLshPairs sub-steps (replicated) ---
    locally {
      val base = docs
        .select(col("doc_id"), Dedup.shingleHashesUdf(3)(col("text")).as("xs"))
        .filter(size(col("xs")) > 0)
        .cache()
      t("  base shingle-hash cache+count") { base.count() }
      val sigUdf = Dedup.minHashSigUdf(32)
      val bandCols = Dedup.bandKeyStructs(8, 4)
      val buckets = base
        .select(col("doc_id"), sigUdf(col("xs")).as("sig"))
        .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.h").as("h"))
        .cache()
      t("  buckets cache+count") { buckets.count() }
      val l = buckets.select(col("doc_id").as("a"), col("band"), col("h"))
      val r = buckets.select(col("doc_id").as("b"), col("band"), col("h"))
      val cand = l.join(r, Seq("band", "h")).filter(col("a") < col("b"))
        .select("a", "b").distinct()
      t("  cand join+distinct count") { cand.count() }
      val verified = cand
        .join(base.select(col("doc_id").as("a"), col("xs").as("xs_a")), Seq("a"))
        .join(base.select(col("doc_id").as("b"), col("xs").as("xs_b")), Seq("b"))
        .withColumn("n_common", size(array_intersect(col("xs_a"), col("xs_b"))).cast("long"))
        .withColumn("jaccard", col("n_common").cast("double") /
          (size(col("xs_a")) + size(col("xs_b")) - col("n_common")).cast("double"))
        .filter(col("jaccard") >= 0.8)
      t("  verify count") { verified.count() }
      base.unpersist(); buckets.unpersist()
    }
    val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text", 3, minJaccard = 0.8)
    t("connectedComponents (local tier)") {
      Dedup.connectedComponents(pairs).count()
    }
    t("clusterize total") {
      Dedup.clusterize(pairs, "doc_id").unpersist()
    }
    pairs.unpersist()
    spark.stop()
  }
}
