package graft.tools

import graft.core.Graft
import org.apache.spark.sql.functions._

/** Decomposition of q_text_lm_buckets (round 15): how much of the face
  * is the bigram tally (string n-gram explode + broadcast model join)
  * vs the two-phase prefix-sum bucketing — and whether joining on
  * 64-bit FNV gram hashes (no per-position string construction, 8-byte
  * join keys) beats the string-bigram join. min-of-3, interleaved.
  */
object LmBucketsAB {
  def t(label: String)(f: => Any): Double = {
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[ab] $label min=${ts.min}%.3f runs=${ts.map(x => f"$x%.2f").mkString(",")}")
    ts.min
  }

  def main(args: Array[String]): Unit = {
    val spark = Graft.session("lmbuckets-ab")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = Graft.table(spark, dir, "documents")
    spark.range(100000L).selectExpr("sum(id)").collect()
    docs.count(); docs.count()

    import graft.text.TextAnalysis

    def model() = TextAnalysis
      .bigramModel(docs.filter(col("doc_id") % 10 === 0), "text", minCount = 2L)

    // warm
    TextAnalysis.lmBuckets(docs, "doc_id", "text", "lang", model()).unpersist()

    t("full lmBuckets") {
      TextAnalysis.lmBuckets(docs, "doc_id", "text", "lang", model()).unpersist()
    }
    t("  model build only") {
      model().agg(count(lit(1))).collect()
    }
    t("  lmQuality tally only (incl model build)") {
      TextAnalysis.lmQuality(docs, "doc_id", "text", model())
        .agg(count(lit(1)), sum(col("n_hits"))).collect()
    }

    // hashed-join variant of the tally: FNV-1a gram hashes per position
    // (duplicates kept) on the doc side, the same FNV over the model's
    // bigram strings on the model side
    val gramHash = udf { (text: String) =>
      if (text == null) Array.empty[Long]
      else {
        val toks = text.split(" ", -1)
        if (toks.length < 2) Array.empty[Long]
        else {
          val m = toks.length - 1
          val out = new Array[Long](m)
          var i = 0
          while (i < m) {
            var h = 0xcbf29ce484222325L
            var j = 0
            while (j < 2) {
              if (j > 0) { h ^= ' '.toLong; h *= 0x100000001b3L }
              val tk = toks(i + j)
              var k = 0
              while (k < tk.length) { h ^= tk.charAt(k).toLong; h *= 0x100000001b3L; k += 1 }
              j += 1
            }
            out(i) = h
            i += 1
          }
          out
        }
      }
    }
    val strHash = udf { (s: String) =>
      var h = 0xcbf29ce484222325L
      var k = 0
      while (k < s.length) { h ^= s.charAt(k).toLong; h *= 0x100000001b3L; k += 1 }
      h
    }
    t("  hashed tally variant (incl model build)") {
      val m = broadcast(model()
        .select(strHash(col("bigram")).as("gh"), col("c2")))
      docs
        .select(col("doc_id"), explode(gramHash(col("text"))).as("gh"))
        .join(m, Seq("gh"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), count(col("c2")).as("n_hits"))
        .agg(count(lit(1)), sum(col("n_hits"))).collect()
    }
    spark.stop()
  }
}
