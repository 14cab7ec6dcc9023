package graft.tools

import graft.core.Graft
import org.apache.spark.sql.functions._

/** Decomposition probe for two optimization candidates (round 15):
  *
  *  1. ngramJaccardPairs — how much of the face is the shingle
  *     explode+cache fill vs the posting self-join + (a,b) agg, and
  *     whether a one-exchange groupBy-emission formulation can beat
  *     the cached two-read join.
  *  2. normalizedText — the two-regex-pass normalizer (lower +
  *     strip-punct regex + collapse-ws regex + trim) vs a single
  *     compiled char loop per row, on the exact_normalized /
  *     soft_weights key path.
  *
  * min-of-3 per step, interleaved within one JVM so box drift hits
  * every variant equally.
  */
object NgramNormAB {
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
    val spark = Graft.session("ngramnorm-ab")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = Graft.table(spark, dir, "documents").select(col("doc_id"), col("text"))
    spark.range(100000L).selectExpr("sum(id)").collect()
    docs.count(); docs.count()

    import graft.dedup.Dedup

    // ---------- 1. ngramJaccardPairs decomposition ----------
    // warm
    Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.12, Long.MaxValue).unpersist()

    t("ngram: full current") {
      val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.12, Long.MaxValue)
      out.unpersist()
    }

    // the pre-r15 join-over-cached-postings formulation, for A/B
    t("ngram: old join form") {
      val ex0 = docs
        .select(col("doc_id"), Dedup.shingleHashesUdf(3)(col("text")).as("xs"))
        .select(col("doc_id"), size(col("xs")).cast("long").as("n_sh"),
          explode(col("xs")).as("shingle"))
      val rare = ex0.cache()
      val a = rare.select(col("doc_id").as("a"), col("n_sh").as("n_a"), col("shingle"))
      val b = rare.select(col("doc_id").as("b"), col("n_sh").as("n_b"), col("shingle"))
      val pairs = a.join(b, Seq("shingle"))
        .filter(col("a") < col("b"))
        .groupBy("a", "b", "n_a", "n_b")
        .agg(count(lit(1)).as("n_common"))
        .withColumn("jaccard", col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
        .filter(col("jaccard") >= 0.12)
      pairs.agg(count(lit(1))).collect()
      rare.unpersist(blocking = true)
    }

    val ex = docs
      .select(col("doc_id"), Dedup.shingleHashesUdf(3)(col("text")).as("xs"))
      .select(col("doc_id"), size(col("xs")).cast("long").as("n_sh"),
        explode(col("xs")).as("shingle"))
    t("ngram: explode only (noop agg)") {
      ex.agg(count(lit(1))).collect()
    }
    t("ngram: cache fill + unpersist") {
      val c = ex.cache(); c.count(); c.unpersist(blocking = true)
    }

    // emission variant, UDF pair-emitter (UNDERSTATES the native win:
    // boxes a Seq per posting list) — one exchange on shingle, no cache
    val emit = udf { (ids: Seq[Long], ns: Seq[Long]) =>
      val d = ids.length
      val out = new Array[(Long, Long, Long, Long)](d * (d - 1) / 2)
      var k = 0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) {
          // ids sorted ascending by the sort_array over struct(id, n)
          out(k) = (ids(i), ids(j), ns(i), ns(j)); k += 1; j += 1
        }
        i += 1
      }
      out
    }
    t("ngram: groupBy-emission variant (UDF emitter)") {
      val ps = ex.groupBy("shingle")
        .agg(sort_array(collect_list(struct(col("doc_id"), col("n_sh")))).as("ps"))
        .filter(size(col("ps")) > 1)
        .select(col("ps.doc_id").as("ids"), col("ps.n_sh").as("ns"))
      val pairs = ps
        .select(explode(emit(col("ids"), col("ns"))).as("p"))
        .groupBy(col("p._1").as("a"), col("p._2").as("b"),
          col("p._3").as("n_a"), col("p._4").as("n_b"))
        .agg(count(lit(1)).as("n_common"))
        .withColumn("jaccard", col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
        .filter(col("jaccard") >= 0.12)
      pairs.agg(count(lit(1))).collect()
    }

    // capped operating point of the e2e funnels (j=0.8, maxDf=1000):
    // the old form paid a count-over-window df pass the new form gets
    // free from size(group)
    t("ngram capped: new emission form") {
      val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8, 1000L)
      out.unpersist()
    }
    t("ngram capped: old join+window form") {
      import org.apache.spark.sql.expressions.Window
      val ex0 = docs
        .select(col("doc_id"), Dedup.shingleHashesUdf(3)(col("text")).as("xs"))
        .select(col("doc_id"), size(col("xs")).cast("long").as("n_sh"),
          explode(col("xs")).as("shingle"))
      val rare = ex0
        .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
        .filter(col("df") <= 1000L).drop("df").cache()
      val a = rare.select(col("doc_id").as("a"), col("n_sh").as("n_a"), col("shingle"))
      val b = rare.select(col("doc_id").as("b"), col("n_sh").as("n_b"), col("shingle"))
      val pairs = a.join(b, Seq("shingle"))
        .filter(col("a") < col("b"))
        .groupBy("a", "b", "n_a", "n_b")
        .agg(count(lit(1)).as("n_common"))
        .withColumn("jaccard", col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
        .filter(col("jaccard") >= 0.8)
      pairs.agg(count(lit(1))).collect()
      rare.unpersist(blocking = true)
    }

    // ---------- 2. normalizedText ----------
    val normBuiltin = graft.text.TextAnalysis.normalizedText(col("text"))
    t("norm: builtin two-regex-pass (md5 agg)") {
      docs.select(md5(normBuiltin).as("k")).agg(count(lit(1)), min(col("k"))).collect()
    }
    // single-pass char loop, ASCII semantics of the regexes:
    //   lower → drop [!-/:-@[-`{-~] → collapse \s+ to ' ' → trim
    val normLoop = udf { (text: String) =>
      if (text == null) null
      else {
        val n = text.length
        val sb = new java.lang.StringBuilder(n)
        var i = 0
        var pendingSpace = false
        while (i < n) {
          val c0 = text.charAt(i)
          val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else Character.toLowerCase(c0)
          val isPunct = (c >= '!' && c <= '/') || (c >= ':' && c <= '@') ||
            (c >= '[' && c <= '`') || (c >= '{' && c <= '~')
          val isWs = Character.isWhitespace(c)
          if (isWs) pendingSpace = true
          else if (!isPunct) {
            if (pendingSpace && sb.length > 0) sb.append(' ')
            pendingSpace = false
            sb.append(c)
          }
          i += 1
        }
        sb.toString
      }
    }
    t("norm: single-pass loop UDF (md5 agg)") {
      docs.select(md5(normLoop(col("text"))).as("k")).agg(count(lit(1)), min(col("k"))).collect()
    }
    // equality check on the fixture
    val neq = docs.select(normBuiltin.as("a"), normLoop(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    println(s"[ab] norm: loop-vs-builtin mismatch rows = $neq")

    t("soft_weights: full current") {
      Dedup.softDedupWeights(docs, "doc_id", "text").agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
