package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training — the pair-count/merge loop of
  * Sennrich et al. '16, shaped for corpus scale.
  *
  * The scale insight (same as every efficient BPE trainer): after the
  * one corpus pass that builds word counts, every training round runs
  * over the DISTINCT-WORD table weighted by frequency — vocabulary
  * size, not corpus size. At 100 TB the corpus pass is a single
  * groupBy(word) whose output is millions of rows, and each merge
  * round shuffles only exploded adjacent-symbol pairs of that
  * vocabulary. The chosen merge per round is one collected row
  * (driver metadata), never data.
  *
  * Determinism: pair ranking orders by (count DESC, pair ASC) — no
  * RNG, no hash-map iteration order — so the learned merge sequence is
  * reproducible across engines and partitionings, and round 1 is
  * DuckDB-replayable (q_text_bpe_pairs).
  *
  * Reference has no tokenizer trainer; this is part of the
  * training-data extension mandate (token counting's natural
  * completion: the thing that DEFINES the tokens).
  */
object Bpe {

  /** One corpus pass: whitespace words with frequencies (the only
    * corpus-sized shuffle in BPE training). Empty tokens from repeated
    * spaces are dropped.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word")
      .agg(count(lit(1)).as("n"))

  /** Words as space-joined symbol sequences, the working representation
    * of BPE training (round 0: one symbol per character).
    */
  def asSymbols(words: DataFrame): DataFrame =
    words.withColumn(
      "sym", array_join(split(col("word"), ""), " "))

  /** Adjacent-symbol pair counts, frequency-weighted: the per-round
    * aggregation. Input needs (sym, n); output (pair, cnt) where pair
    * is "left right" (space-separated symbols).
    */
  def pairCounts(symbols: DataFrame): DataFrame =
    symbols
      .select(split(col("sym"), " ").as("ss"), col("n"))
      .filter(size(col("ss")) >= 2)
      .select(
        explode(expr(
          "transform(sequence(0, size(ss) - 2), " +
            "i -> concat(element_at(ss, i + 1), ' ', element_at(ss, i + 2)))"))
          .as("pair"),
        col("n"))
      .groupBy("pair")
      .agg(sum(col("n")).as("cnt"))

  private val mergeUdf = udf { (ss: Seq[String], l: String, r: String) =>
    // greedy left-to-right non-overlapping merge — the standard BPE
    // application rule ("aaa" with merge a+a → ["aa", "a"])
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < ss.length) {
      if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += ss(i); i += 1 }
    }
    out.mkString(" ")
  }

  /** Apply one learned merge to every symbol sequence. */
  def applyMerge(symbols: DataFrame, left: String, right: String): DataFrame =
    symbols.withColumn(
      "sym", mergeUdf(split(col("sym"), " "), lit(left), lit(right)))

  /** Train `rounds` merges. Returns the merge table (round, left,
    * right, cnt) — the tokenizer — and the final symbolized
    * vocabulary. Each round: one vocabulary-sized aggregation, one
    * 1-row collect, one per-row merge application. The evolving
    * vocabulary is cached per round and released after the next round
    * materializes (same discipline as CurationPipeline's funnel).
    */
  def train(
      df: DataFrame,
      textCol: String,
      rounds: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var vocab = asSymbols(wordCounts(df, textCol)).cache()
    vocab.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < rounds && !exhausted) {
      val top = pairCounts(vocab)
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) { exhausted = true }
      else {
        val Array(l, r) = top.head.getString(0).split(" ", 2)
        merges += ((round, l, r, top.head.getLong(1)))
        val next = applyMerge(vocab, l, r).cache()
        next.count()
        vocab.unpersist()
        vocab = next
        round += 1
      }
    }
    (merges.toSeq, vocab)
  }

  /** Tokenize text with a learned merge table: per-word greedy
    * application of the merges in learned order (the standard BPE
    * encode). Returns (original row, tokens array).
    */
  def encode(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      spark: SparkSession): DataFrame = {
    val bc = spark.sparkContext.broadcast(merges)
    // Spark passes null through to object-typed UDF params: a null-text
    // document must tokenize to [] (matching train/wordCounts and the
    // oracle's LEFT JOIN + coalesce), not NPE the job.
    val encodeUdf = udf { (text: String) =>
      (if (text == null) Array.empty[String]
       else text.split(" ")).filter(_.nonEmpty).flatMap { w =>
        var ss: Seq[String] = w.split("").toSeq
        bc.value.foreach { case (l, r) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < ss.length) {
            if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) {
              out += (l + r); i += 2
            } else { out += ss(i); i += 1 }
          }
          ss = out.toSeq
        }
        ss
      }
    }
    df.withColumn("tokens", encodeUdf(col(textCol)))
  }
}
