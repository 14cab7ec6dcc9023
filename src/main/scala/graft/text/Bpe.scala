package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training — the pair-count/merge loop of
  * Sennrich et al. '16, shaped for corpus scale.
  *
  * The scale insight (same as every efficient BPE trainer): the ONLY
  * corpus-sized work is the one groupBy(word) pass that builds word
  * counts; its output is the distinct-word vocabulary (millions of
  * rows at 100 TB — driver-metadata-sized), which `train` collects
  * once and merges in memory, exactly as SentencePiece/HF trainers do
  * on aggregated counts. Job count is therefore independent of the
  * merge-round hyperparameter. `pairCounts`/`applyMerge` remain as
  * distributed faces (oracle-replayable round surface); `encode` is
  * the corpus-sized distributed path.
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

  /** UTF-8 byte-order string comparison — the collation both Spark
    * (UTF8String) and DuckDB (default BINARY collation) use for ORDER
    * BY, which differs from Java's UTF-16 `compareTo` on supplementary
    * characters. The driver-local argmax must break count ties exactly
    * the way the engines' `ORDER BY pair ASC` would.
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(ab.length, bb.length)
    while (i < n) {
      val x = ab(i) & 0xff
      val y = bb(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    ab.length < bb.length
  }

  /** One greedy left-to-right non-overlapping merge pass (driver-side
    * twin of `mergeUdf`, shared rule).
    */
  private def mergeOnce(ss: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < ss.length) {
      if (i + 1 < ss.length && ss(i) == l && ss(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += ss(i); i += 1 }
    }
    out.toArray
  }

  /** Train `rounds` merges. Returns the merge table (round, left,
    * right, cnt) — the tokenizer — and the final symbolized
    * vocabulary as (word, n, sym).
    *
    * Scale shape (the SentencePiece/HF trainer shape): ONE corpus-
    * sized Spark job — `wordCounts`, a groupBy(word) whose output is
    * the distinct-word vocabulary (millions of rows at 100 TB, i.e.
    * driver-metadata-sized) — collected once; every merge round then
    * runs driver-local over that aggregated count table. Job count no
    * longer scales with the merge-round hyperparameter: a production
    * 32k-merge vocab costs one distributed pass + an in-memory loop,
    * not 32k sequential jobs. The distributed path stays where the
    * data is corpus-sized: `encode`.
    *
    * Determinism: the per-round argmax orders by (count DESC, pair
    * ASC in UTF-8 byte order) — byte-identical to the previous
    * distributed `orderBy(cnt.desc, pair.asc).limit(1)` and to the
    * DuckDB oracle's unrolled-round replay.
    */
  def train(
      df: DataFrame,
      textCol: String,
      rounds: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = df.sparkSession
    val wc: Array[(String, Long)] = wordCounts(df, textCol)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val syms: Array[Array[String]] = wc.map(_._1.split(""))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < rounds && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < syms.length) {
        val ss = syms(i)
        val n = wc(i)._2
        var j = 0
        while (j + 1 < ss.length) {
          val k = (ss(j), ss(j + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          j += 1
        }
        i += 1
      }
      if (counts.isEmpty) { exhausted = true }
      else {
        var best: ((String, String), Long) = null
        counts.foreach { e =>
          if (best == null || e._2 > best._2 ||
            (e._2 == best._2 &&
              utf8Less(e._1._1 + " " + e._1._2, best._1._1 + " " + best._1._2)))
            best = e
        }
        val ((l, r), cnt) = best
        merges += ((round, l, r, cnt))
        i = 0
        while (i < syms.length) { syms(i) = mergeOnce(syms(i), l, r); i += 1 }
        round += 1
      }
    }
    val vocabRows = wc.indices.map(i => (wc(i)._1, wc(i)._2, syms(i).mkString(" ")))
    val vocab = spark.createDataFrame(vocabRows).toDF("word", "n", "sym")
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

  /** End-of-word marker for the decodable token stream (the original
    * Sennrich '16 BPE convention). Applied AFTER the merges, so the
    * certified per-word merge semantics of [[encode]] are untouched;
    * corpus words must not contain the marker literally (true of any
    * whitespace-tokenized text — the marker contains `<`, `/`, `>`
    * in a sequence no natural token uses; encodeMarked requires it).
    */
  val EndOfWord = "</w>"

  /** [[encode]] plus the `</w>` suffix on each word's final symbol —
    * the token stream becomes losslessly decodable because word
    * boundaries survive the flatten. Same merges, same greedy
    * application; only the final symbol per word is suffixed.
    */
  def encodeMarked(
      df: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      spark: SparkSession): DataFrame = {
    val bc = spark.sparkContext.broadcast(merges)
    val encodeUdf = udf { (text: String) =>
      (if (text == null) Array.empty[String]
       else text.split(" ")).filter(_.nonEmpty).flatMap { w =>
        require(!w.contains(EndOfWord),
          s"word contains the reserved end-of-word marker: $w")
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
        ss.init :+ (ss.last + EndOfWord)
      }
    }
    df.withColumn("tokens", encodeUdf(col(textCol)))
  }

  /** Inverse of [[encodeMarked]]: concatenate the tokens and turn each
    * end-of-word marker into a single space. Pure codegen'd column
    * arithmetic (no UDF): decode(encodeMarked(x)) equals x's
    * single-space word normalization exactly — the losslessness
    * property an LLM pipeline asserts before committing to a
    * tokenizer (detokenization round-trip).
    */
  def decode(df: DataFrame, tokensCol: String, outCol: String = "decoded"): DataFrame =
    df.withColumn(
      outCol,
      rtrim(regexp_replace(
        array_join(col(tokensCol), ""),
        java.util.regex.Pattern.quote(EndOfWord), " ")))
}
