package graft.text

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** fastText-style hashed-feature quality classifier — the gate shape
  * modern corpus pipelines put in front of pretraining data (DCLM's
  * fastText baseline filter, FineWeb-Edu's quality classifier; Joulin
  * et al. '16, "Bag of Tricks for Efficient Text Classification",
  * arXiv:1607.01759): a linear model over hashed unigram + word-bigram
  * features, applied per row at corpus scale.
  *
  * Shape at scale (the 100 TB contract):
  *
  *  - Features are unigrams plus space-joined word bigrams
  *    (fastText's `wordNgrams=2` default for this use), FNV-1a hashed
  *    into `buckets` cells ([[Dsir.fnvBucket]] — the same fold every
  *    hashed-feature gate in the repo replays in DuckDB). The feature
  *    space is `buckets` cells regardless of vocabulary, exactly
  *    fastText's hashing trick.
  *  - The model is a buckets-sized weight vector of FIXED-POINT longs
  *    (1e-9 units). Inference is one compiled per-row map over the
  *    broadcast array — zero shuffle, zero join, stateless, so it
  *    composes with readStream unchanged (the Dsir gate contract).
  *  - The KEEP decision is integer-exact: mean feature weight >=
  *    theta compares as `w_sum >= theta · n_feats` in long arithmetic
  *    (QueryDef rule 8) — the gate carries no float. A `score` double
  *    (w_sum / (n_feats·1e9)) rides along for ranking; it is one
  *    division of exact longs, IEEE-identical across engines (rule 5),
  *    so it IS oracle-checkable, unlike a libm chain.
  *  - [[fit]] is the one-pass count trainer: each class aggregates to
  *    a BUCKETS-sized count table (collected once — the IVF-codebook /
  *    DSIR-fit pattern: corpus-sized passes producing driver-metadata-
  *    sized state), and weights derive driver-side in BigInt as
  *    floor-divided Laplace-smoothed class-conditional probability
  *    differences. That makes the trainer a deterministic integer
  *    pipeline end to end — replayable in DuckDB HUGEINT — while
  *    keeping the production inference seam open: [[load]] accepts a
  *    weight file from ANY external trainer (a real fastText run's
  *    quantized weights, a distilled LM judge), which is how DCLM /
  *    FineWeb actually ship these gates.
  *
  * BMP-only caveat (shared with every FNV replay in the repo): Scala
  * hashes UTF-16 code units, DuckDB's unicode() codepoints — identical
  * on BMP text (the fixture corpus is ASCII).
  */
object QualityClassifier {

  /** Fixed-point scale: weights are stored in units of 1e-9. */
  val Scale: Long = 1000000000L

  /** A trained/loaded model: buckets-sized fixed-point weight vector
    * (driver metadata at any corpus size).
    */
  final case class FtModel(buckets: Int, w: Array[Long]) {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two >= 2, got $buckets")
    require(w.length == buckets, s"weight vector length ${w.length} != buckets $buckets")
  }

  /** Unigram + word-bigram feature stream of one document, appended
    * into the bucket-count array `c`; returns the feature count.
    * Bigrams hash the space-joined token pair, so the DuckDB replay is
    * `tk[i] || ' ' || tk[i+1]` through the same FNV fold.
    */
  private def accumulate(text: String, c: Array[Int], mask: Int): Long = {
    if (text == null) return 0L
    val toks = text.split(" ", -1)
    var n = 0L
    var prev: String = null
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        c(Dsir.fnvBucket(t, mask)) += 1
        n += 1
        if (prev != null) {
          c(Dsir.fnvBucket(prev + " " + t, mask)) += 1
          n += 1
        }
        prev = t
      }
      i += 1
    }
    n
  }

  /** Class feature distribution: counts[f] over hashed unigram+bigram
    * features — a buckets-sized array, one distributed pass.
    */
  def featureCounts(df: DataFrame, textCol: String, buckets: Int): Array[Long] = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two >= 2, got $buckets")
    val mask = buckets - 1
    val featUdf = udf { (text: String) =>
      val c = new Array[Int](mask + 1)
      accumulate(text, c, mask)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var f = 0
      while (f < c.length) { if (c(f) > 0) out += ((f, c(f))); f += 1 }
      out.toSeq
    }
    val counts = new Array[Long](buckets)
    df.select(explode(featUdf(col(textCol))).as("fc"))
      .groupBy(col("fc._1").as("f"))
      .agg(sum(col("fc._2")).as("n"))
      .collect()
      .foreach(r => counts(r.getInt(0)) = r.getLong(1))
    counts
  }

  /** One-pass count trainer: w[f] = floor(1e9·(np[f]+1)/(Np+B)) −
    * floor(1e9·(nn[f]+1)/(Nn+B)) — the fixed-point difference of
    * Laplace-smoothed class-conditional feature probabilities. BigInt
    * keeps the products exact at any corpus size (1e9·count overflows
    * long past ~9e9 tokens); both operands are positive so BigInt
    * truncation == floor == DuckDB `//`.
    */
  def fit(pos: DataFrame, neg: DataFrame, textCol: String, buckets: Int = 256): FtModel = {
    val np = featureCounts(pos, textCol, buckets)
    val nn = featureCounts(neg, textCol, buckets)
    val bigNp = BigInt(np.sum) + buckets
    val bigNn = BigInt(nn.sum) + buckets
    val s = BigInt(Scale)
    val w = Array.tabulate(buckets) { f =>
      (s * (BigInt(np(f)) + 1) / bigNp - s * (BigInt(nn(f)) + 1) / bigNn).toLong
    }
    FtModel(buckets, w)
  }

  /** Persist a model as TSV (`bucket \t weight`, one header line) —
    * the production seam: any external trainer that emits this file
    * drives the same inference path.
    */
  def save(model: FtModel, path: String): Unit = {
    val sb = new StringBuilder(s"buckets\t${model.buckets}\n")
    var f = 0
    while (f < model.buckets) { sb.append(f).append('\t').append(model.w(f)).append('\n'); f += 1 }
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
    ()
  }

  def load(path: String): FtModel = {
    val lines = Files.readAllLines(Paths.get(path), StandardCharsets.UTF_8)
    require(!lines.isEmpty && lines.get(0).startsWith("buckets\t"),
      s"$path: missing 'buckets' header")
    val buckets = lines.get(0).split('\t')(1).toInt
    val w = new Array[Long](buckets)
    var i = 1
    while (i < lines.size) {
      val parts = lines.get(i).split('\t')
      if (parts.length == 2) w(parts(0).toInt) = parts(1).toLong
      i += 1
    }
    FtModel(buckets, w)
  }

  /** Apply a model to any relation — batch table or streaming
    * micro-batch (stateless per-row map over the broadcast weights).
    * Returns (id, n_feats, w_sum, score, keep):
    * n_feats = unigram+bigram feature count (long), w_sum = Σ c_f·w_f
    * (long, exact), score = w_sum/(n_feats·1e9) (one exact-long
    * division — oracle-safe), keep = n_feats>0 ∧ w_sum >= theta·n_feats
    * where theta is in 1e-9 units of mean feature weight. Null/empty
    * docs score (0, 0, 0.0, false).
    */
  def scoreWithModel(
      df: DataFrame,
      model: FtModel,
      idCol: String,
      textCol: String,
      thetaNano: Long = 0L
  ): DataFrame = {
    val spark = df.sparkSession
    val mask = model.buckets - 1
    val bW = spark.sparkContext.broadcast(model.w)
    val scoreUdf = udf { (text: String) =>
      val wA = bW.value
      val c = new Array[Int](mask + 1)
      val n = accumulate(text, c, mask)
      var wSum = 0L
      var f = 0
      while (f < c.length) {
        if (c(f) > 0) wSum += c(f).toLong * wA(f)
        f += 1
      }
      (n, wSum)
    }
    df.select(col(idCol), scoreUdf(col(textCol)).as("s"))
      .select(
        col(idCol),
        col("s._1").as("n_feats"),
        col("s._2").as("w_sum"))
      .withColumn(
        "score",
        when(col("n_feats") > 0L,
          col("w_sum").cast("double") /
            (col("n_feats").cast("double") * lit(Scale.toDouble)))
          .otherwise(lit(0.0d)))
      .withColumn(
        "keep",
        col("n_feats") > 0L && col("w_sum") >= lit(thetaNano) * col("n_feats"))
  }

  /** Fit + apply in one call — the batch face. */
  def score(
      df: DataFrame,
      pos: DataFrame,
      neg: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 256,
      thetaNano: Long = 0L
  ): DataFrame =
    scoreWithModel(df, fit(pos, neg, textCol, buckets), idCol, textCol, thetaNano)
}
