package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-based n-gram language model with Stupid Backoff smoothing
  * (Brants et al. '07, "Large Language Models in Machine Translation"
  * — the scoring scheme DESIGNED for distributed trillion-token count
  * tables: no discount normalization pass, so fit is nothing but
  * counting). The CCNet-style curation use: score corpus documents
  * against an LM fit on a trusted corpus and gate/bucket on the
  * scores (see TextAnalysis.lmBuckets for the hit-rate face; this is
  * the real count-LM face).
  *
  * Scores are exact rationals: S(w2|w1) = c2(w1,w2)/c1(w1) when the
  * bigram was seen, else α·c1(w2)/T with α = 2/5 — emitted as integer
  * (num, den) pairs (2·c1(w2), 5·T), so nothing floats and every row
  * is oracle-checkable. Callers wanting log-prob sums divide at the
  * end, at whatever precision they choose.
  *
  * Scale shape: fit = two count aggregations whose shuffles carry
  * (token) / (token, token) keys — the Brants et al. MapReduce shape;
  * scoring = one per-row pair expansion (zero shuffle) joined against
  * the count tables by key (sort-merge at corpus scale, broadcast
  * when the model is small). No collects, no driver state.
  */
object NgramLm {

  private def toks(textCol: String) = split(col(textCol), " ")

  /** Unigram count table (w, c1) over space-split tokens. */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(toks(textCol)).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("c1"))

  /** Bigram count table (w1, w2, c2) over adjacent token pairs. */
  def bigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(pairStructs(textCol)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("c2"))

  private def pairStructs(textCol: String) = {
    val t = toks(textCol)
    // sequence(0, -1) descends rather than erroring — guard < 2 tokens
    when(size(t) >= 2,
      transform(
        sequence(lit(0), size(t) - 2),
        i => struct(element_at(t, i + 1).as("w1"), element_at(t, i + 2).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
  }

  /** (idCol, pos, w1, w2) adjacent-pair rows — one per-row expansion,
    * zero shuffle; docs with < 2 tokens contribute nothing.
    */
  def pairRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.filter(size(toks(textCol)) >= 2)
      .select(col(idCol), posexplode(pairStructs(textCol)).as(Seq("pos", "p")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))

  private def tripleStructs(textCol: String) = {
    val t = toks(textCol)
    when(size(t) >= 3,
      transform(
        sequence(lit(0), size(t) - 3),
        i => struct(element_at(t, i + 1).as("w1"),
          element_at(t, i + 2).as("w2"), element_at(t, i + 3).as("w3"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string,w3:string>>"))
  }

  /** Trigram count table (w1, w2, w3, c3) over adjacent token triples. */
  def trigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tripleStructs(textCol)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"), col("p.w3").as("w3"))
      .groupBy("w1", "w2", "w3")
      .agg(count(lit(1)).as("c3"))

  /** Trigram Stupid Backoff: per adjacent triple (idCol, pos,
    * backoff_level, num, den) — level 3 = trigram hit c3/c2(w1w2),
    * 2 = bigram backoff 2·c2(w2w3) / 5·c1(w2), 1 = unigram backoff
    * 4·c1(w3) / 25·T (α² = 4/25), 0 = OOV (0/1). Same pure-counting
    * fit as the bigram face; the count tables just gain one key
    * column per order — the Brants et al. scaling argument verbatim.
    */
  def stupidBackoffScoreTrigram(
      fitDf: DataFrame,
      scoreDf: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    val uni = unigramCounts(fitDf, textCol)
    val bi = bigramCounts(fitDf, textCol)
    val tri = trigramCounts(fitDf, textCol)
    val total = uni.agg(sum(col("c1")).cast("long").as("t_tokens"))
    val triples = scoreDf
      .filter(size(toks(textCol)) >= 3)
      .select(col(idCol), posexplode(tripleStructs(textCol)).as(Seq("pos", "p")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        col("p.w1").as("w1"), col("p.w2").as("w2"), col("p.w3").as("w3"))
    triples
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(bi.select(col("w1"), col("w2"), col("c2").as("c2_ctx")),
        Seq("w1", "w2"), "left")
      .join(bi.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c2").as("c2_nxt")), Seq("w2", "w3"), "left")
      .join(uni.select(col("w").as("w2"), col("c1").as("c1_w2")), Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("c1").as("c1_w3")), Seq("w3"), "left")
      .crossJoin(broadcast(total))
      .select(
        col(idCol),
        col("pos"),
        when(col("c3").isNotNull, 3L)
          .when(col("c2_nxt").isNotNull, 2L)
          .when(col("c1_w3").isNotNull, 1L)
          .otherwise(0L).as("backoff_level"),
        when(col("c3").isNotNull, col("c3"))
          .when(col("c2_nxt").isNotNull, col("c2_nxt") * 2L)
          .when(col("c1_w3").isNotNull, col("c1_w3") * 4L)
          .otherwise(0L).cast("long").as("num"),
        when(col("c3").isNotNull, col("c2_ctx"))
          .when(col("c2_nxt").isNotNull, col("c1_w2") * 5L)
          .when(col("c1_w3").isNotNull, col("t_tokens") * 25L)
          .otherwise(1L).cast("long").as("den"))
  }

  /** Score `scoreDf`'s adjacent pairs against a model fit on `fitDf`:
    * per pair (idCol, pos, backoff_level, num, den) where level 2 =
    * bigram hit (c2/c1(w1)), 1 = unigram backoff (2·c1(w2) / 5·T),
    * 0 = OOV (0/1).
    */
  def stupidBackoffScore(
      fitDf: DataFrame,
      scoreDf: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    val uni = unigramCounts(fitDf, textCol)
    val bi = bigramCounts(fitDf, textCol)
    val total = uni.agg(sum(col("c1")).cast("long").as("t_tokens"))
    pairRows(scoreDf, idCol, textCol)
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni.select(col("w").as("w1"), col("c1").as("c1_w1")), Seq("w1"), "left")
      .join(uni.select(col("w").as("w2"), col("c1").as("c1_w2")), Seq("w2"), "left")
      .crossJoin(broadcast(total))
      .select(
        col(idCol),
        col("pos"),
        when(col("c2").isNotNull, 2L)
          .when(col("c1_w2").isNotNull, 1L)
          .otherwise(0L).as("backoff_level"),
        when(col("c2").isNotNull, col("c2"))
          .when(col("c1_w2").isNotNull, col("c1_w2") * 2L)
          .otherwise(0L).cast("long").as("num"),
        when(col("c2").isNotNull, col("c1_w1"))
          .when(col("c1_w2").isNotNull, col("t_tokens") * 5L)
          .otherwise(1L).cast("long").as("den"))
  }
}
