package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over the corpus — the curation uses are targeted
  * inspection ("show me the docs that mention X and Y"), contamination
  * spot-checks, and seed-set mining for classifier gates (the
  * fastText-style QualityClassifier's positive set is exactly a
  * keyword slice in the RedPajama-2 recipe).
  *
  * Scale shape: term matching is a broadcast join of the (tiny) term
  * set against the exploded token stream — Spark turns it into a
  * build-side hash filter next to the scan, so the corpus-sized
  * explode never shuffles unmatched tokens; per-doc conjunction and
  * tf totals are one keyed aggregation over matched rows only, and
  * ranking is TakeOrderedAndProject (top-k heap, never a global
  * sort). The index-build face caps posting lists with the native
  * TopKPerKey operator (impact-ordered truncation, the WAND-family
  * layout), so no stopword can materialize a corpus-sized array.
  */
object Search {

  /** (token, df_docs, postings) with postings truncated to the
    * `maxPostings` highest-tf docs (ties → lower doc first) — the
    * impact-ordered index layout. df_docs counts ALL matching docs
    * (computed before the cap).
    */
  def invertedIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxPostings: Int = 1000
  ): DataFrame = {
    val tf = df
      .select(col(idCol).as("doc"), explode(split(col(textCol), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy("token", "doc")
      .agg(count(lit(1)).as("tf"))
    val dfDocs = tf.groupBy("token").agg(count(lit(1)).as("df_docs"))
    val capped = graft.plans.TopKPerKey.topKPerKey(
      tf, Seq(col("token")), Seq(col("tf").desc, col("doc").asc), maxPostings)
    capped
      .groupBy("token")
      .agg(sort_array(collect_list(struct(
        (-col("tf")).as("neg_tf"), col("doc"), col("tf")))).as("__p"))
      .join(dfDocs, Seq("token"))
      .select(col("token"), col("df_docs"),
        transform(col("__p"), x =>
          struct(x.getField("doc").as("doc"), x.getField("tf").as("tf")))
          .as("postings"))
  }

  /** Conjunctive (all-terms) retrieval: the `k` documents containing
    * EVERY term in `terms`, ranked by total term frequency (ties →
    * lower id). Returns (hit_rank, idCol, total_tf).
    */
  def searchAll(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: DataFrame, // single string column "term"
      k: Int
  ): DataFrame = {
    // a duplicated term row would double its tf contribution AND make
    // the conjunction count unreachable — dedupe defensively
    val uniq = terms.distinct()
    val nTerms = uniq.agg(count(lit(1)).cast("long").as("n_terms"))
    val tf = df
      .select(col(idCol), explode(split(col(textCol), " ")).as("token"))
      .join(broadcast(uniq), col("token") === col("term"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val hits = tf
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("matched"), sum(col("tf")).cast("long").as("total_tf"))
      .crossJoin(broadcast(nTerms))
      .filter(col("matched") === col("n_terms"))
    val top = hits
      .select(col(idCol), col("total_tf"))
      .orderBy(col("total_tf").desc, col(idCol).asc)
      .limit(k)
    // row_number over the already-limited k rows — never a global sort
    top.withColumn("hit_rank",
        row_number().over(Window.orderBy(col("total_tf").desc, col(idCol).asc))
          .cast("long"))
      .select(col("hit_rank"), col(idCol), col("total_tf"))
  }

  /** Deterministic data-derived query terms for the oracle face: the
    * corpus vocabulary's rank `lo..hi` tokens by (corpus tf desc,
    * token asc) — a top-k heap (limit hi), never a vocabulary-wide
    * window.
    */
  def vocabTerms(df: DataFrame, textCol: String, lo: Int, hi: Int): DataFrame = {
    val vocab = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w")
      .agg(count(lit(1)).as("tfc"))
      .orderBy(col("tfc").desc, col("w").asc)
      .limit(hi)
    vocab
      .withColumn("rn",
        row_number().over(Window.orderBy(col("tfc").desc, col("w").asc)))
      .filter(col("rn").between(lo, hi))
      .select(col("w").as("term"))
  }
}
