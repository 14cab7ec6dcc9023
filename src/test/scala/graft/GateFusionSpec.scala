package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** The fused one-pass gate UDF must reproduce the composed column
  * formulation (langId + qualityScore + tokenCountWs) EXACTLY —
  * including the double arithmetic of qualityScore — on the real
  * corpus and on adversarial edge strings.
  */
class GateFusionSpec extends SparkTestBase {
  import spark.implicits._

  private def bothWays(df: org.apache.spark.sql.DataFrame) = {
    val composed = df
      .withColumn("lang_c", TextAnalysis.langId(col("text")))
      .withColumn("q_c", TextAnalysis.qualityScore(col("text")))
      .withColumn("n_c", TextAnalysis.tokenCountWs(col("text")))
    TextAnalysis.withGateSignals(composed, "text")
  }

  test("fused gate equals composed columns on the documents corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cmp = bothWays(docs)
    val bad = cmp.filter(
      !(col("lang_pred") <=> col("lang_c")) ||
        !(col("quality") <=> col("q_c")) ||
        !(col("n_tok") <=> col("n_c"))).count()
    assert(bad == 0L, s"$bad docs diverge")
    assert(cmp.count() == docs.count())
  }

  test("fused gate equals composed columns on edge strings") {
    val edge = Seq(
      null.asInstanceOf[String],
      "", " ", "   ",
      "the", "the the the", "der die und das",
      "el la de los un una por",
      "le la et les des un une du",
      "一", "hello 中文 world",
      "a.b,c!d?e;f:g", "....", "x", "x y",
      "the quick brown fox, and the lazy dog. it is!",
      "word " * 100 + "end"
    ).toDF("text")
    val cmp = bothWays(edge)
    val rows = cmp.select("text", "lang_pred", "lang_c", "quality", "q_c", "n_tok", "n_c").collect()
    rows.foreach { r =>
      assert(r.get(1) == r.get(2), s"lang: ${r.get(0)} -> ${r.get(1)} vs ${r.get(2)}")
      assert(r.get(3) == r.get(4), s"quality: ${r.get(0)} -> ${r.get(3)} vs ${r.get(4)}")
      assert(r.get(5) == r.get(6), s"n_tok: ${r.get(0)} -> ${r.get(5)} vs ${r.get(6)}")
    }
  }
}
