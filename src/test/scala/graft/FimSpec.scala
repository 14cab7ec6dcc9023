package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Deterministic fill-in-the-middle transform. */
class FimSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = (1L to 200L)
    .map(i => (i, s"doc $i " + ("abcdefghij " * (i % 5 + 1).toInt).trim))
    .toDF("doc_id", "text")

  test("PSM reassembly reconstructs the original text exactly") {
    val out = TextAnalysis.fimTransform(docs, "doc_id", "text")
      .join(docs, "doc_id")
      .filter($"fim_applied")
      .collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val t = r.getAs[String]("fim_text")
      val orig = r.getAs[String]("text")
      val pre = t.indexOf("<fim_prefix>")
      val suf = t.indexOf("<fim_suffix>")
      val mid = t.indexOf("<fim_middle>")
      assert(pre == 0 && suf > 0 && mid > suf)
      val prefix = t.substring("<fim_prefix>".length, suf)
      val suffix = t.substring(suf + "<fim_suffix>".length, mid)
      val middle = t.substring(mid + "<fim_middle>".length)
      assert(prefix + middle + suffix == orig)
      val lo = r.getAs[Long]("cut_lo")
      val hi = r.getAs[Long]("cut_hi")
      assert(prefix.length == lo && middle.length == hi - lo)
      assert(0 <= lo && lo <= hi && hi <= orig.length)
    }
  }

  test("pass-through rows keep the original text and null cuts") {
    val out = TextAnalysis.fimTransform(docs, "doc_id", "text")
      .join(docs, "doc_id")
      .filter(!$"fim_applied")
      .collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getAs[String]("fim_text") == r.getAs[String]("text"))
      assert(r.isNullAt(r.fieldIndex("cut_lo")))
    }
  }

  test("apply rate tracks the hex threshold and is id-deterministic") {
    val out = TextAnalysis.fimTransform(docs, "doc_id", "text")
    val n = out.filter($"fim_applied").count()
    assert(n > 60 && n < 140) // ~50% of 200
    val again = TextAnalysis
      .fimTransform(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(again == out.orderBy("doc_id").collect().toSeq)
  }

  test("SPM mode reorders to suffix-prefix-middle with joined prefix+middle") {
    val out = TextAnalysis
      .fimTransform(docs, "doc_id", "text", mode = "spm")
      .join(docs, "doc_id")
      .filter($"fim_applied")
      .collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val t = r.getAs[String]("fim_text")
      val orig = r.getAs[String]("text")
      val lo = r.getAs[Long]("cut_lo").toInt
      val hi = r.getAs[Long]("cut_hi").toInt
      val expected = "<fim_prefix>" + "<fim_suffix>" + orig.substring(hi) +
        "<fim_middle>" + orig.substring(0, lo) + orig.substring(lo, hi)
      assert(t == expected)
    }
    // cuts are identical across modes (same salt)
    val psmCuts = TextAnalysis.fimTransform(docs, "doc_id", "text")
      .select("doc_id", "cut_lo", "cut_hi").orderBy("doc_id").collect().toSeq
    val spmCuts = TextAnalysis.fimTransform(docs, "doc_id", "text", mode = "spm")
      .select("doc_id", "cut_lo", "cut_hi").orderBy("doc_id").collect().toSeq
    assert(psmCuts == spmCuts)
  }

  test("empty document survives with empty spans") {
    val d = Seq((1L, ""), (2L, "x")).toDF("doc_id", "text")
    val rows = TextAnalysis.fimTransform(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    for (r <- rows if r.getAs[Boolean]("fim_applied")) {
      val t = r.getAs[String]("fim_text")
      assert(t.startsWith("<fim_prefix>"))
    }
  }
}
