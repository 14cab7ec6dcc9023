package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Randomized-fixture hardening for the third-pass transforms: one
  * seeded corpus of adversarial BMP strings (mixed scripts, repeated
  * runs, punctuation, length 0..~200) driven through each op in a
  * single Spark pass, invariants recomputed independently driver-side.
  * Catches the class of bug a curated fixture can miss (boundary
  * arithmetic on odd lengths, unicode surprises, degenerate repeats).
  */
class RandomizedTransformSpec extends SparkTestBase {
  import spark.implicits._

  // deterministic corpus: ASCII words, CJK/Cyrillic runs, punctuation,
  // repeats — seeded so failures reproduce
  private lazy val corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(20260814L)
    val pools = Array(
      "abcdefghij klmnopqrst",
      "你好世界 数据 管道 训练",
      "привет мир данные",
      "a!b?c;d: e,f.g",
      "xx xx xx xx xx xx")
    (0L until 120L).map { i =>
      val n = rnd.nextInt(40)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        val p = pools(rnd.nextInt(pools.length))
        val w = p.split(" ")(rnd.nextInt(p.split(" ").length))
        if (sb.nonEmpty) sb.append(' ')
        sb.append(if (rnd.nextBoolean()) w else w * (1 + rnd.nextInt(3)))
      }
      (i, sb.toString)
    }
  }

  private lazy val df = corpus.toDF("doc_id", "text")

  test("spanCorrupt survives adversarial inputs: reassembly + bounds for all rows") {
    val out = TextAnalysis
      .spanCorrupt(df, "doc_id", "text", nSpans = 3, maxSpanTokens = 4)
      .collect()
    val textOf = corpus.toMap
    assert(out.length == corpus.length)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val orig = textOf(id)
      val nTok = orig.split(" ", -1).length
      val n = r.getAs[Long]("n_spans")
      val m = r.getAs[Long]("masked_tokens")
      assert(n >= 0 && n <= 3 && m <= nTok, s"doc $id")
      // splice target spans back into the input at their sentinels
      var rebuilt = r.getAs[String]("input_text")
      val target = r.getAs[String]("target_text")
      var k = 0
      target.split("<extra_id_\\d>").filter(_.nonEmpty).foreach { s =>
        while (k < 3 && !rebuilt.contains(s"<extra_id_$k>")) k += 1
        if (k < 3) { rebuilt = rebuilt.replaceFirst(s"<extra_id_$k>",
          java.util.regex.Matcher.quoteReplacement(s)); k += 1 }
      }
      // drop any leftover sentinels for empty spans, then compare tokens
      val cleaned = rebuilt.replaceAll("<extra_id_\\d>", "")
      assert(cleaned.split(" ").filter(_.nonEmpty).toSeq ==
        orig.split(" ").filter(_.nonEmpty).toSeq, s"doc $id")
    }
  }

  test("cdcChunkDedup survives adversarial inputs: deterministic, bounded, lossless when nothing drops") {
    val run1 = graft.dedup.Dedup.cdcChunkDedup(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_text"))).toMap
    val run2 = graft.dedup.Dedup.cdcChunkDedup(df, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"),
          r.getAs[String]("clean_text"))).toMap
    assert(run1 == run2) // content-defined → partition/run invariant
    val textOf = corpus.toMap
    run1.foreach { case (id, (nc, nk, clean)) =>
      val orig = textOf(id)
      assert(nk <= nc)
      assert(clean.length <= orig.length)
      if (orig.isEmpty) assert(nc == 0L && clean.isEmpty)
      else assert(nc >= 1L)
      if (nk == nc) assert(clean == orig, s"doc $id")
    }
  }

  test("unkRareTokens survives adversarial inputs: masks exactly the df<2 tokens") {
    val out = TextAnalysis.unkRareTokens(df, "doc_id", "text", minDf = 2L)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_masked"), r.getAs[String]("clean_text"))).toMap
    // independent df computation (split semantics identical: single
    // spaces, empties preserved by split(" ", -1) == Spark split)
    val dfDocs = corpus
      .flatMap { case (id, t) => t.split(" ", -1).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).distinct.size }
    corpus.foreach { case (id, t) =>
      val toks = t.split(" ", -1)
      val expect = toks.map(w => if (dfDocs(w) < 2) "<unk>" else w)
      val (nm, clean) = out(id)
      // no pool word equals the sentinel, so counting it is unambiguous
      assert(nm == expect.count(_ == "<unk>").toLong, s"doc $id")
      assert(clean == expect.mkString(" "), s"doc $id")
    }
  }
}
