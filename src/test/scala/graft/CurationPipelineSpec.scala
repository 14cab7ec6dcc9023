package graft

import graft.text.CurationPipeline

/** The composed text-curation pass: funnel monotonicity, dedup
  * behavior, redaction, and packing consistency on crafted docs.
  */
class CurationPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and the cat sleeps"),
    (2L, "the quick brown fox jumps over the lazy dog and the cat sleeps"), // exact dup
    (3L, "the quick brown fox jumps over the lazy dog and the cat naps today"), // near dup
    (4L, "el perro de la casa y los gatos de las calles por la noche"),
    (5L, "contact me at leak@example.com about the dataset of the archives and the rest"),
    (6L, "xz qq ww"), // fails min-token / stopword gates
    (7L, "the data of the table in the hash and the sort of it is a thing")
  ).toDF("doc_id", "text")

  private lazy val out = CurationPipeline.run(
    docs, "doc_id", "text",
    CurationPipeline.Config(minQuality = 0.25, minTokens = 8, nearDupJaccard = 0.6,
      chunkTokens = 8, chunkOverlap = 2, seqLen = 16))

  test("funnel is monotonically decreasing and drops the dups") {
    val f = out.funnel.toMap
    assert(f("input") == 7L)
    assert(f("lang_quality_gate") < 7L)       // doc 6 gone
    assert(f("exact_dedup") == f("lang_quality_gate") - 1) // doc 2 gone
    assert(f("near_dedup") == f("exact_dedup") - 1)        // doc 3 gone
    val ids = out.docs.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(2L) && !ids.contains(3L) && !ids.contains(6L))
    assert(ids.contains(1L)) // canonical survives
  }

  test("useLmGate without a model is rejected, not silently skipped") {
    val ex = intercept[IllegalArgumentException] {
      CurationPipeline.run(docs, "doc_id", "text",
        CurationPipeline.Config(useLmGate = true, lmModel = None))
    }
    assert(ex.getMessage.contains("useLmGate requires lmModel"))
  }

  test("PII is redacted in surviving text") {
    val t5 = out.docs.filter($"doc_id" === 5L).select("clean_text").as[String].head()
    assert(t5.contains("<EMAIL>"))
    assert(!t5.contains("leak@example.com"))
  }

  test("chunks cover every surviving doc and respect the token cap") {
    val perDoc = out.chunks.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ids = out.docs.select("doc_id").as[Long].collect().toSet
    assert(perDoc.keySet == ids)
    out.chunks.collect().foreach(r => assert(r.getAs[Long]("n_tok") <= 8L))
  }

  test("packing offsets are contiguous and sequence ids consistent") {
    val rows = out.packing.orderBy("doc_id").collect()
    var expectedStart = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("start_off") == expectedStart)
      expectedStart = r.getAs[Long]("end_off")
      assert(r.getAs[Long]("first_seq") == r.getAs[Long]("start_off") / 16)
    }
  }

  test("optional LM gate drops model-unexplained docs and records its funnel stage") {
    // model trained on docs 1/3/7-style English: doc 4 (Spanish) would
    // already fail langid; use a crafted model that only explains doc 7
    val model = graft.text.TextAnalysis.bigramModel(
      Seq((100L, "the data of the table in the hash and the sort of it is a thing"))
        .toDF("doc_id", "text"),
      "text", minCount = 1L)
    val gated = CurationPipeline.run(
      docs, "doc_id", "text",
      CurationPipeline.Config(minQuality = 0.25, minTokens = 8, nearDupJaccard = 0.6,
        useLmGate = true, lmModel = Some(model), lmMinHitPermille = 900,
        chunkTokens = 8, chunkOverlap = 2, seqLen = 16))
    val f = gated.funnel.toMap
    assert(f.contains("lm_gate"))
    assert(f("lm_gate") <= f("lang_quality_gate"))
    val ids = gated.docs.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(7L)) // only the doc the model explains survives
    gated.unpersist()
  }

  test("optional substring dedup cuts duplicated windows from non-canonical docs") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, s"the first document says $shared and the rest of it is a thing"),
      (2L, s"the second document says $shared but the tail here is different"),
      (3L, "the third document is about the sort and the hash of the table")
    ).toDF("doc_id", "text")
    val outSub = CurationPipeline.run(
      corpus, "doc_id", "text",
      CurationPipeline.Config(minQuality = 0.0, minTokens = 4, nearDupJaccard = 0.95,
        useSubstringDedup = true,
        chunkTokens = 8, chunkOverlap = 2, seqLen = 16))
    val f = outSub.funnel.toMap
    assert(f.contains("near_substring_dedup"))
    val texts = outSub.docs.orderBy("doc_id")
      .select("clean_text").as[String].collect()
    assert(texts(0).contains("gamma delta"))  // canonical keeps the span
    assert(!texts(1).contains("gamma delta")) // later copy loses it
    assert(texts(2).contains("third document"))
    outSub.unpersist()
  }

  test("urlCol front door dedups canonical-URL variants before the gates") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today",
        "HTTP://Site.COM:80/p/1/?utm_source=x&id=7"),
      (2L, "a completely different text about the spark engine rows",
        "http://site.com/p/1?id=7#top"), // same canonical URL as 1 → dropped
      (3L, "the third document is about the cats of the old town",
        "http://site.com/p/2?id=8")
    ).toDF("doc_id", "text", "url")
    val outUrl = CurationPipeline.run(
      corpus, "doc_id", "text",
      CurationPipeline.Config(minQuality = 0.0, minTokens = 4,
        urlCol = Some("url"), chunkTokens = 8, chunkOverlap = 2, seqLen = 16))
    val f = outUrl.funnel.toMap
    assert(f("input") == 3L && f("url_dedup") == 2L)
    val ids = outUrl.docs.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L)) // min id per canonical URL survives
    outUrl.unpersist()
  }

  test("repetition gate drops the pathological repeater, keeps normal prose") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then the story continues with more varied words here today"),
      // stopword 'the' keeps it lang='en'; the cycling 2-grams each
      // dominate far past the 20% cap and distinct ratio is 4/120
      (2L, ("buy the item now " * 30).trim)
    ).toDF("doc_id", "text")
    val cfg = graft.text.CurationPipeline.Config(
      useRepetitionGate = true, minTokens = 1L)
    val out = graft.text.CurationPipeline.run(docs, "doc_id", "text", cfg)
    val ids = out.docs.select("doc_id").as[Long].collect().toSet
    out.unpersist()
    assert(ids.contains(1L) && !ids.contains(2L))
    // off by default: the repeater survives the gates
    val out2 = graft.text.CurationPipeline.run(docs, "doc_id", "text",
      graft.text.CurationPipeline.Config(minTokens = 1L))
    val ids2 = out2.docs.select("doc_id").as[Long].collect().toSet
    out2.unpersist()
    assert(ids2.contains(2L))
  }

  test("paragraphDedupWords stage rewrites docs and drops emptied ones") {
    val corpus = Seq(
      (1L, "the cat and the dog sat on the mat by noon"),
      (2L, "the cat and the dog ran to the old red barn"),
      (3L, "the cat and the") // every paragraph already seen → dropped
    ).toDF("doc_id", "text")
    val outPara = CurationPipeline.run(
      corpus, "doc_id", "text",
      CurationPipeline.Config(minQuality = 0.0, minTokens = 2,
        nearDupJaccard = 0.95, paragraphDedupWords = Some(4),
        chunkTokens = 8, chunkOverlap = 2, seqLen = 16))
    val f = outPara.funnel.toMap
    assert(f.contains("near_paragraph_dedup"))
    val texts = outPara.docs.orderBy("doc_id")
      .select("clean_text").as[String].collect()
    assert(texts(0) == "the cat and the dog sat on the mat by noon")
    assert(texts(1) == "dog ran to the old red barn") // shared 4-word para cut
    val ids = outPara.docs.select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L)) // doc 3 emptied and dropped
    outPara.unpersist()
  }
}
