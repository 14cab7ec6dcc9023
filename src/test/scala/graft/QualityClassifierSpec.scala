package graft

import graft.text.QualityClassifier
import graft.text.QualityClassifier.{FtModel, Scale}

/** fastText-style quality gate: feature accounting (unigrams +
  * bigrams), exact fixed-point weight math, save/load round-trip,
  * null/empty handling, partitioning invariance — on a corpus where
  * the positive and negative vocabularies are hand-separable.
  */
class QualityClassifierSpec extends SparkTestBase {
  import spark.implicits._

  // positives speak {good, fine}; negatives speak {bad, spam}
  private lazy val docs = Seq(
    (1L, "good fine good"),
    (2L, "good good fine fine"),
    (3L, "bad spam bad"),
    (4L, "good bad"),
    (5L, null: String),
    (6L, ""),
    (7L, "solo")
  ).toDF("doc_id", "text")

  private lazy val pos = docs.filter($"doc_id" <= 2L)
  private lazy val neg = docs.filter($"doc_id" === 3L || $"doc_id" === 4L)
  private lazy val model = QualityClassifier.fit(pos, neg, "text", buckets = 256)

  private def scored = QualityClassifier
    .scoreWithModel(docs, model, "doc_id", "text")
    .select($"doc_id", $"n_feats", $"w_sum", $"score", $"keep")
    .as[(Long, Long, Long, Double, Boolean)]
    .collect()
    .map(r => r._1 -> r)
    .toMap

  test("n_feats counts unigrams plus bigrams") {
    assert(scored(1L)._2 == 5L) // 3 unigrams + 2 bigrams
    assert(scored(7L)._2 == 1L) // single token: no bigram
    assert(scored(5L)._2 == 0L && scored(6L)._2 == 0L)
  }

  test("positive-vocabulary docs keep, negative-vocabulary docs drop") {
    assert(scored(1L)._5, scored(1L).toString)
    assert(scored(2L)._5, scored(2L).toString)
    assert(!scored(3L)._5, scored(3L).toString)
  }

  test("weights are the exact floor-divided smoothed probability difference") {
    // replay fit from first principles on the tiny corpus
    val np = QualityClassifier.featureCounts(pos, "text", 256)
    val nn = QualityClassifier.featureCounts(neg, "text", 256)
    val bigNp = BigInt(np.sum) + 256
    val bigNn = BigInt(nn.sum) + 256
    val expect = Array.tabulate(256) { f =>
      (BigInt(Scale) * (BigInt(np(f)) + 1) / bigNp -
        BigInt(Scale) * (BigInt(nn(f)) + 1) / bigNn).toLong
    }
    assert(model.w.toSeq == expect.toSeq)
    // and the doc-level sums are the exact inner products
    val counts = new Array[Long](256)
    // doc 3 = bad spam bad + bigrams (bad spam, spam bad)
    val s3 = scored(3L)
    assert(s3._2 == 5L)
    assert(s3._4 == s3._3.toDouble / (s3._2.toDouble * Scale.toDouble))
  }

  test("null and empty docs score zero and never keep") {
    for (id <- Seq(5L, 6L)) {
      val (_, n, w, sc, keep) = scored(id)
      assert(n == 0L && w == 0L && sc == 0.0d && !keep)
    }
  }

  test("save/load round-trips the model exactly") {
    val path = java.nio.file.Files
      .createTempFile("ftmodel", ".tsv").toString
    QualityClassifier.save(model, path)
    val back = QualityClassifier.load(path)
    assert(back.buckets == model.buckets)
    assert(back.w.toSeq == model.w.toSeq)
    // loaded model scores identically — the external-trainer seam
    val a = QualityClassifier.scoreWithModel(docs, back, "doc_id", "text")
      .select("doc_id", "w_sum", "keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val b = QualityClassifier.scoreWithModel(docs, model, "doc_id", "text")
      .select("doc_id", "w_sum", "keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(a == b)
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
  }

  test("load rejects a file without the buckets header") {
    val path = java.nio.file.Files.createTempFile("ftbad", ".tsv")
    java.nio.file.Files.write(path, "0\t1\n".getBytes)
    intercept[IllegalArgumentException] {
      QualityClassifier.load(path.toString)
    }
    java.nio.file.Files.deleteIfExists(path)
  }

  test("scores are invariant to input partitioning") {
    val a = QualityClassifier
      .scoreWithModel(docs.repartition(7), model, "doc_id", "text")
      .select("doc_id", "n_feats", "w_sum", "keep")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val b = QualityClassifier
      .scoreWithModel(docs.coalesce(1), model, "doc_id", "text")
      .select("doc_id", "n_feats", "w_sum", "keep")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("theta raises the bar monotonically") {
    val keep0 = scored.values.count(_._5)
    val strict = QualityClassifier
      .scoreWithModel(docs, model, "doc_id", "text", thetaNano = Scale / 10)
      .select($"keep").as[Boolean].collect().count(identity)
    assert(strict <= keep0)
  }

  test("fit rejects non-power-of-two buckets") {
    intercept[IllegalArgumentException] {
      QualityClassifier.fit(pos, neg, "text", buckets = 100)
    }
  }

  test("fuzzy decontamination flags the near-duplicate of a bench item") {
    import graft.text.TextAnalysis
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup
      (2L, "completely different words about other things entirely"),
      (3L, "xx") // too short for shingles
    ).toDF("doc_id", "text")
    val out = TextAnalysis
      .decontaminateFuzzy(corpus, bench, "doc_id", "text",
        n = 3, bands = 8, rowsPerBand = 4, minJaccard = 0.3)
      .select($"doc_id", $"n_bench_matches", $"max_jaccard", $"contaminated")
      .as[(Long, Long, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L)._4 && out(1L)._2 == 1L && out(1L)._3 > 0.3)
    assert(!out(2L)._4 && out(2L)._3 == 0.0d)
    assert(!out(3L)._4) // shingle-free docs pass through unflagged
    assert(out.size == 3) // every corpus doc gets a verdict row
  }
}
