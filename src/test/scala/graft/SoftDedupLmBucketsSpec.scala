package graft

import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** SoftDeDup reweighting + CCNet head/middle/tail LM bucketing. */
class SoftDedupLmBucketsSpec extends SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------------- soft dedup

  test("softDedupWeights: duplicates weighted 1/multiplicity, uniques keep 1") {
    val docs = Seq(
      (1L, "The quick brown fox"),
      (2L, "the quick  brown fox!!"), // normalized dup of 1
      (3L, "a different document entirely"),
      (4L, "THE QUICK BROWN FOX") // normalized dup of 1
    ).toDF("doc_id", "text")
    val out = Dedup.softDedupWeights(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 4)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L, 4L)) {
      assert(byId(id).getAs[Long]("dup_count") == 3L)
      assert(byId(id).getAs[Double]("weight") == 1.0 / 3.0)
    }
    assert(byId(3L).getAs[Long]("dup_count") == 1L)
    assert(byId(3L).getAs[Double]("weight") == 1.0)
  }

  test("softDedupWeights: empty-normalized docs never merge") {
    val docs = Seq(
      (1L, "!!!"),
      (2L, "???"),
      (3L, "..."),
      (4L, "real words here")
    ).toDF("doc_id", "text")
    val out = Dedup.softDedupWeights(docs, "doc_id", "text").collect()
    assert(out.forall(_.getAs[Long]("dup_count") == 1L))
    assert(out.forall(_.getAs[Double]("weight") == 1.0))
  }

  test("softDedupWeights: weights sum to the distinct-content count; eff_tok floors") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine"), // 9 tok, dup
      (2L, "one two three four five six seven eight nine"), // 9 tok, dup
      (3L, "unique content a"),
      (4L, "unique content b")
    ).toDF("doc_id", "text")
    val out = Dedup.softDedupWeights(docs, "doc_id", "text")
    val sumW = out.agg(sum("weight")).collect()(0).getDouble(0)
    assert(sumW == 3.0) // 3 distinct contents
    val dup = out.filter($"doc_id" === 1L).collect()(0)
    assert(dup.getAs[Long]("n_tok") == 9L)
    assert(dup.getAs[Long]("eff_tok") == 4L) // 9 div 2
  }

  // ---------------------------------------------------------------- lm buckets

  private def model(pairs: (String, Long)*) = pairs.toDF("bigram", "c2")

  test("lmBuckets: equal-mass terciles in rank order") {
    // one lang, n_tok 4 each, scores strictly descending by hit rate:
    // cuts at 4 and 8 of total 12 -> exactly one doc per bucket
    val docs = Seq(
      (1L, "a b a b", "en"), // 3 bigrams, 2 hits -> 666666
      (2L, "a b c d", "en"), // 3 bigrams, 1 hit  -> 333333
      (3L, "c d e f", "en") // 0 hits -> 0
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis
      .lmBuckets(docs, "doc_id", "text", "lang", model("a b" -> 10L))
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("bucket")).toSeq ==
      Seq("head", "middle", "tail"))
    assert(out.map(_.getAs[Long]("score_key")).toSeq ==
      Seq(666666L, 333333L, 0L))
    assert(out.map(_.getAs[Long]("cum_tok")).toSeq == Seq(4L, 8L, 12L))
    assert(out.forall(_.getAs[Long]("lang_tok") == 12L))
  }

  test("lmBuckets: a doc crossing a cut lands in the later bucket") {
    // n_tok 5,4,3 (total 12, cuts at 4 and 8): the best doc's span
    // [0,5) crosses the first cut -> middle; head is empty
    val docs = Seq(
      (1L, "a b a b a", "en"), // 4 bigrams, 2 hits
      (2L, "a b c d", "en"), // 3 bigrams, 1 hit
      (3L, "c d e", "en") // 0 hits
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis
      .lmBuckets(docs, "doc_id", "text", "lang", model("a b" -> 10L))
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("bucket")).toSeq ==
      Seq("middle", "tail", "tail"))
  }

  test("lmBuckets: languages bucket independently") {
    val docs = Seq(
      (1L, "a b a b", "en"),
      (2L, "c d e f", "en"),
      (3L, "a b a b", "fr"),
      (4L, "c d e f", "fr")
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis
      .lmBuckets(docs, "doc_id", "text", "lang", model("a b" -> 10L))
      .orderBy("doc_id").collect()
    // within each lang: best doc is [0,4) of 8 -> 12<=8 false, 12<=16
    // true -> middle; worst is (4,8] -> tail
    assert(out.map(_.getAs[String]("bucket")).toSeq ==
      Seq("middle", "tail", "middle", "tail"))
    assert(out.forall(_.getAs[Long]("lang_tok") == 8L))
  }

  test("lmBuckets: invariant under input partitioning") {
    val docs = (1L to 60L).map { i =>
      val words = (0 until (i % 7 + 2).toInt)
        .map(j => s"w${(i + j) % 11}").mkString(" ")
      (i, words, if (i % 3 == 0) "fr" else "en")
    }.toDF("doc_id", "text", "lang")
    val m = TextAnalysis.bigramModel(
      docs.filter($"doc_id" % 2 === 0), "text", minCount = 1L)
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.lmBuckets(d, "doc_id", "text", "lang", m)
        .select("doc_id", "score_key", "cum_tok", "bucket")
        .orderBy("doc_id").collect().toSeq
    assert(run(docs) == run(docs.repartition(7)))
  }
}
