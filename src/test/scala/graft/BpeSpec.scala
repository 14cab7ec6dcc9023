package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._

/** BPE training loop: merge choice, greedy application, multi-round
  * evolution, encode round-trip — on a corpus tiny enough to verify
  * the merges by hand.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // "ab" appears 5x (3 in 'abab' words x2 pairs... kept hand-checkable):
  //   low low low lower lower newest
  private lazy val docs = Seq(
    (1L, "low low low"),
    (2L, "lower lower"),
    (3L, "newest")
  ).toDF("doc_id", "text")

  test("round-1 top pair is the hand-computed winner with deterministic ties") {
    // word counts: low:3 lower:2 newest:1
    // pairs: l-o:5 o-w:5 w-e:3 e-r:2 n-e:1 e-w:1 w-s:1 s-t:1 e-s:1
    val top = Bpe.pairCounts(Bpe.asSymbols(Bpe.wordCounts(docs, "text")))
      .orderBy($"cnt".desc, $"pair".asc).limit(2)
      .as[(String, Long)].collect().toSeq
    // l-o and o-w tie at 5; "l o" < "o w" lexicographically
    assert(top == Seq(("l o", 5L), ("o w", 5L)))
  }

  test("train learns the expected merge sequence and rewrites the vocab") {
    val (merges, vocab) = Bpe.train(docs, "text", rounds = 3)
    assert(merges.map(m => (m._2, m._3)) ==
      Seq(("l", "o"), ("lo", "w"), ("e", "r")))
    assert(merges.head._4 == 5L)
    val syms = vocab.select("word", "sym").as[(String, String)]
      .collect().toMap
    assert(syms("low") == "low")
    assert(syms("lower") == "low er") // round 3 merged (e, r)
    assert(syms("newest") == "n e w e s t")
    vocab.unpersist()
  }

  test("greedy merge application is left-to-right non-overlapping") {
    val v = Seq(("aaa", 1L)).toDF("word", "n")
    val merged = Bpe.applyMerge(Bpe.asSymbols(v), "a", "a")
      .select("sym").as[String].head()
    assert(merged == "aa a")
  }

  test("encode applies merges in learned order") {
    val (merges, vocab) = Bpe.train(docs, "text", rounds = 3)
    vocab.unpersist()
    val toks = Bpe.encode(docs, "text", merges.map(m => (m._2, m._3)), spark)
      .filter($"doc_id" === 2L)
      .select("tokens").as[Seq[String]].head()
    assert(toks == Seq("low", "er", "low", "er"))
  }

  test("encode tolerates null and empty text (no NPE, empty tokens)") {
    val (merges, vocab) = Bpe.train(docs, "text", rounds = 3)
    vocab.unpersist()
    val withNull = Seq((10L, null: String), (11L, ""), (12L, "low"))
      .toDF("doc_id", "text")
    val out = Bpe.encode(withNull, "text", merges.map(m => (m._2, m._3)), spark)
      .select("doc_id", "tokens").as[(Long, Seq[String])]
      .collect().toMap
    assert(out(10L) == Seq.empty)
    assert(out(11L) == Seq.empty)
    assert(out(12L) == Seq("low"))
  }

  test("train stops early when no pairs remain") {
    val single = Seq((1L, "a b c")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(single, "text", rounds = 5)
    assert(merges.isEmpty)
    vocab.unpersist()
  }

  test("train's Spark job count is flat in the merge-round hyperparameter") {
    // The r9 scale fix, measured: training runs ONE corpus-sized
    // wordCounts job and merges driver-local, so a 10x merge budget
    // must cost zero additional Spark jobs (previously: one
    // pairCounts job + one limit(1).collect() PER ROUND).
    def jobsDuring(body: => Unit): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          counter.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        // the listener bus is async (and private[spark], so no drain
        // call): poll until the counter has been stable for 500 ms —
        // every JobStart is posted before its collect() returns, so
        // only bus lag is being absorbed here
        var prev = -1
        var stable = 0
        while (stable < 10) {
          val cur = counter.get()
          if (cur == prev) stable += 1 else stable = 0
          prev = cur
          Thread.sleep(50L)
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      counter.get()
    }
    // corpus rich enough to sustain 30 distinct merges
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "how vexingly quick daft zebras jump"),
      (4L, "the five boxing wizards jump quickly")
    ).toDF("doc_id", "text")
    val jobs3 = jobsDuring {
      val (m, v) = Bpe.train(corpus, "text", rounds = 3)
      assert(m.size == 3); v.unpersist()
    }
    val jobs30 = jobsDuring {
      val (m, v) = Bpe.train(corpus, "text", rounds = 30)
      assert(m.size == 30); v.unpersist()
    }
    assert(jobs30 == jobs3,
      s"job count must not scale with rounds: 3 rounds -> $jobs3 jobs, " +
        s"30 rounds -> $jobs30 jobs")
  }

  test("encodeMarked/decode round-trip equals the single-space word normalization") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "  leading and   multiple   spaces survive  "),
      (3L, "singleword"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(corpus, "text", rounds = 3)
    vocab.unpersist()
    val ms = merges.map(m => (m._2, m._3))
    val got = Bpe
      .decode(Bpe.encodeMarked(corpus, "text", ms, spark), "tokens")
      .select("doc_id", "decoded")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = Map(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "leading and multiple spaces survive",
      3L -> "singleword",
      4L -> "")
    assert(got == want)
  }

  test("encodeMarked token count equals unmarked encode's (marking suffixes, never splits)") {
    val corpus = Seq(
      (1L, "aa ab aa ab ba"),
      (2L, "aaa bbb aaa")
    ).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(corpus, "text", rounds = 2)
    vocab.unpersist()
    val ms = merges.map(m => (m._2, m._3))
    val plain = Bpe.encode(corpus, "text", ms, spark)
      .select(col("doc_id"), size(col("tokens")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val marked = Bpe.encodeMarked(corpus, "text", ms, spark)
      .select(col("doc_id"), size(col("tokens")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(plain == marked)
    // and every marked word-final token carries exactly one marker
    val toks = Bpe.encodeMarked(corpus, "text", ms, spark)
      .select(explode(col("tokens")).as("t"))
      .collect().map(_.getString(0))
    assert(toks.count(_.endsWith(Bpe.EndOfWord)) ==
      corpus.collect().flatMap(r => Option(r.getString(1)))
        .map(_.split(" ").count(_.nonEmpty)).sum)
  }
}
