package graft

import graft.ops.Profile
import graft.text.{NgramLm, Search, TextAnalysis}
import org.apache.spark.sql.functions._

/** Third-pass round-10 curation operators: span corruption, the corpus
  * integrity manifest, the Stupid Backoff count-LM, and keyword
  * retrieval.
  */
class CurationOps3Spec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  // ---------------------------------------------------------------- span corruption

  test("spanCorrupt: input/target reassemble to the original text") {
    val out = TextAnalysis
      .spanCorrupt(docs, "doc_id", "text", nSpans = 3, maxSpanTokens = 4)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .collect()
    assert(out.length == 500)
    out.foreach { r =>
      val input = r.getAs[String]("input_text")
      val target = r.getAs[String]("target_text")
      val orig = r.getAs[String]("text")
      // splice each sentinel's span back into the input
      val spans = target
        .split("<extra_id_\\d>")
        .map(_.trim)
        .filter(_.nonEmpty)
      var rebuilt = input
      var k = 0
      for (s <- spans) {
        // sentinel indices are dense 0..n_spans-1 on docs with >= 3 tokens
        while (!rebuilt.contains(s"<extra_id_$k>")) k += 1
        rebuilt = rebuilt.replace(s"<extra_id_$k>", s)
        k += 1
      }
      // token-level equality (sentinel splice can differ in spacing
      // only when a span sat at the text boundary)
      assert(rebuilt.split(" ").filter(_.nonEmpty).toSeq ==
        orig.split(" ").filter(_.nonEmpty).toSeq,
        s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("spanCorrupt: masked_tokens counts and span bounds hold") {
    val out = TextAnalysis
      .spanCorrupt(docs, "doc_id", "text", nSpans = 3, maxSpanTokens = 4)
      .collect()
    out.foreach { r =>
      val n = r.getAs[Long]("n_spans")
      val m = r.getAs[Long]("masked_tokens")
      assert(n >= 1 && n <= 3)
      assert(m >= n && m <= n * 4)
      val sentinels = "<extra_id_".r.findAllIn(r.getAs[String]("input_text")).size
      assert(sentinels == n)
    }
  }

  test("spanCorrupt: docs shorter than nSpans degrade gracefully") {
    val tiny = Seq((1L, "a"), (2L, "a b"), (3L, "a b c d")).toDF("doc_id", "text")
    val out = TextAnalysis
      .spanCorrupt(tiny, "doc_id", "text", nSpans = 3, maxSpanTokens = 2)
      .orderBy("doc_id")
      .collect()
    // 1 token → only one non-empty stratum; never crashes, never
    // masks more tokens than exist
    assert(out(0).getAs[Long]("n_spans") == 1L)
    assert(out(0).getAs[Long]("masked_tokens") == 1L)
    assert(out(1).getAs[Long]("n_spans") == 2L)
    out.foreach { r =>
      assert(r.getAs[Long]("masked_tokens") <=
        tiny.filter($"doc_id" === r.getAs[Long]("doc_id"))
          .head().getAs[String]("text").split(" ").length)
    }
  }

  // ---------------------------------------------------------------- manifest

  test("corpusManifest: root matches across repartitioning, differs on 1-char change") {
    val a = Profile.corpusManifest(docs, "doc_id", "text", "source", groupSize = 16)
    val b = Profile.corpusManifest(docs.repartition(7), "doc_id", "text", "source",
      groupSize = 16)
    val rootA = a.select("root_digest").head().getString(0)
    assert(b.select("root_digest").head().getString(0) == rootA)

    val mutated = docs.withColumn("text",
      when(col("doc_id") === 123L, concat(col("text"), lit("!")))
        .otherwise(col("text")))
    val c = Profile.corpusManifest(mutated, "doc_id", "text", "source", groupSize = 16)
    assert(c.select("root_digest").head().getString(0) != rootA)
    // the mismatch localizes: exactly one shard digest differs
    val diff = a.select(col("source"), col("shard_digest").as("da"))
      .join(c.select(col("source"), col("shard_digest").as("dc")), "source")
      .filter(col("da") =!= col("dc"))
      .collect()
    assert(diff.length == 1)
  }

  test("corpusManifest: group fan-out bound and doc totals") {
    val m = Profile.corpusManifest(docs, "doc_id", "text", "source", groupSize = 16)
      .collect()
    assert(m.map(_.getAs[Long]("n_docs")).sum == 500L)
    m.foreach { r =>
      // ≤ groupSize docs per group by construction
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_groups") * 16)
    }
  }

  // ---------------------------------------------------------------- source overlap

  test("sourceOverlapMatrix: known shared digests, in-source dups collapse") {
    val corpus = Seq(
      ("x", "A"), ("y", "A"), ("y", "A"), // y duplicated inside A
      ("y", "B"), ("z", "B"),
      ("x", "C"), ("y", "C"), ("q", "C")
    ).toDF("text", "source")
    val m = Profile.sourceOverlapMatrix(corpus, "text", "source")
      .orderBy("src_a", "src_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long](2),
        r.getAs[Long](3), r.getAs[Long](4)))
      .toSeq
    assert(m == Seq(
      ("A", "B", 1L, 2L, 2L), // share y; A has 2 distinct (x,y)
      ("A", "C", 2L, 2L, 3L), // share x,y
      ("B", "C", 1L, 2L, 3L)  // share y
    ))
  }

  // ---------------------------------------------------------------- stupid backoff

  test("stupidBackoffScore: all three levels with hand-computed rationals") {
    val fit = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val score = Seq((10L, "a b x c")).toDF("doc_id", "text")
    val out = NgramLm.stupidBackoffScore(fit, score, "doc_id", "text")
      .orderBy("pos").collect()
    // fit: uni a:2 b:2 c:1, T=5; bi (a,b):2 (b,a):1 (b,c):1
    assert(out.length == 3)
    // (a,b) seen: c2=2 / c1(a)=2
    assert((out(0).getAs[Long]("backoff_level"), out(0).getAs[Long]("num"),
      out(0).getAs[Long]("den")) == (2L, 2L, 2L))
    // (b,x): x unseen → OOV
    assert((out(1).getAs[Long]("backoff_level"), out(1).getAs[Long]("num"),
      out(1).getAs[Long]("den")) == (0L, 0L, 1L))
    // (x,c): bigram unseen, c seen → backoff 2·c1(c) / 5·T
    assert((out(2).getAs[Long]("backoff_level"), out(2).getAs[Long]("num"),
      out(2).getAs[Long]("den")) == (1L, 2L, 25L))
  }

  test("stupidBackoffScore: single-token and empty docs contribute no pairs") {
    val fit = Seq((1L, "a b")).toDF("doc_id", "text")
    val score = Seq((10L, "a"), (11L, ""), (12L, "a b")).toDF("doc_id", "text")
    val out = NgramLm.stupidBackoffScore(fit, score, "doc_id", "text").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(12L))
  }

  test("unkRareTokens: one-doc tokens masked, shared tokens survive, order kept") {
    val corpus = Seq(
      (1L, "the cat sat secret123 the end"),
      (2L, "the cat ran away"),
      (3L, "the dog sat down")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unkRareTokens(corpus, "doc_id", "text", minDf = 2L)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_masked"), r.getAs[String]("clean_text"))).toMap
    // df: the=3 cat=2 sat=2 — survive; secret123/end/ran/away/dog/down df=1
    assert(byId(1L) == (2L, "the cat sat <unk> the <unk>"))
    assert(byId(2L) == (2L, "the cat <unk> <unk>"))
    assert(byId(3L) == (2L, "the <unk> sat <unk>"))
  }

  test("group split is leakage-safe: a content key never spans two splits") {
    val q = graft.queries.Registry.byName("q_sample_group_split")
      .fn(spark, "/root/testdata/sf0.001")
    val perKey = q.groupBy("content_key")
      .agg(countDistinct("split").as("n_splits"),
        count(lit(1)).as("n_docs"))
    assert(perKey.filter($"n_splits" =!= 1L).count() == 0)
    // the variant pairs actually exercise the property (multi-doc keys
    // exist) and all three splits are populated
    assert(perKey.filter($"n_docs" > 1L).count() > 0)
    assert(q.select("split").distinct().count() == 3)
  }

  test("preferencePairs: best-vs-worst with deterministic tiebreaks; singletons drop") {
    import graft.text.Sampling
    val cands = Seq(
      (0L, 1L, 10L), (0L, 2L, 30L), (0L, 3L, 30L), (0L, 4L, 10L), // ties both ends
      (1L, 5L, 7L),                                               // singleton
      (2L, 6L, 1L), (2L, 7L, 2L)
    ).toDF("grp", "id", "score")
    val out = Sampling.preferencePairs(cands, "grp", "id", "score")
      .orderBy("grp").collect()
      .map(r => (r.getAs[Long]("grp"), r.getAs[Long]("n_cands"),
        r.getAs[Long]("chosen_id"), r.getAs[Long]("rejected_id")))
      .toSeq
    // grp 0: chosen = best score, LOWER id (2 not 3); rejected =
    // worst score, HIGHER id (4 not 1); grp 1 singleton dropped
    assert(out == Seq((0L, 4L, 2L, 4L), (2L, 2L, 7L, 6L)))
  }

  test("unimaxPlan: epoch caps bind small languages, surplus flows up, budget conserved") {
    import graft.text.Sampling
    // lang sizes (ws tokens): a=2, b=4, c=20
    val corpus = Seq(
      ("a", "t1 t2"), ("b", "t1 t2 t3 t4"),
      ("c", ("t1 " * 19).trim + " t20")
    ).toDF("lang", "text")
    val plan = Sampling.unimaxPlan(corpus, "lang", "text",
        budgetTokens = 12L, maxEpochs = 2)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_tok"),
        r.getAs[Long]("alloc_tok"), r.getAs[Long]("epochs_permille")))
      .toSeq
    // ascending: a gets min(4, 12/3=4)=4 (both bind), b min(8, 8/2=4)=4,
    // c min(40, 4/1=4)=4
    assert(plan == Seq(("a", 2L, 4L, 2000L), ("b", 4L, 4L, 1000L),
      ("c", 20L, 4L, 200L)))
    assert(plan.map(_._3).sum == 12L) // budget fully allocated
    // big budget: every language epoch-capped, leftover unallocated
    val plan2 = Sampling.unimaxPlan(corpus, "lang", "text",
        budgetTokens = 1000L, maxEpochs = 2)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("alloc_tok")).toMap
    assert(plan2 == Map("a" -> 4L, "b" -> 8L, "c" -> 40L))
  }

  // ---------------------------------------------------------------- chat template

  test("renderChat: spans are disjoint, ordered, and extract to the turn contents") {
    import graft.text.ChatTemplate
    val convs = Seq(
      (1L, Seq(("user", "hi there"), ("asst", "hello!"),
        ("user", ""), ("asst", "still here"))),
      (2L, Seq(("user", "lone question"))),
      (3L, Seq.empty[(String, String)])
    ).toDF("conv_id", "raw")
      .withColumn("turns",
        expr("transform(raw, x -> struct(x._1 AS role, x._2 AS content))"))
    val out = ChatTemplate.renderChat(convs, "conv_id", "turns", "SYS")
      .withColumn("asst_x",
        ChatTemplate.roleSpanText(col("prompt"), col("spans"), "asst"))
      .withColumn("user_x",
        ChatTemplate.roleSpanText(col("prompt"), col("spans"), "user"))
      .collect().map(r => r.getAs[Long]("conv_id") -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[String]("prompt") ==
      "<|sys|>SYS<|end|><|user|>hi there<|end|><|asst|>hello!<|end|>" +
        "<|user|><|end|><|asst|>still here<|end|>")
    assert(r1.getAs[String]("asst_x") == "hello!still here")
    assert(r1.getAs[String]("user_x") == "hi there")
    val spans = r1.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("spans")
    assert(spans.length == 4)
    // ordered and disjoint
    spans.sliding(2).foreach {
      case scala.collection.Seq(a, b) =>
        assert(a.getAs[Long]("e") <= b.getAs[Long]("s"))
      case _ =>
    }
    assert(out(2L).getAs[String]("asst_x") == "")
    assert(out(3L).getAs[String]("prompt") == "<|sys|>SYS<|end|>")
  }

  // ---------------------------------------------------------------- CDC dedup

  test("cdcChunkDedup: chunks reassemble, exact dups die, shifts survive boundaries") {
    import graft.dedup.Dedup
    val base = docs.select($"doc_id", $"text").filter($"doc_id" < 50)
    // a doc with no dropped chunks reassembles exactly; drops in a
    // duplicate-free corpus can only be INTRA-doc repeated chunks
    // (first-occurrence is corpus-wide, same as windowDedup)
    val solo = Dedup.cdcChunkDedup(base, "doc_id", "text")
      .join(base, "doc_id").collect()
    solo.foreach { r =>
      if (r.getAs[Long]("n_dropped") == 0L)
        assert(r.getAs[String]("clean_text") == r.getAs[String]("text"))
    }
    assert(solo.count(_.getAs[Long]("n_dropped") == 0L) > solo.length / 2)
    // an exact duplicate loses every chunk; a PREFIX-shifted copy
    // loses everything past its first content-defined boundary
    val withCopies = base
      .unionByName(base.filter($"doc_id" === 7L)
        .select(($"doc_id" + 100000L).as("doc_id"), $"text"))
      .unionByName(base.filter($"doc_id" === 8L)
        .select(($"doc_id" + 200000L).as("doc_id"),
          concat(lit("inserted prefix "), $"text").as("text")))
    val out = Dedup.cdcChunkDedup(withCopies, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val exactCopy = out(100007L)
    assert(exactCopy.getAs[Long]("n_kept") == 0L)
    assert(exactCopy.getAs[String]("clean_text") == "")
    val shifted = out(200008L)
    // at most the leading chunks (prefix + first boundary re-sync)
    // survive; the duplicated tail deduplicates
    assert(shifted.getAs[Long]("n_dropped") >= shifted.getAs[Long]("n_chunks") - 2)
    assert(shifted.getAs[Long]("n_chunks") > 2)
  }

  // ---------------------------------------------------------------- hard negatives

  test("hardNegatives: per probe equals topKExact over the other-label slice") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val probes = e.filter($"vec_id" < 4L).withColumnRenamed("vec_id", "probe_id")
    val cands = e.withColumnRenamed("vec_id", "cand_id")
    val mined = graft.similarity.Ann
      .hardNegatives(probes, cands, "probe_id", "cand_id", "embedding",
        "label", k = 3)
      .collect()
    assert(mined.forall(r =>
      r.getAs[Int]("probe_label") != r.getAs[Int]("neg_label")))
    val probeLabels = probes.select("probe_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for ((pid, plabel) <- probeLabels) {
      val expected = graft.similarity.Ann
        .topKExact(
          probes.filter($"probe_id" === pid),
          cands.filter($"label" =!= plabel), "probe_id", "cand_id",
          "embedding", k = 3)
        .collect()
        .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("cand_id")))
        .toSeq
      val got = mined.filter(_.getAs[Long]("probe_id") == pid)
        .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("cand_id")))
        .toSeq.sorted
      assert(got == expected.sorted, s"probe $pid")
    }
  }

  test("stupidBackoffScoreTrigram: all four levels with hand-computed rationals") {
    // fit: c1 a2 b2 c2 d1, T=7; bi (a,b)2 (b,c)2 (c,a)1 (c,d)1;
    // tri (a,b,c)2 (b,c,a)1 (c,a,b)1 (b,c,d)1
    val fit = Seq((1L, "a b c a b c d")).toDF("doc_id", "text")
    val score = Seq((10L, "a b c x b c q q a")).toDF("doc_id", "text")
    val out = NgramLm.stupidBackoffScoreTrigram(fit, score, "doc_id", "text")
      .orderBy("pos").collect()
      .map(r => (r.getAs[Long]("backoff_level"), r.getAs[Long]("num"),
        r.getAs[Long]("den")))
      .toSeq
    assert(out == Seq(
      (3L, 2L, 2L),    // (a,b,c): trigram hit c3=2 / c2(a,b)=2
      (0L, 0L, 1L),    // (b,c,x): x OOV
      (1L, 8L, 175L),  // (c,x,b): unigram backoff 4·c1(b) / 25·T
      (2L, 4L, 10L),   // (x,b,c): bigram backoff 2·c2(b,c) / 5·c1(b)
      (0L, 0L, 1L),    // (b,c,q): q OOV
      (0L, 0L, 1L),    // (c,q,q)
      (1L, 8L, 175L))) // (q,q,a): 4·c1(a) / 25·T
  }

  test("wordlistTags: case-folded hits per category, n_tok rides along") {
    val corpus = Seq(
      (1L, "Table ROW table nothing"),
      (2L, "fast fast slow"),
      (3L, "unrelated words only")
    ).toDF("doc_id", "text")
    val lex = Seq(("table", "db"), ("row", "db"), ("fast", "perf"),
      ("slow", "perf")).toDF("term", "tag")
    val out = TextAnalysis.wordlistTags(corpus, "doc_id", "text", lex)
      .orderBy("doc_id", "tag").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("tag"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("n_tok")))
      .toSeq
    assert(out == Seq(
      (1L, "db", 3L, 4L),   // Table + ROW + table
      (2L, "perf", 3L, 3L)))
    // doc 3 has zero hits → absent by design
    // a duplicated lexicon row must not double-count
    val dupLex = lex.unionByName(Seq(("table", "db")).toDF("term", "tag"))
    val out2 = TextAnalysis.wordlistTags(corpus, "doc_id", "text", dupLex)
      .orderBy("doc_id", "tag").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("tag"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("n_tok")))
      .toSeq
    assert(out2 == out)
  }

  test("randomProject: exact vs driver recomputation; projection preserves cosine order") {
    import graft.similarity.Ann
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter($"vec_id" < 100L)
    // 48 dims for the statistical check (JL error ~1/sqrt(d); the
    // 16-dim oracle face checks exactness, not geometry)
    val proj = Ann.randomProject(e, "vec_id", "embedding", 48).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Long]]("proj").toArray).toMap
    val vecs = e.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getAs[scala.collection.Seq[Float]]("embedding").toArray).toMap
    def quant(v: Array[Float]): Array[Long] = v.map { f =>
      val x = f.toDouble * 1048576.0
      (if (x >= 0) x + 0.5 else x - 0.5).toLong
    }
    // independent recomputation from the shared plane definition
    for ((id, v) <- vecs) {
      val q = quant(v)
      val expect = (0 until 48).map(i =>
        q.indices.map(j => q(j) * Ann.planeInt(i, j)).sum).toArray
      assert(proj(id).sameElements(expect), s"vec $id")
    }
    // JL property: cosine in projected space tracks original cosine
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val ids = vecs.keys.toSeq.sorted
    val pairs = ids.zip(ids.tail)
    val (xo, xp) = pairs.map { case (a, b) =>
      (cos(quant(vecs(a)), quant(vecs(b))), cos(proj(a), proj(b)))
    }.unzip
    val mo = xo.sum / xo.size; val mp = xp.sum / xp.size
    val corr = xo.zip(xp).map { case (a, b) => (a - mo) * (b - mp) }.sum /
      (math.sqrt(xo.map(a => (a - mo) * (a - mo)).sum) *
        math.sqrt(xp.map(b => (b - mp) * (b - mp)).sum))
    assert(corr > 0.5, s"JL correlation too weak: $corr")
  }

  // ---------------------------------------------------------------- search

  test("searchAll: conjunction and tf-ranking") {
    val corpus = Seq(
      (1L, "x y z x"), // x:2 y:1 z:1 → total 4
      (2L, "x y"),     // missing z → excluded
      (3L, "z z y x"), // total 4 → tie with doc 1, id break
      (4L, "q q q")
    ).toDF("doc_id", "text")
    val terms = Seq("x", "y", "z").toDF("term")
    val out = Search.searchAll(corpus, "doc_id", "text", terms, k = 10)
      .collect()
    assert(out.map(r => (r.getAs[Long]("hit_rank"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("total_tf"))).toSeq ==
      Seq((1L, 1L, 4L), (2L, 3L, 4L)))
    // a duplicated term row must not double-count or break the
    // conjunction
    val dupTerms = Seq("x", "y", "z", "x", "x").toDF("term")
    val out2 = Search.searchAll(corpus, "doc_id", "text", dupTerms, k = 10)
      .collect()
    assert(out2.map(r => (r.getAs[Long]("hit_rank"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("total_tf"))).toSeq ==
      Seq((1L, 1L, 4L), (2L, 3L, 4L)))
  }

  test("searchAll: term match is a broadcast join, ranking a top-k heap") {
    val terms = Search.vocabTerms(docs, "text", 5, 7)
    val plan = Search.searchAll(docs, "doc_id", "text", terms, k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("invertedIndex: posting cap enforced, df counted pre-cap, impact order") {
    val idx = Search.invertedIndex(docs, "doc_id", "text", maxPostings = 5)
      .collect()
    assert(idx.nonEmpty)
    idx.foreach { r =>
      val postings = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("postings")
      assert(postings.length <= 5)
      // df >= |postings| (equality only for rare tokens)
      assert(r.getAs[Long]("df_docs") >= postings.length)
      // impact order: tf non-increasing, doc ascending within ties
      val tfs = postings.map(_.getAs[Long]("tf"))
      assert(tfs == tfs.sortBy(-_))
    }
    // the fixture's common tokens hit the cap
    assert(idx.exists(r =>
      r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("postings").length == 5
        && r.getAs[Long]("df_docs") > 5))
  }
}
