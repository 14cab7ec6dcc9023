package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Degenerate-input matrix: every resume/refresh entry point must treat
  * "nothing there yet" as a normal state, not a crash — an empty
  * blocklist, a cold-start history, a zero-row micro-batch, an empty
  * corpus. These are the FIRST states every production deployment runs
  * through (first crawl, fresh checkpoint, empty partition of a
  * skewed upstream), so each gets the identity/no-op it advertises.
  */
class DegenerateInputSpec extends SparkTestBase {

  test("empty blocklist through blockByDomain is the identity") {
    import spark.implicits._
    val docs = Seq(
      "https://keep.example.com/a",
      "http://also-keep.org/b?q=1").toDF("url")
    val out = graft.text.UrlOps.blockByDomain(
      docs, "url", Seq.empty[String].toDF("domain"))
    assert(out.select("url").as[String].collect().sorted.toSeq ==
      docs.select("url").as[String].collect().sorted.toSeq)
  }

  test("empty history and empty batch through minHashLshPairsAgainst " +
    "yield zero pairs, not an error") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again!"))
      .toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.dedup.Dedup
      .minHashLshPairsAgainst(corpus, empty, "doc_id", "text", minJaccard = 0.1)
      .count() == 0L)
    assert(graft.dedup.Dedup
      .minHashLshPairsAgainst(empty, corpus, "doc_id", "text", minJaccard = 0.1)
      .count() == 0L)
  }

  test("zero-row batch through appendTrainingShards is a no-op; the next " +
    "real batch still packs from offset 0") {
    import spark.implicits._
    val root = Files.createTempDirectory("graftdegshard")
    val path = root.resolve("shards").toString
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    graft.io.Sinks.appendTrainingShards(
      empty, "doc_id", "text", path, 64L, batchId = 0L, batchTag = "ck")
    val real = Seq((1L, "a b c d"), (2L, "e f g h i")).toDF("doc_id", "text")
    graft.io.Sinks.appendTrainingShards(
      real, "doc_id", "text", path, 64L, batchId = 1L, batchTag = "ck")
    val rows = spark.read.parquet(path)
      .select(col("doc_id"), col("start_off"), col("end_off"))
      .as[(Long, Long, Long)].collect().sortBy(_._2)
    assert(rows.map(_._1).toSet == Set(1L, 2L))
    assert(rows.head._2 == 0L, "first real doc must pack from offset 0")
  }

  test("zero-row micro-batch through shardStream: query completes, table " +
    "holds exactly the later real rows") {
    import spark.implicits._
    val root = Files.createTempDirectory("graftdegstream")
    val inDir = root.resolve("in")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val real = Seq((1L, "a b c d"), (2L, "e f g h i")).toDF("doc_id", "text")
    empty.coalesce(1).write.parquet(inDir.resolve("a").toString)
    real.coalesce(1).write.parquet(inDir.resolve("b").toString)
    val now = System.currentTimeMillis()
    new java.io.File(inDir.resolve("a").toString).listFiles()
      .foreach(_.setLastModified(now - 60000L))
    new java.io.File(inDir.resolve("b").toString).listFiles()
      .foreach(_.setLastModified(now))
    val stream = spark.readStream.schema(real.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir.toString + "/*")
    val q = graft.streaming.Incremental.shardStream(
      stream, "doc_id", "text", root.resolve("out").toString,
      root.resolve("ckpt").toString, tokensPerShard = 64L)
    q.awaitTermination()
    val out = spark.read.parquet(root.resolve("out").toString)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 2L))
    assert(out.agg(min("start_off")).first().getLong(0) == 0L)
  }

  test("zero-row batch through refreshStream (cold-start empty history): " +
    "query completes and the target table reads back empty") {
    import spark.implicits._
    val root = Files.createTempDirectory("graftdegrefresh")
    val inDir = root.resolve("in")
    val tbl = "deg_refresh_empty_tbl"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val empty = Seq.empty[(Long, String, java.sql.Timestamp)]
      .toDF("doc_id", "text", "ets")
    empty.coalesce(1).write.parquet(inDir.toString)
    val stream = spark.readStream.schema(empty.schema).parquet(inDir.toString)
    val hist = Seq.empty[Long].toDF("doc_id")
    val q = graft.streaming.Incremental.refreshStream(
      stream, hist, "doc_id", "text", "ets", tbl,
      root.resolve("ckpt").toString)
    q.awaitTermination()
    if (spark.catalog.tableExists(tbl)) {
      assert(spark.table(tbl).count() == 0L)
      spark.sql(s"DROP TABLE $tbl")
    }
  }

  test("empty corpus through CurationPipeline.run: zero docs/chunks/" +
    "packing and a recorded all-zero funnel") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = graft.text.CurationPipeline.run(empty, "doc_id", "text")
    assert(out.docs.count() == 0L)
    assert(out.chunks.count() == 0L)
    assert(out.packing.count() == 0L)
    assert(out.funnel.nonEmpty, "funnel stages must still be recorded")
    assert(out.funnel.forall(_._2 == 0L), s"non-zero funnel: ${out.funnel}")
    out.unpersist()
  }

  test("null-text docs through softDedupWeights get per-doc keys and weight 1") {
    import spark.implicits._
    val docs = Seq((1L, null: String), (2L, null: String), (3L, "real"))
      .toDF("doc_id", "text")
    val out = graft.dedup.Dedup
      .softDedupWeights(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    // two null-text docs share no CONTENT: they must NOT merge
    assert(out.forall(_.getAs[Long]("dup_count") == 1L))
    assert(out.forall(_.getAs[Double]("weight") == 1.0))
  }

  test("single-language single-doc corpus through lmBuckets lands in head") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b", "en")).toDF("doc_id", "text", "lang")
    val model = Seq(("a b", 5L)).toDF("bigram", "c2")
    val out = graft.text.TextAnalysis
      .lmBuckets(docs, "doc_id", "text", "lang", model).collect()
    assert(out.length == 1)
    // cum == total -> 3*total <= total false... the single doc IS the
    // whole mass: cum*3 = 3T > T and > 2T -> tail by the end-offset
    // rule; assert the documented boundary semantics hold
    assert(out(0).getAs[String]("bucket") == "tail")
    assert(out(0).getAs[Long]("cum_tok") == out(0).getAs[Long]("lang_tok"))
  }

  test("third-pass ops: empty corpus / empty terms / empty fit are normal states") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val some = Seq((1L, "a b c d e f")).toDF("doc_id", "text")

    // empty corpus → empty manifest (no phantom root row)
    assert(graft.ops.Profile
      .corpusManifest(empty.withColumn("source", lit("s")), "doc_id", "text",
        "source").count() == 0)

    // spanCorrupt on an empty corpus → zero rows; on empty TEXT the
    // single empty token is maskable without crashing
    assert(graft.text.TextAnalysis.spanCorrupt(empty, "doc_id", "text")
      .count() == 0)
    val blank = graft.text.TextAnalysis
      .spanCorrupt(Seq((1L, "")).toDF("doc_id", "text"), "doc_id", "text")
      .head()
    assert(blank.getAs[Long]("n_spans") == 1L)

    // searchAll with an empty term set matches nothing (conjunction
    // over zero terms is defined empty, not all-docs)
    assert(graft.text.Search
      .searchAll(some, "doc_id", "text", Seq.empty[String].toDF("term"), 5)
      .count() == 0)

    // scoring against an EMPTY fit corpus: every pair is OOV (0/1) —
    // no null den from the missing total
    val scored = graft.text.NgramLm
      .stupidBackoffScore(empty, some, "doc_id", "text").collect()
    assert(scored.length == 5)
    assert(scored.forall(r => r.getAs[Long]("backoff_level") == 0L &&
      r.getAs[Long]("num") == 0L && r.getAs[Long]("den") == 1L))

    // hard negatives when every candidate shares the probe's label →
    // zero rows, not an error
    val vecs = Seq((1L, Array(1f, 0f), 0), (2L, Array(0f, 1f), 0),
      (3L, Array(1f, 1f), 0)).toDF("vec_id", "embedding", "label")
    assert(graft.similarity.Ann
      .hardNegatives(
        vecs.filter($"vec_id" === 1L).withColumnRenamed("vec_id", "probe_id"),
        vecs.withColumnRenamed("vec_id", "cand_id"),
        "probe_id", "cand_id", "embedding", "label", 3)
      .count() == 0)
  }

  test("null text is the empty doc for the new transforms, never a dropped row") {
    import spark.implicits._
    val withNull = Seq((1L, "a b"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    // manifest: the null doc is HASHED (as ""), not silently dropped
    val m = graft.ops.Profile
      .corpusManifest(withNull.withColumn("source", lit("s")), "doc_id",
        "text", "source")
      .head()
    assert(m.getAs[Long]("n_docs") == 2L)
    val without = graft.ops.Profile
      .corpusManifest(withNull.filter($"doc_id" === 1L)
        .withColumn("source", lit("s")), "doc_id", "text", "source")
      .head()
    assert(m.getAs[String]("root_digest") != without.getAs[String]("root_digest"))
    // per-row transforms emit a row for the null doc
    assert(graft.text.TextAnalysis
      .spanCorrupt(withNull, "doc_id", "text").count() == 2)
    assert(graft.text.TextAnalysis
      .truncateTokens(withNull, "doc_id", "text", 5)
      .filter($"doc_id" === 2L).head().getAs[String]("text_trunc") == "")
    assert(graft.text.TextAnalysis
      .unkRareTokens(withNull, "doc_id", "text").count() == 2)
    // chat template: null content renders as an empty turn
    val conv = Seq((1L, Seq(("user", null.asInstanceOf[String]))))
      .toDF("conv_id", "raw")
      .withColumn("turns",
        expr("transform(raw, x -> struct(x._1 AS role, x._2 AS content))"))
    assert(graft.text.ChatTemplate.renderChat(conv, "conv_id", "turns", "S")
      .head().getAs[String]("prompt") == "<|sys|>S<|end|><|user|><|end|>")
  }

  test("adversarial many-frame GIF: CappedGifFrameSampler bounds the " +
    "frame walk and oversize payloads skip the codec entirely") {
    import graft.multimodal.{CappedGifFrameSampler, GifFrameSampler, ImageCodec}
    val monster = ImageCodec.fixtureGif(3L, nFrames = Some(64))
    // unguarded: schedules over all 64 frames (the cost a hostile
    // payload buys); capped: the probe stops at 8 — every sampled
    // index lands inside the first 8 frames and timestamps still
    // accumulate the real per-frame delays
    val uncapped = GifFrameSampler.sampleBatch(Seq(monster), 4).head
    assert(uncapped.map(_._1) == Seq(0, 16, 32, 48))
    val capped = CappedGifFrameSampler(maxFrames = Some(8))
      .sampleBatch(Seq(monster), 4).head
    assert(capped.map(_._1) == Seq(0, 2, 4, 6))
    assert(capped.map(_._2) == Seq(0L, 200L, 400L, 600L))
    // generous caps are the identity on a well-behaved payload
    val normal = ImageCodec.fixtureGif(9L)
    val guarded = CappedGifFrameSampler(
      maxFrames = Some(1000), maxBytes = Some(1 << 20))
      .sampleBatch(Seq(normal), 3).head
    val exact = GifFrameSampler.sampleBatch(Seq(normal), 3).head
    assert(guarded.map(t => (t._1, t._2)) == exact.map(t => (t._1, t._2)))
    assert(guarded.zip(exact).forall { case (g, e) => g._3.sameElements(e._3) })
    // oversize payload: never decoded, degrades to the whole-payload
    // stub row exactly like a non-GIF payload
    val tiny = CappedGifFrameSampler(maxBytes = Some(16))
      .sampleBatch(Seq(monster), 4).head
    assert(tiny.map(t => (t._1, t._2)) == Seq((0, 0L)))
    assert(tiny.head._3.sameElements(monster))
  }
}
