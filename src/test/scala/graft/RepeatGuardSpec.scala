package graft

import org.apache.spark.sql.functions._

/** Run-over-run storage-leak guard (VERDICT r11 next-round #7): the
  * mergeUpsert checkpoint leak was found only by invoking the same
  * face repeatedly (18.9 → 77 s degradation at sf10 before the
  * explicit block release), because DataFrame.unpersist is a NO-OP on
  * a LogicalRDD-backed (localCheckpoint'd) frame. This spec runs each
  * checkpoint-using face 5× in one session and asserts the
  * persistent-RDD population returns to its pre-run baseline after
  * every invocation — catching the next regression of that class
  * (a forgotten Graft.checkpointRdd release, a cache that outlives
  * its call) the moment it is introduced.
  */
class RepeatGuardSpec extends SparkTestBase {
  import spark.implicits._

  /** Ids of currently-persisted RDDs. The guard asserts on the SET
    * DIFFERENCE against a pre-run baseline, not the global count: the
    * test session is shared across suites, and the ContextCleaner may
    * garbage-collect ANOTHER suite's stale blocks mid-test (count
    * drops — a false failure under `==`), while a genuine leak from
    * the face under test always shows up as a NEW persisted id that
    * survives the face's own cleanup.
    */
  private def persistedIds(): Set[Int] = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.keySet.toSet
  }

  private def assertNoNewPersisted(baseline: Set[Int], label: String): Unit = {
    val leaked = persistedIds() -- baseline
    assert(leaked.isEmpty,
      s"$label leaked storage: " + leaked.map { id =>
        spark.sparkContext.getPersistentRDDs.get(id)
          .map(_.toString).getOrElse(s"rdd#$id")
      }.mkString(", "))
  }

  test("mergeUpsert 5x: checkpoint blocks are released every run") {
    val path = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_repeat_merge_${System.nanoTime}").getPath
    val base = (1L to 200L).map(k => (k, s"p${k % 3}", k.toDouble))
      .toDF("k", "part", "v")
    graft.layout.Layout.writePartitioned(base, path, "part")
    val batch = (1L to 50L).map(k => (k, s"p${k % 3}", k * 2.0, k % 7 == 0))
      .toDF("k", "part", "v", "__deleted")
    val baseline = persistedIds()
    (1 to 5).foreach { i =>
      graft.layout.Layout.mergeUpsert(spark, path, "part", "k", batch)
      assertNoNewPersisted(baseline, s"mergeUpsert run $i")
    }
  }

  test("distributed connected components 5x: iteration checkpoints are " +
    "released every run") {
    // localThreshold = 0 forces the distributed star-contraction tier
    // (the driver union-find tier persists nothing)
    val pairs = (0L until 300L).map(i => (i, i + 1L)).toDF("a", "b")
    val baseline = persistedIds()
    (1 to 5).foreach { i =>
      val out = graft.dedup.Dedup.clusterize(pairs, "id", localThreshold = 0L)
      out.count()
      out.unpersist(blocking = true)
      assertNoNewPersisted(baseline, s"clusterize(distributed) run $i")
    }
  }

  test("pageRank 5x: cadence + final checkpoints are released every run") {
    val edges = (0L until 400L).map(i => (i % 97L, (i * 31L) % 97L))
      .toDF("src", "dst").distinct()
    val baseline = persistedIds()
    (1 to 5).foreach { i =>
      // 12 iters with the default cadence (5) exercises BOTH the
      // intermediate-checkpoint release and the final cleanup handle
      val (ranks, cleanup) =
        graft.ops.LinkGraph.pageRankWithCleanup(edges, iters = 12)
      ranks.count()
      cleanup()
      assertNoNewPersisted(baseline, s"pageRank run $i")
    }
  }

  // ---- streaming faces (VERDICT r12 #4): each front door runs
  // start → AvailableNow drain → stop 5×; after every run the
  // persisted-RDD set must return to baseline (foreachBatch bodies
  // cache pair frames — a forgotten unpersist pins one per BATCH in a
  // long-running ingest), and once the input stops arriving the
  // checkpoint dir must stop growing (idle restarts must not deposit
  // offsets/state per run).

  private def dirSize(p: java.nio.file.Path): Long = {
    val s = java.nio.file.Files.walk(p)
    try s.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally s.close()
  }

  private def streamGuard(label: String)(
      run: (String, String) => Unit): Unit = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_repeat_$label")
    val out = root.resolve("out").toString
    val ckpt = root.resolve("ckpt")
    val baseline = persistedIds()
    var idleSize = -1L
    (1 to 5).foreach { i =>
      run(out, ckpt.toString) // drains AvailableNow, then stops
      assertNoNewPersisted(baseline, s"$label run $i")
      // runs 2..5 see no new input: the checkpoint must be IDENTICAL
      // in size from the first idle drain on (AvailableNow plans no
      // batch when the source has nothing new)
      if (i == 2) idleSize = dirSize(ckpt)
      if (i > 2) assert(dirSize(ckpt) == idleSize,
        s"$label: idle drain $i grew the checkpoint " +
          s"(${dirSize(ckpt)} vs $idleSize bytes)")
    }
  }

  test("containmentStream 5x: per-batch pair caches released, idle " +
    "drains leave the checkpoint untouched") {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val history = all.filter(col("doc_id") % 3L =!= 0L)
    val newDocs = all.filter(col("doc_id") % 3L === 0L).limit(120)
    val inDir = java.nio.file.Files
      .createTempDirectory("graft_repeat_contain_in")
    newDocs.write.mode("overwrite").parquet(inDir.resolve("a").toString)
    streamGuard("containstream") { (out, ckpt) =>
      graft.streaming.Incremental.containmentStream(
        spark.readStream.schema(newDocs.schema)
          .parquet(inDir.toString + "/*"),
        history, "doc_id", "text", out, ckpt,
        n = 3, minContainment = 0.8, maxDf = Long.MaxValue)
        .awaitTermination()
    }
  }

  test("containmentFilterStream 5x: per-batch pair caches released, " +
    "idle drains leave the checkpoint untouched") {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val history = all.filter(col("doc_id") % 3L =!= 0L)
    val newDocs = all.filter(col("doc_id") % 3L === 0L).limit(120)
    val inDir = java.nio.file.Files
      .createTempDirectory("graft_repeat_cfilter_in")
    newDocs.write.mode("overwrite").parquet(inDir.resolve("a").toString)
    streamGuard("containfilter") { (out, ckpt) =>
      graft.streaming.Incremental.containmentFilterStream(
        spark.readStream.schema(newDocs.schema)
          .parquet(inDir.toString + "/*"),
        history, "doc_id", "text", out, ckpt,
        n = 3, minContainment = 0.8, maxDf = Long.MaxValue)
        .awaitTermination()
    }
  }

  test("spanScrubStream 5x: no persisted state outlives a drain, idle " +
    "drains leave the checkpoint untouched") {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val history = all.filter(col("doc_id") % 3L =!= 0L)
    val newDocs = all.filter(col("doc_id") % 3L === 0L).limit(120)
    val inDir = java.nio.file.Files
      .createTempDirectory("graft_repeat_spanscrub_in")
    newDocs.write.mode("overwrite").parquet(inDir.resolve("a").toString)
    streamGuard("spanscrub") { (out, ckpt) =>
      graft.streaming.Incremental.spanScrubStream(
        spark.readStream.schema(newDocs.schema)
          .parquet(inDir.toString + "/*"),
        history, "doc_id", "text", out, ckpt, windowTokens = 8)
        .awaitTermination()
    }
  }

  test("refreshStream 5x: Bloom rebuild + bucketed appends leave no " +
    "persisted state, idle drains leave the checkpoint untouched") {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
      .withColumn("ev", org.apache.spark.sql.functions.expr(
        "timestamp '2026-01-01 00:00:00'"))
    val history = all.filter(col("doc_id") % 3L =!= 0L).select("doc_id")
    val newDocs = all.filter(col("doc_id") % 3L === 0L).limit(120)
    val inDir = java.nio.file.Files
      .createTempDirectory("graft_repeat_refresh_in")
    newDocs.write.mode("overwrite").parquet(inDir.resolve("a").toString)
    val tbl = s"graft_repeat_refresh_${System.nanoTime}"
    try {
      streamGuard("refresh") { (_, ckpt) =>
        graft.streaming.Incremental.refreshStream(
          spark.readStream.schema(newDocs.schema)
            .parquet(inDir.toString + "/*"),
          history, "doc_id", "text", "ev", tbl, ckpt)
          .awaitTermination()
      }
    } finally graft.layout.Layout.dropWithLocation(spark, tbl)
  }

  test("nearDupStream 5x: keyed LSH bucket state holds no persisted " +
    "RDDs, idle drains leave the checkpoint untouched") {
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(150)
    val inDir = java.nio.file.Files
      .createTempDirectory("graft_repeat_neardup_in")
    all.write.mode("overwrite").parquet(inDir.resolve("a").toString)
    streamGuard("neardup") { (_, ckpt) =>
      graft.streaming.Incremental.nearDupStream(
        spark.readStream.schema(all.schema)
          .parquet(inDir.toString + "/*"),
        "doc_id", "text", n = 3, bands = 4, rowsPerBand = 4,
        minJaccard = 0.8)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch {
          // the sink must PROCESS every partition or the stateful
          // operator's state-store commits never happen
          (b: org.apache.spark.sql.Dataset[(String, String, Double)],
           _: Long) => { b.count(); () }
        }
        .start()
        .awaitTermination()
    }
  }
}
