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

  private def persistedCount(): Int = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.size
  }

  test("mergeUpsert 5x: checkpoint blocks are released every run") {
    val path = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_repeat_merge_${System.nanoTime}").getPath
    val base = (1L to 200L).map(k => (k, s"p${k % 3}", k.toDouble))
      .toDF("k", "part", "v")
    graft.layout.Layout.writePartitioned(base, path, "part")
    val batch = (1L to 50L).map(k => (k, s"p${k % 3}", k * 2.0, k % 7 == 0))
      .toDF("k", "part", "v", "__deleted")
    val baseline = persistedCount()
    (1 to 5).foreach { i =>
      graft.layout.Layout.mergeUpsert(spark, path, "part", "k", batch)
      assert(persistedCount() == baseline,
        s"mergeUpsert leaked storage on run $i: " +
          spark.sparkContext.getPersistentRDDs.values
            .map(_.toString).mkString(", "))
    }
  }

  test("distributed connected components 5x: iteration checkpoints are " +
    "released every run") {
    // localThreshold = 0 forces the distributed star-contraction tier
    // (the driver union-find tier persists nothing)
    val pairs = (0L until 300L).map(i => (i, i + 1L)).toDF("a", "b")
    val baseline = persistedCount()
    (1 to 5).foreach { i =>
      val out = graft.dedup.Dedup.clusterize(pairs, "id", localThreshold = 0L)
      out.count()
      out.unpersist(blocking = true)
      assert(persistedCount() == baseline,
        s"clusterize(distributed) leaked storage on run $i: " +
          spark.sparkContext.getPersistentRDDs.values
            .map(_.toString).mkString(", "))
    }
  }

  test("pageRank 5x: cadence + final checkpoints are released every run") {
    val edges = (0L until 400L).map(i => (i % 97L, (i * 31L) % 97L))
      .toDF("src", "dst").distinct()
    val baseline = persistedCount()
    (1 to 5).foreach { i =>
      // 12 iters with the default cadence (5) exercises BOTH the
      // intermediate-checkpoint release and the final cleanup handle
      val (ranks, cleanup) =
        graft.ops.LinkGraph.pageRankWithCleanup(edges, iters = 12)
      ranks.count()
      cleanup()
      assert(persistedCount() == baseline,
        s"pageRank leaked storage on run $i: " +
          spark.sparkContext.getPersistentRDDs.values
            .map(_.toString).mkString(", "))
    }
  }
}
