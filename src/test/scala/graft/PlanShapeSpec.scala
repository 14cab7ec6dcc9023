package graft

import graft.queries.Registry

/** Plan-shape regression guards: the properties that make these queries
  * scale (pushdown, pruning, broadcast, top-k without global sort) are
  * asserted so a refactor can't silently regress them (SURVEY §4).
  */
class PlanShapeSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Registry.byName(name).fn(spark, dir).queryExecution.executedPlan.toString

  test("q_s1_scan_project prunes the scan to the projected columns") {
    val p = plan("q_s1_scan_project")
    assert(p.contains("ReadSchema"), p)
    // only the 4 projected columns are read, not the full table
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("c_custkey") && read.contains("c_acctbal"))
    assert(!read.contains("c_nationkey"), read)
  }

  test("q_f1 filter is evaluated at/near the scan, not post-shuffle") {
    val p = plan("q_f1_subscriber_threshold")
    val scanIdx = p.indexOf("Scan parquet")
    val filterIdx = p.indexOf("Filter")
    assert(scanIdx >= 0 && filterIdx >= 0)
    // formatted tree prints top-down: Filter directly above the scan
    assert(filterIdx < scanIdx, p)
  }

  test("q_j1 joins with a broadcast of the dimension side") {
    assert(plan("q_j1_catalog_join").contains("BroadcastHashJoin"))
  }

  test("q_o1_o2 compiles to TakeOrderedAndProject (no full sort)") {
    assert(plan("q_o1_o2_topk").contains("TakeOrderedAndProject"))
  }

  test("q_a2 global max is a broadcast, not an empty-partition window") {
    val p = plan("q_a2_minmax_score")
    assert(!p.contains("Window"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
  }

  test("q_o3_topk_native plans the custom operator with zero Sort nodes") {
    val p = plan("q_o3_topk_native")
    assert(p.contains("TopKPerKey"), p)
    // the outer orderBy is the only sort allowed (the operator itself
    // must not sort partitions)
    val inner = p.substring(p.indexOf("TopKPerKey"))
    assert(!inner.contains("Sort"), inner)
  }

  test("q_url_canonical_dedup is one scan + one hash exchange (canonical key dedup)") {
    val p = plan("q_url_canonical_dedup")
    // canonicalization is a pure projection; the only shuffle is the
    // final groupBy on the canonical string (plus its agg pair)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("q_url_domain_quota plans the native TopKPerKey, no per-partition sort") {
    val p = plan("q_url_domain_quota")
    assert(p.contains("TopKPerKey"), p)
    val inner = p.substring(p.indexOf("TopKPerKey"))
    assert(!inner.contains("Sort"), inner)
  }

  test("q_sample_cluster_balanced plans the native TopKPerKey, no window sort") {
    val p = plan("q_sample_cluster_balanced")
    assert(p.contains("TopKPerKey"), p)
    // the quota cap must be the bounded-heap operator, not a
    // row_number window (which would sort every cluster's full
    // membership on the exchange's reduce side)
    assert(!p.contains("Window"), p)
  }

  test("q_dedup_edit_distance never plans a nested-loop/cartesian pair join") {
    val p = plan("q_dedup_edit_distance")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_text_packing shards by range — the corpus never hits one window partition") {
    val p = plan("q_text_packing")
    assert(p.contains("rangepartitioning"), p)
    // the corpus-side window must be partitioned (by shard); the only
    // un-partitioned window allowed is the P-row shard-base prefix,
    // which sits under a broadcast
    assert(p.contains("BroadcastExchange"), p)
  }

  test("q_text_gopher_gate is one scan, zero hash exchanges (pure per-row gate)") {
    val p = plan("q_text_gopher_gate")
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 1, p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q_sample_budget broadcasts the weights dimension") {
    val p = plan("q_sample_budget")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_sample_shuffle shuffles only for the final range sort") {
    val p = plan("q_sample_shuffle")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("rangepartitioning"), p)
  }

  test("q_gate_adaptive_band broadcasts the per-group band table back") {
    val p = plan("q_gate_adaptive_band")
    // the corpus side must NOT shuffle for the gate: the band table
    // (one row per group) broadcasts onto it
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_dedup_substring joins only on keys — no nested-loop/pairwise plan") {
    val p = plan("q_dedup_substring")
    // every join is keyed (hash or sort-merge); duplicate-window
    // detection must stay a shuffle on the 8-byte hash, never pairwise
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_text_lm_quality broadcasts the LM counts model") {
    val p = plan("q_text_lm_quality")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_url_blocklist matches via a BROADCAST semi-join (no blocklist shuffle)") {
    val p = plan("q_url_blocklist")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"blocklist match is not a broadcast semi-join:\n$p")
  }

  test("events.ts vintage normalization does NOT block pushdown: a " +
    "user_id filter still reaches the parquet scan as a PushedFilter") {
    import org.apache.spark.sql.functions._
    val df = graft.core.Graft.table(spark, dir, "events")
      .filter(col("user_id") === 7L)
      .select("event_id", "ts")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: ["), p)
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).get
    assert(pushed.contains("user_id"),
      s"user_id filter not pushed through the ts-normalization projection: $pushed")
  }

  test("q_text_gopher_ngrams is one scan, zero exchanges (pure per-row pass)") {
    val p = plan("q_text_gopher_ngrams")
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 1, p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("q_text_fim is one scan with no hash exchange (pure projection + output sort)") {
    val p = plan("q_text_fim")
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 1, p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("seedCentroidApply plans zero exchanges (stateless broadcast-literal scoring)") {
    val e = graft.core.Graft.table(spark, dir, "embeddings")
    val model = graft.similarity.Ann.seedCentroidFit(
      e.filter(org.apache.spark.sql.functions.col("label") === 0),
      "vec_id", "embedding")
    val p = graft.similarity.Ann
      .seedCentroidApply(e, model, "vec_id", "embedding", 0.2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("softDedupWeights shuffles digests only — corpus text stays out of every exchange") {
    // text reduces to (id, content_key, n_tok) at the scan projection;
    // the count aggregation and join-back shuffle that triple only
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.dedup.Dedup
      .softDedupWeights(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val at = p.indexOf("Exchange hashpartitioning(content_key")
    assert(at >= 0, s"no digest-keyed exchange found:\n$p")
    // no exchange feeder anywhere in the plan carries the raw text
    // attribute: after the scan projections, text#N must only appear
    // inside Project/Scan nodes, never in an Exchange line
    for (line <- p.linesIterator if line.contains("Exchange "))
      assert(!line.contains("text#"), s"corpus text rides a shuffle: $line")
  }

  test("q_text_span_corrupt is a pure projection — no hash exchange, no window") {
    val p = plan("q_text_span_corrupt")
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 1, p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Window"), p)
  }

  test("corpusManifest shuffles digests only — text stays out of every exchange") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.ops.Profile
      .corpusManifest(docs, "doc_id", "text", "source", groupSize = 16)
      .queryExecution.executedPlan.toString
    for (line <- p.linesIterator if line.contains("Exchange "))
      assert(!line.contains("text#"), s"corpus text rides a shuffle: $line")
  }

  test("q_text_lm_backoff shuffles tokens and counts, never document text") {
    val p = plan("q_text_lm_backoff")
    for (line <- p.linesIterator if line.contains("Exchange "))
      assert(!line.contains("text#"), s"corpus text rides a shuffle: $line")
  }

  test("q_text_inverted_index caps postings via TopKPerKey with no inner sort") {
    val p = plan("q_text_inverted_index")
    assert(p.contains("TopKPerKey"), p)
    val inner = p.substring(p.indexOf("TopKPerKey"))
    // the only Sort below the operator is none — sort_array is an
    // expression, not a Sort node
    assert(!inner.contains("\nSort") && !inner.contains("+- Sort"), inner)
  }

  test("q_text_html_extract is a pure projection — zero exchanges") {
    val p = plan("q_text_html_extract")
    // extraction is the widest stage of a crawl pipeline: it must stay
    // embarrassingly parallel (the only allowed movement is the final
    // ORDER BY's range exchange)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Window"), p)
  }

  test("q_text_top_ngrams ranks via TakeOrderedAndProject, not a global sort") {
    val p = plan("q_text_top_ngrams")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_agg_rollup computes every grouping set in ONE shuffle (Expand, not one job per level)") {
    val p = plan("q_agg_rollup")
    assert(p.contains("Expand"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    // one hash exchange feeds the final aggregate for ALL levels (the
    // distinct-aggregate pair over Expand); never one per level
    assert(exchanges <= 2, s"expected <=2 hash exchanges, got $exchanges:\n$p")
  }

  test("q_event_funnel stays on keyed shuffle joins — no nested-loop fallback") {
    val p = plan("q_event_funnel")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("corpus-sized similarity passes run native expressions, not Scala UDFs " +
    "(quantize_1m / pq_encode / sign_lsh in the executed plans)") {
    import org.apache.spark.sql.functions._
    val e = graft.core.Graft.table(spark, dir, "embeddings")
    // sign-LSH bucketer: native, and nothing UDF-shaped in the projection
    val lshPlan = graft.similarity.Ann
      .signLshBuckets(e, "vec_id", "embedding", bits = 4)
      .queryExecution.executedPlan.toString
    assert(lshPlan.contains("sign_lsh"), lshPlan)
    assert(!lshPlan.contains("UDF"), lshPlan)
    // PQ index: the corpus-sized encode relation is the native encoder
    val idx = graft.similarity.Pq.pqBuild(e, "vec_id", "embedding", m = 4, k = 16)
    val codesPlan = idx.codes.queryExecution.executedPlan.toString
    assert(codesPlan.contains("pq_encode"), codesPlan)
    assert(!codesPlan.contains("UDF"), codesPlan)
    // quantizer behind every quantized-cosine dedup path
    val qPlan = e.select(graft.similarity.Ann.quantizeUdf(col("embedding")))
      .queryExecution.executedPlan.toString
    assert(qPlan.contains("quantize_1m"), qPlan)
    assert(!qPlan.contains("UDF"), qPlan)
  }

  test("unpartitioned windows are enumerated and pinned: every " +
    "WindowExec with no partitionSpec in every registered query's plan " +
    "sits above a LIMIT/top-k bound or is on the adjudicated " +
    "dimension-sized allowlist (a pre-limit unpartitioned window is a " +
    "single-reducer sort at 100 TB)") {
    import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, LocalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    // query → why its unpartitioned window is safe at scale (each
    // window's INPUT is dimension-sized or k-bounded by construction).
    // Full r16 enumeration (graft.tools.WinAudit one-off): the ONLY
    // unpartitioned windows across all 202 registered plans are
    // q_text_bpe_pairs / q_text_index_search ×3 / q_text_zipf — all
    // k-bounded above a limit/top-k (boundedBelow passes) — and the
    // three below.
    val pinned: Map[String, String] = Map(
      // apportionment windows rank the (source, n_tok) AGGREGATE — the
      // relation is #sources rows (dimension-sized) by construction;
      // the corpus never reaches these windows (temperaturePlan doc)
      "q_sample_temperature" ->
        "largest-remainder apportionment over the per-source aggregate"
    )
    def boundedBelow(p: SparkPlan): Boolean = p.collectFirst {
      case _: GlobalLimitExec => ()
      case _: LocalLimitExec => ()
      case _: CollectLimitExec => ()
      case _: TakeOrderedAndProjectExec => ()
      case _: WindowGroupLimitExec => ()
    }.isDefined
    // AQE off for the audit: the adaptive wrapper is a leaf that hides
    // the tree, and the NON-adaptive sparkPlan leaves subquery plans
    // logical (collectWithSubqueries would CCE on them)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val offenders =
      try {
        (for {
          q <- Registry.all
          plan = Registry.byName(q.name).fn(spark, dir).queryExecution.executedPlan
          w <- plan.collectWithSubqueries {
            case w: WindowExec if w.partitionSpec.isEmpty => w
          }
          if !boundedBelow(w.child) && !pinned.contains(q.name)
        } yield q.name).distinct.sorted
      } finally spark.conf.unset("spark.sql.adaptive.enabled")
    assert(offenders.isEmpty,
      s"un-adjudicated pre-limit unpartitioned WindowExec in: $offenders")
  }

  test("no oracle query plans a CartesianProduct") {
    for (q <- Registry.all if q.oracle.isDefined) {
      val p = Registry.byName(q.name).fn(spark, dir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"${q.name} has a cartesian:\n$p")
    }
  }

  test("containment verify joins broadcast the doc-array side below the bound") {
    // the operator caches its output, so the verify plan lives inside
    // the InMemoryRelation — pull the cached plan out and assert both
    // verify joins are broadcast (the 25 GB-shuffle regression guard)
    val out = graft.dedup.Dedup.containmentPairs(
      graft.core.Graft.table(spark, dir, "documents"),
      "doc_id", "text", n = 3, minContainment = 0.8, maxDf = Long.MaxValue)
    val cached = out.queryExecution.optimizedPlan.collect {
      case im: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        im.cachedPlan.toString
    }
    assert(cached.nonEmpty, out.queryExecution.optimizedPlan.toString)
    val p = cached.mkString("\n")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    // Both verify sides project to identical columns/constraints so
    // the two broadcast subtrees CANONICALIZE equal — under AQE's
    // TableCacheQueryStage wrapping the stages still materialize
    // separately (no ReusedExchange), so the session-memory story for
    // whole-catalog runs is Verify's between-query GC nudge, not
    // reuse. Guard the count at ≤3 exchanges (posting index + two
    // verify sides) so a refactor can't quietly add more.
    val nodes2 = out.queryExecution.optimizedPlan.collect {
      case im: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        im.cachedPlan
    }.flatMap(allNodes)
    val bx = nodes2.collect {
      case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => e
    }
    assert(bx.map(System.identityHashCode).distinct.size <= 3,
      s"verify plan grew extra broadcasts (${bx.size}):\n$p")
    out.unpersist()
  }

  test("jaccard-prefix verify joins broadcast the doc-array side below the bound") {
    val out = graft.dedup.Dedup.ngramJaccardPairsPrefix(
      graft.core.Graft.table(spark, dir, "documents"),
      "doc_id", "text", n = 3, minJaccard = 0.8, maxDf = Long.MaxValue)
    val cached = out.queryExecution.optimizedPlan.collect {
      case im: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        im.cachedPlan.toString
    }
    assert(cached.nonEmpty, out.queryExecution.optimizedPlan.toString)
    val p = cached.mkString("\n")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    out.unpersist()
  }

  /** Flatten a physical plan through AQE wrappers and query stages. */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      Seq(q) ++ allNodes(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      Seq(r) ++ allNodes(r.child)
    case other => Seq(other) ++ other.children.flatMap(allNodes)
  }

  test("containment + jaccard verify ABOVE the broadcast bound: bucketed " +
    "docs co-location, identical pairs, both array scans exchange-free, " +
    "at most one array-bearing exchange (the irreducible per-candidate ship)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    val docs = graft.core.Graft.table(spark, dir, "documents")
    def runContain() = graft.dedup.Dedup.containmentPairs(
      docs, "doc_id", "text", n = 3, minContainment = 0.8, maxDf = Long.MaxValue)
    def runJaccard() = graft.dedup.Dedup.ngramJaccardPairsPrefix(
      docs, "doc_id", "text", n = 3, minJaccard = 0.8, maxDf = Long.MaxValue)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.get(0), r.get(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val baseC = runContain(); val wantC = rows(baseC); baseC.unpersist()
    val baseJ = runJaccard(); val wantJ = rows(baseJ); baseJ.unpersist()
    val prevBound = spark.conf.getOption("spark.graft.verify.broadcastMaxDocs")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.graft.verify.broadcastMaxDocs", "10")
    // plan capture is off by default (production runs must not pin
    // dead executed plans) — this spec is its one consumer
    spark.conf.set("spark.graft.verify.capturePlan", "true")
    // keep the planner honest: without this the tiny bucketed table
    // would be broadcast anyway and the co-location path would go
    // untested
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for ((run, want, label) <- Seq(
          (() => runContain(), wantC, "containment"),
          (() => runJaccard(), wantJ, "jaccard"))) {
        graft.dedup.Dedup.lastVerifyPlan = None
        val out = run()
        assert(rows(out) == want, s"$label pairs differ above the bound")
        val nodes = graft.dedup.Dedup.lastVerifyPlan match {
          case Some(p) => allNodes(p)
          case None => fail(s"$label did not take the above-bound path")
        }
        val bucketedScans = nodes.collect {
          case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f
        }
        assert(bucketedScans.size >= 2,
          s"$label: expected both verify sides on bucketed scans:\n" +
            nodes.map(_.nodeName).mkString(", "))
        // the docs arrays never cross a shuffle from their scans: the
        // only exchange allowed to carry an array column is the single
        // candidate-side intermediate (one array per candidate pair)
        val arrayExchanges = nodes.collect {
          case e: ShuffleExchangeExec
              if e.output.exists(_.dataType.isInstanceOf[ArrayType]) => e
        }
        assert(arrayExchanges.size <= 1,
          s"$label: ${arrayExchanges.size} array-bearing exchanges:\n" +
            arrayExchanges.mkString("\n"))
        out.unpersist()
      }
    } finally {
      graft.dedup.Dedup.lastVerifyPlan = None
      spark.conf.unset("spark.graft.verify.capturePlan")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      prevBound match {
        case Some(v) => spark.conf.set("spark.graft.verify.broadcastMaxDocs", v)
        case None => spark.conf.unset("spark.graft.verify.broadcastMaxDocs")
      }
    }
  }

  test("containment verify above the bound on a PRE-BUCKETED corpus: no " +
    "temp-table write, docs arrays scan-local, identical pairs") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val docs = graft.core.Graft.table(spark, dir, "documents")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.get(0), r.get(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val base = graft.dedup.Dedup.containmentPairs(
      docs, "doc_id", "text", n = 3, minContainment = 0.8, maxDf = Long.MaxValue)
    val want = rows(base); base.unpersist()
    val tbl = s"graft_prebucketed_docs_${System.nanoTime}"
    graft.layout.Layout.writeBucketed(
      docs.select("doc_id", "text"), tbl, "doc_id", buckets = 4)
    val prevBound = spark.conf.getOption("spark.graft.verify.broadcastMaxDocs")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAuto = spark.conf
      .getOption("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.graft.verify.broadcastMaxDocs", "10")
    spark.conf.set("spark.graft.verify.capturePlan", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // the engine session (Graft.session / Bench / Verify) sets this
    // false; the shared test session must match or the scan hides its
    // bucketing when planned standalone
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      graft.dedup.Dedup.lastVerifyPlan = None
      val out = graft.dedup.Dedup.containmentPairs(
        spark.table(tbl), "doc_id", "text",
        n = 3, minContainment = 0.8, maxDf = Long.MaxValue)
      assert(rows(out) == want, "pre-bucketed pairs differ")
      val nodes = graft.dedup.Dedup.lastVerifyPlan match {
        case Some(p) => allNodes(p)
        case None => fail("did not take an above-bound path")
      }
      // no graft_verify_docs temp table was written — every scan in
      // the verify reads the caller's own pre-bucketed table (through
      // the cached shingle projection) or testdata
      val tempScans = nodes.collect {
        case f: FileSourceScanExec
            if f.relation.location.rootPaths.exists(
              _.toString.contains("graft_verify_docs")) => f
      }
      assert(tempScans.isEmpty,
        "pre-bucketed corpus still paid the temp-table write")
      out.unpersist()
    } finally {
      graft.dedup.Dedup.lastVerifyPlan = None
      spark.conf.unset("spark.graft.verify.capturePlan")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      prevBound match {
        case Some(v) => spark.conf.set("spark.graft.verify.broadcastMaxDocs", v)
        case None => spark.conf.unset("spark.graft.verify.broadcastMaxDocs")
      }
      prevAuto match {
        case Some(v) => spark.conf
          .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", v)
        case None => spark.conf
          .unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      }
      graft.layout.Layout.dropWithLocation(spark, tbl)
    }
  }
}
