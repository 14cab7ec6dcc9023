package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ExactSubstr-style duplicated-span removal (Lee et al. '22 §3.1) —
  * the span-removal third of the exact-dedup family, split from
  * Dedup.scala for file hygiene (VERDICT r14 #6). Mixed into
  * [[Dedup]]; every call site keeps the `Dedup.removeDuplicateSpans*`
  * API. The shared first-occurrence rank machinery stays in
  * Dedup.scala (paragraph/window dedup use it too).
  */
private[dedup] trait SpanRemovalOps { self: Dedup.type =>

  /** ExactSubstr-style duplicated-SPAN removal (Lee et al. '22,
    * "Deduplicating Training Data Makes Language Models Better" §3.1:
    * remove the repeated substring itself, everywhere past its first
    * occurrence, rather than dropping or keeping whole documents —
    * their suffix-array ExactSubstr tool, here as the standard
    * distributed sliding-window approximation at token granularity).
    *
    * Contract: every `windowTokens`-token sliding window that occurs
    * more than once in the corpus (any doc, any alignment — including
    * a second occurrence inside the SAME doc) keeps its globally first
    * occurrence (lexicographic (id, pos)) and is removed everywhere
    * else; removed windows union into maximal spans per doc (token-set
    * semantics, so overlapping windows merge for free). A duplicated
    * span of length L ≥ windowTokens is covered end-to-end by its own
    * sliding windows, so the whole span disappears — contrast
    * [[windowDedup]], whose NON-overlapping chunks miss any duplicate
    * shifted off chunk alignment. Returns (id, clean_text, n_tokens,
    * n_removed); docs shorter than the window pass through untouched;
    * NULL text passes through as NULL on all three output columns.
    * Known ExactSubstr edge (documented, spec-pinned): a doc can win
    * one window and lose an overlapping one, leaving sub-window
    * fragments at span borders — exactly the reference tool's
    * behavior.
    *
    * Scale shape (the [[paragraphDedup]] discipline, token-granular):
    * the first-occurrence rank shuffles ONLY (16-byte digest, id,
    * pos) triples — one row per corpus token, never the text — and is
    * the sort-free two-phase min of [[firstOccurrenceRank]], so a hot
    * boilerplate window repeated across 10⁸ docs cannot pin one sort
    * reducer; the
    * removal relation is duplication-bound and id-keyed; text moves
    * once, and each doc is rebuilt by one compiled pass. Window
    * generation is one compiled loop per doc
    * ([[graft.text.CorpusAudit.gramsUdf]]).
    */
  def removeDuplicateSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 50
  ): DataFrame = {
    require(windowTokens >= 1, "windowTokens >= 1")
    val wins = df
      .select(col(idCol),
        posexplode(
          graft.text.CorpusAudit.gramsUdf(windowTokens)(col(textCol)))
          .as(Seq("pos", "__win")))
      .select(col(idCol), col("pos").cast("long").as("pos"),
        unhex(md5(col("__win"))).as("__digest"))
    val drops = firstOccurrenceRank(wins, idCol, "pos")
      .filter(col("__k") =!= col("__first"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("pos"))).as("__drop_pos"))
    spanRebuild(df, drops, idCol, textCol, windowTokens)
  }

  /** Shared tail of the span-removal family: graft the id-keyed drop
    * relation `(id, __drop_pos)` back onto the corpus and rebuild each
    * doc in one compiled pass. NULL text passes through as NULL
    * (clean_text/n_tokens/n_removed all NULL — null in, null out),
    * matching the SQL oracle's semantics instead of coercing to "".
    */
  private def spanRebuild(
      df: DataFrame,
      drops: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int
  ): DataFrame = {
    val nToks = when(col(textCol).isNotNull,
      size(split(col(textCol), " ")).cast("long"))
    df.select(col(idCol), col(textCol), nToks.as("n_tokens"))
      .join(drops, Seq(idCol), "left")
      .withColumn("__r",
        spanRemoveUdf(windowTokens)(col(textCol), col("__drop_pos")))
      .select(col(idCol),
        when(col(textCol).isNotNull, col("__r._1")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - col("__r._2")).as("n_removed"))
  }

  /** Incremental [[removeDuplicateSpans]] — the refresh/ingest shape:
    * scrub from each NEW document every `windowTokens`-token window
    * that occurs anywhere in the STANDING corpus (the curated history
    * always wins — no rank, its copy is by definition first), plus —
    * when `batchInternal` (default) — any window already seen EARLIER
    * in the new batch itself ((id, pos) order, so batch-internal
    * duplication collapses exactly as the batch version would).
    * History documents are never rewritten. `batchInternal = false` is
    * the order-free posture
    * [[graft.streaming.Incremental.spanScrubStream]] runs: the scrub
    * is then a pure function of (doc, history), invariant under any
    * micro-batching, and the rank shuffle is skipped entirely.
    *
    * Scale shape: the history side reduces to its DISTINCT window
    * digests (16 bytes per distinct window, built once per refresh —
    * at a standing 100 TB corpus this is the persisted window index a
    * refresh loop maintains incrementally, the same posture as
    * [[containmentPairsAgainst]]'s history postings); the join keys
    * new-batch digests against it — batch-sized, not corpus-sized —
    * and the rebuild is the batch-only compiled pass.
    */
  def removeDuplicateSpansAgainst(
      newDf: DataFrame,
      histDf: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 50,
      batchInternal: Boolean = true
  ): DataFrame =
    removeDuplicateSpansAgainstIndex(newDf,
      historySpanIndex(histDf, idCol, textCol, windowTokens),
      idCol, textCol, windowTokens, batchInternal)

  /** The history side of [[removeDuplicateSpansAgainst]] — the
    * standing corpus's DISTINCT window digests — precomputed so a
    * STREAMING ingest ([[graft.streaming.Incremental.spanScrubStream]])
    * can build (and cache) it once per stream instead of re-scanning
    * the history per micro-batch. Pure function of
    * (histDf, windowTokens); caller owns any persistence.
    */
  def historySpanIndex(
      histDf: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int
  ): DataFrame =
    spanWindows(histDf, idCol, textCol, windowTokens)
      .select("__digest").distinct()

  /** [[removeDuplicateSpansAgainst]] with the history digest index
    * supplied by [[historySpanIndex]] — identical output rows.
    */
  def removeDuplicateSpansAgainstIndex(
      newDf: DataFrame,
      histIdx: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int = 50,
      batchInternal: Boolean = true
  ): DataFrame = {
    require(windowTokens >= 1, "windowTokens >= 1")
    val newWins = spanWindows(newDf, idCol, textCol, windowTokens)
    // window known to history (semi-join on 16-byte digests)
    val inHist = newWins
      .join(histIdx, Seq("__digest"), "left_semi")
      .select(col(idCol), col("pos"))
    // `batchInternal = false` is the STREAMING posture: each doc's
    // scrub is then a pure function of (doc, static history), so any
    // micro-batching of the input emits the same rows — the rank
    // window (and its shuffle) is skipped entirely
    val dropRows =
      if (!batchInternal) inHist
      else {
        val inBatch = firstOccurrenceRank(newWins, idCol, "pos")
          .filter(col("__k") =!= col("__first"))
          .select(col(idCol), col("pos"))
        // duplicate (id, pos) rows across the two branches are fine —
        // spanRemoveUdf's coverage-array union is idempotent on
        // repeated positions, so no distinct (and its shuffle) needed
        inHist.union(inBatch)
      }
    val drops = dropRows
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("pos"))).as("__drop_pos"))
    spanRebuild(newDf, drops, idCol, textCol, windowTokens)
  }

  /** (id, pos, md5-digest) of every `windowTokens`-token window —
    * the shared projection of the against/index span faces. */
  private def spanWindows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      windowTokens: Int
  ): DataFrame = df
    .select(col(idCol),
      posexplode(
        graft.text.CorpusAudit.gramsUdf(windowTokens)(col(textCol)))
        .as(Seq("pos", "__win")))
    .select(col(idCol), col("pos").cast("long").as("pos"),
      unhex(md5(col("__win"))).as("__digest"))

  /** In-row span scrub for [[removeDuplicateSpans]]: union the dropped
    * windows' [pos, pos+w) token ranges, emit surviving tokens joined
    * by single spaces (identity when nothing is dropped — split on
    * ' ' keeps empty tokens, so rejoining reproduces the original
    * byte-for-byte), and report the kept count.
    */
  private def spanRemoveUdf(w: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String, drops: Seq[Long]) =>
      if (text == null) ("", 0L)
      else if (drops == null || drops.isEmpty)
        (text, text.split(" ", -1).length.toLong)
      else {
        val toks = text.split(" ", -1)
        val covered = new Array[Boolean](toks.length)
        drops.foreach { p =>
          var i = p.toInt
          val end = math.min(toks.length, p.toInt + w)
          while (i < end) { covered(i) = true; i += 1 }
        }
        val sb = new java.lang.StringBuilder(text.length)
        var kept = 0L; var first = true; var i = 0
        while (i < toks.length) {
          if (!covered(i)) {
            if (first) first = false else sb.append(' ')
            sb.append(toks(i)); kept += 1
          }
          i += 1
        }
        (sb.toString, kept)
      }
    }
}
