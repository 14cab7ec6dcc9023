package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH, SimHash. All are pure DataFrame
  * transforms; candidate generation always goes through a bucketing
  * key so the pairwise work is bounded by bucket size, never O(n²)
  * over the corpus — the property that keeps these viable at 100 TB.
  */
object Dedup extends SpanRemovalOps with SimHashOps {

  private[dedup] lazy val log =
    org.apache.logging.log4j.LogManager.getLogger("graft.dedup.Dedup")

  /** Exact dedup: hash-groupBy on content digest, keep the smallest id.
    * One shuffle on the digest; digest computed map-side so only
    * (digest, id) shuffles, never the payload.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("content_key"))
      .groupBy("content_key")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Normalization-insensitive exact dedup (the RefinedWeb / C4
    * "fuzzy-exact" recipe): the content key is
    * [[graft.text.TextAnalysis.normalizedDigest]] — lowercase, strip
    * punctuation, collapse whitespace — so trivially-reformatted
    * copies collapse while real edits survive. Same shuffle shape as
    * [[exact]]: (digest, id) only, payload never moves.
    */
  def exactNormalized(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = graft.text.TextAnalysis.normalizedText(col(textCol))
    // a doc whose normalization is empty (pure punctuation/whitespace)
    // OR null (null text normalizes to null, and length(null)/md5(null)
    // are null — without the guard every null-text doc would collapse
    // into one null content_key group) shares no CONTENT with any
    // other such doc, so each gets a per-doc key and survives as its
    // own group
    val key = when(norm.isNull || length(norm) === 0,
      concat(lit("empty:"), col(idCol).cast("string"))).otherwise(md5(norm))
    df.select(col(idCol), key.as("content_key"))
      .groupBy("content_key")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
  }

  /** SoftDeDup-style duplicate REWEIGHTING (He et al. '24, "SoftDedup:
    * an Efficient Data Reweighting Method for Speeding Up Language
    * Model Pre-training"): instead of dropping duplicate documents,
    * every member of a duplicate group keeps a training weight equal
    * to the inverse of its group's multiplicity — the corpus-level
    * token mass of each distinct content is preserved at exactly one
    * copy's worth, but no individual document (with its surrounding
    * metadata, domain mix, ordering) is discarded. Grouping is the
    * [[exactNormalized]] key (lowercase / strip punctuation / collapse
    * whitespace), so reformatted copies share a group; empty- or
    * null-normalized documents get per-doc keys and weight 1.
    *
    * Returns one row per input document:
    * (idCol, content_key, dup_count, n_tok, eff_tok, weight) where
    * eff_tok = n_tok div dup_count (the document's surviving token
    * budget, integer) and weight = 1.0 / dup_count (IEEE-exact, the
    * per-example loss multiplier a trainer consumes).
    *
    * Scale: text never shuffles — the map side reduces every document
    * to (id, digest, n_tok); the group count is one digest-keyed
    * aggregation and one digest-keyed join back, both metadata-width.
    */
  def softDedupWeights(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = graft.text.TextAnalysis.normalizedText(col(textCol))
    val key = when(norm.isNull || length(norm) === 0,
      concat(lit("empty:"), col(idCol).cast("string"))).otherwise(md5(norm))
    val keyed = df.select(
      col(idCol),
      key.as("content_key"),
      graft.text.TextAnalysis.tokenCountWs(col(textCol)).as("n_tok"))
    val counts = keyed
      .groupBy("content_key")
      .agg(count(lit(1)).as("dup_count"))
    keyed
      .join(counts, Seq("content_key"))
      .withColumn("eff_tok", expr("CAST(n_tok div dup_count AS BIGINT)"))
      .withColumn("weight", lit(1.0d) / col("dup_count").cast("double"))
      .select(col(idCol), col("content_key"), col("dup_count"),
        col("n_tok"), col("eff_tok"), col("weight"))
  }

  /** Paragraph-level exact dedup (the C4 / Dolma recipe one level below
    * document dedup): split every document into NEWLINE-delimited
    * paragraphs (trimmed; blank lines dropped), keep only the FIRST
    * occurrence of each distinct paragraph corpus-wide (first =
    * smallest (id, paragraph index)), and reassemble each document
    * from its surviving paragraphs, newline-joined. Boilerplate that
    * repeats across pages (nav text, footers, license blurbs) dies
    * here while the unique prose survives. Because paragraphs are the
    * document's OWN line structure, a duplicate paragraph is caught
    * wherever it sits in the page: an insertion above it shifts every
    * fixed-width window out of alignment but leaves the paragraph
    * itself — and its digest — intact (TextDedupSpec pins this).
    *
    * For corpora without newline structure use [[windowDedup]], the
    * fixed word-count-window face of the same first-occurrence rule.
    *
    * Scale shape (shared with windowDedup): the first-occurrence rank
    * shuffles ONLY (md5(para), id, idx) — 16-byte digests, never the
    * paragraph text (at 100 TB a text-carrying rank shuffle would be
    * the corpus itself); the surviving (id → kept idx set) relation is
    * id-keyed and compact. Text moves exactly once, keyed by id, and
    * the reassembly groupBy reuses that partitioning (no second text
    * exchange). Docs whose every paragraph was seen before survive
    * with clean_text='' (downstream length gates drop them, auditable
    * rather than silently vanished).
    */
  def paragraphDedup(
      df: DataFrame,
      idCol: String,
      textCol: String
  ): DataFrame = {
    val lines = split(col(textCol), "\n")
    val paras = df
      .select(col(idCol), posexplode(lines).as(Seq("para_idx", "__raw")))
      .withColumn("para", trim(col("__raw")))
      .filter(col("para") =!= "")
      .select(col(idCol), col("para_idx").cast("long").as("para_idx"),
        col("para"))
    // paragraph count is arithmetic over the doc's own lines — no
    // second explode pass over the corpus
    val nParas = when(col(textCol).isNotNull,
      size(filter(lines, p => trim(p) =!= "")).cast("long"))
      .otherwise(0L)
    firstOccurrenceDedup(df, paras, idCol, textCol, nParas, lineRebuildUdf)
  }

  /** In-row line rebuild shared by [[paragraphDedup]] and
    * [[boilerplateRemove]]: re-split the doc's own lines and keep the
    * surviving raw indices (kept indices only ever point at nonempty
    * trimmed paras, so the emptiness re-check is unnecessary). Trim
    * matches Spark's trim(): the space character only.
    */
  private val lineRebuildUdf
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String, kept: Seq[Long]) =>
      if (text == null) ""
      else {
        val ls = text.split("\n", -1)
        val ks = kept.toSet
        val sb = new java.lang.StringBuilder(text.length)
        var i = 0; var first = true
        while (i < ls.length) {
          if (ks.contains(i.toLong)) {
            val l = ls(i)
            var a = 0; var b = l.length
            while (a < b && l.charAt(a) == ' ') a += 1
            while (b > a && l.charAt(b - 1) == ' ') b -= 1
            if (first) first = false else sb.append('\n')
            sb.append(l, a, b)
          }
          i += 1
        }
        sb.toString
      }
    }

  /** CCNet-style boilerplate line REMOVAL (Wenzek et al. '20 §3.1
    * line-level dedup; RefinedWeb's repeated-line scrub): drop EVERY
    * occurrence of any line whose corpus document-frequency reaches
    * `maxDf` — navigation chrome, cookie banners, subscribe footers —
    * and reassemble each document from its surviving lines. Contrast
    * with [[paragraphDedup]], which keeps a repeated paragraph's FIRST
    * occurrence: a line frequent enough to be boilerplate is noise in
    * every document, including the first one crawled.
    *
    * Scale shape (the paragraphDedup contract): text never shuffles.
    * Document frequencies aggregate over distinct (16-byte digest, id)
    * pairs; the kept-index relation joins digests to per-digest counts
    * (both digest-keyed, co-partitioned by the one exchange) and
    * collapses to one compact (id, sorted kept-idx array) row per doc;
    * `clean_text` is rebuilt by the compiled in-row loop after the one
    * id-keyed join. A doc of pure boilerplate survives with
    * clean_text='' (auditable, not silently vanished).
    *
    * Returns (id, clean_text, n_kept, n_dropped).
    */
  def boilerplateRemove(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDf: Long
  ): DataFrame = {
    require(maxDf >= 2L, s"maxDf < 2 would drop every line, got $maxDf")
    val lines = split(col(textCol), "\n")
    val paras = df
      .select(col(idCol), posexplode(lines).as(Seq("para_idx", "__raw")))
      .withColumn("para", trim(col("__raw")))
      .filter(col("para") =!= "")
      .select(col(idCol), col("para_idx").cast("long").as("para_idx"),
        md5(col("para")).as("__digest"))
    val nParas = when(col(textCol).isNotNull,
      size(filter(lines, p => trim(p) =!= "")).cast("long"))
      .otherwise(0L)
    // document frequency = distinct docs containing the line (a doc
    // repeating its own header doesn't make it corpus boilerplate)
    val dfc = paras
      .select(col("__digest"), col(idCol))
      .distinct()
      .groupBy(col("__digest"))
      .agg(count(lit(1)).as("__df"))
    val keptIdx = paras
      .join(dfc, Seq("__digest"))
      .filter(col("__df") < maxDf)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("para_idx"))).as("__kept_idx"))
    df.select(col(idCol), col(textCol), nParas.as("n_paras"))
      .join(keptIdx, Seq(idCol), "left")
      .withColumn("clean_text",
        when(col("__kept_idx").isNull, lit(""))
          .otherwise(lineRebuildUdf(col(textCol), col("__kept_idx"))))
      .withColumn("n_kept",
        when(col("__kept_idx").isNull, lit(0L))
          .otherwise(size(col("__kept_idx")).cast("long")))
      .select(col(idCol), col("clean_text"), col("n_kept"),
        (col("n_paras") - col("n_kept")).as("n_dropped"))
  }

  /** Fixed word-count-window exact dedup: the [[paragraphDedup]]
    * first-occurrence rule over fixed-width word windows
    * ([[graft.text.TextAnalysis.chunkByTokens]], overlap 0) — for
    * corpora whose text carries no newline structure. Windows misalign
    * under insertions (a shifted duplicate region stops matching), so
    * prefer true paragraphs whenever the text has them — or
    * [[cdcChunkDedup]], whose content-defined boundaries survive
    * insertions.
    */
  def windowDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      wordsPerPara: Int
  ): DataFrame = {
    val paras = graft.text.TextAnalysis
      .chunkByTokens(df, idCol, textCol, maxTokens = wordsPerPara, overlap = 0)
      .select(col(idCol), col("chunk_idx").as("para_idx"), col("chunk").as("para"))
    // chunkByTokens' own nChunks formula at overlap 0
    val nParas = greatest(
      ceil(size(split(col(textCol), " ")).cast("double") / wordsPerPara),
      lit(1)).cast("long")
    firstOccurrenceDedup(df, paras, idCol, textCol, nParas,
      windowRebuildUdf(wordsPerPara))
  }

  /** Content-defined chunking dedup (LBFS, Muthitacharoen et al. '01;
    * FastCDC, Xia et al. '16 — the storage-dedup technique applied to
    * corpus text): chunk boundaries fall where the FNV-1a hash of the
    * trailing `window` characters has its low `maskBits` bits zero
    * (expected chunk ≈ 2^maskBits chars), then the
    * [[paragraphDedup]]-style first-occurrence rule runs over chunk
    * digests. Because boundaries are functions of CONTENT, not
    * position, an insertion shifts only the chunks it touches — the
    * rest of a duplicated region keeps its exact boundaries and
    * deduplicates, which is precisely what [[windowDedup]]'s fixed
    * windows cannot do (documented there).
    *
    * Boundary hashing recomputes FNV per position (O(window·n) per
    * row — window is 8; production CDC swaps in a Gear/Rabin rolling
    * hash for O(n), same boundary contract). UTF-16 code-unit fold —
    * the repo's documented BMP-only hashing caveat applies. One
    * compiled per-row pass produces the chunks; the dedup shuffles
    * (16-byte digest, id, idx) triples, never chunk text; the clean
    * doc reassembles from the row's own chunk array after one
    * id-keyed graft join.
    *
    * Returns (idCol, n_chunks, n_kept, n_dropped, clean_text).
    */
  def cdcChunkDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 8,
      maskBits: Int = 5
  ): DataFrame = {
    require(window >= 2 && maskBits >= 1 && maskBits <= 20,
      "window >= 2, maskBits in [1,20]")
    val mask = (1L << maskBits) - 1L
    val chunksUdf = udf { (text: String) =>
      if (text == null || text.isEmpty) Seq.empty[String]
      else {
        val n = text.length
        val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
        var i = window - 1
        while (i < n - 1) {
          var h = 0xcbf29ce484222325L
          var j = i - window + 1
          while (j <= i) {
            h = (h ^ text.charAt(j).toLong) * 0x100000001b3L
            j += 1
          }
          if ((h & mask) == 0L) cuts += (i + 1)
          i += 1
        }
        cuts += n
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var s = 0
        cuts.foreach { c => if (c > s) { out += text.substring(s, c); s = c } }
        out.toSeq
      }
    }
    val withChunks = df.select(col(idCol), chunksUdf(col(textCol)).as("__chunks"))
    val digests = withChunks
      .select(col(idCol),
        posexplode(col("__chunks")).as(Seq("chunk_idx", "__chunk")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        md5(col("__chunk")).as("__digest"))
    val firstW = Window.partitionBy(col("__digest"))
      .orderBy(col(idCol).asc, col("chunk_idx").asc)
    val kept = digests
      .withColumn("__occ", row_number().over(firstW))
      .filter(col("__occ") === 1)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("chunk_idx"))).as("__kept"))
    val keptArr = coalesce(col("__kept"), array().cast("array<bigint>"))
    withChunks.join(kept, Seq(idCol), "left")
      .select(
        col(idCol),
        size(col("__chunks")).cast("long").as("n_chunks"),
        size(keptArr).cast("long").as("n_kept"),
        (size(col("__chunks")) - size(keptArr)).cast("long").as("n_dropped"),
        array_join(
          transform(keptArr, i =>
            element_at(col("__chunks"), (i + 1L).cast("int"))),
          "").as("clean_text"))
  }

  /** In-row rebuild mirroring chunkByTokens at overlap 0: window i
    * covers tokens [i·w, i·w+w); kept windows' tokens re-join with
    * the same single space the chunk/window reassembly used. A null
    * text chunks to one empty window (chunkByTokens contract), so
    * kept = [0] rebuilds "".
    */
  private def windowRebuildUdf(w: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String, kept: Seq[Long]) =>
      val toks = if (text == null) Array("") else text.split(" ", -1)
      val sb = new java.lang.StringBuilder(if (text == null) 0 else text.length)
      var first = true
      kept.foreach { ki =>
        val from = (ki * w).toInt
        val until = math.min(toks.length, from + w)
        var j = from
        while (j < until) {
          if (first) first = false else sb.append(' ')
          sb.append(toks(j)); j += 1
        }
        // a null-text doc's single chunk is the empty string: keeping
        // it appends nothing, matching the reassembled '' exactly
      }
      sb.toString
    }

  /** Shared core of [[paragraphDedup]] / [[windowDedup]]: corpus-wide
    * first-occurrence rank on paragraph digests, then per-doc IN-ROW
    * reassembly of the survivors from the original text.
    *
    * Scale shape: TEXT NEVER SHUFFLES. The rank exchange carries only
    * (digest, id, idx) — 16-byte digests, never paragraphs (ScaleSpec
    * asserts the feeder projection); the per-doc survivor relation is
    * one compact (id, sorted kept-idx array) row; and `clean_text` is
    * rebuilt by the caller's compiled `rebuild(text, kept)` loop AFTER
    * the one id-keyed join, so the corpus text stays on its own scan
    * side end-to-end. (The previous formulation joined the exploded
    * paragraphs back and re-aggregated — the para-granularity text
    * exchange it cost was the whole corpus.)
    */
  private def firstOccurrenceDedup(
      df: DataFrame,
      paras: DataFrame,
      idCol: String,
      textCol: String,
      nParas: Column,
      rebuild: org.apache.spark.sql.expressions.UserDefinedFunction
  ): DataFrame =
    firstOccurrenceCore(df.select(col(idCol), col(textCol),
      nParas.as("n_paras")), paras, idCol, textCol, rebuild)
      .select(
        col(idCol),
        col("__fo_clean").as("clean_text"),
        col("__fo_kept").as("n_kept"),
        (col("n_paras") - col("__fo_kept")).as("n_dropped"))

  /** Passthrough variant of the first-occurrence core: every column of
    * `df` survives, plus `__fo_clean` (the doc rewritten to its
    * surviving windows) and `__fo_kept` (how many survived). Lets a
    * composed funnel (CurationPipeline) replace the text column in the
    * SAME join that computes the dedup instead of paying a second
    * corpus join to graft `clean_text` back on.
    */
  /** Global first-occurrence rank WITHOUT a per-digest sort: annotate
    * each `(__digest, id, pos)` occurrence with the digest's global
    * minimum `(id, pos)` so callers keep (`__k === __first`) or drop
    * (`__k =!= __first`) — exactly `row_number() over
    * (partitionBy(__digest) orderBy(id, pos)) === 1`, but skew-proof.
    *
    * Why not the window: `row_number` materializes EVERY occurrence of
    * a digest in one sort reducer — at the design point, one
    * boilerplate paragraph/window repeated across 10⁷–10⁸ documents is
    * a single skewed sort partition (the classic hot-n-gram failure).
    * Only the global minimum is needed to rank the rest: a two-phase
    * `min(struct(id, pos))` aggregate is map-side combinable (each map
    * task emits ONE row per distinct digest, so the hot key's reduce
    * input is bounded by the task count), and the join back is a
    * shuffled HASH join whose build side holds one row per distinct
    * digest in the partition while the hot probe side STREAMS — no
    * sort buffer, no spill, and AQE's skew-join splitting still
    * applies. Returns the input columns plus `__k`
    * (= struct(id, pos)) and `__first`.
    *
    * The occurrence stream IS computed twice (agg branch + probe
    * branch — column pruning makes the two subtrees structurally
    * different, so ReuseExchange cannot collapse them). Measured
    * (FirstOccAB, sf0.1, 32-word windows, min-of-3): window 0.58 s,
    * this 0.54 s, shared-repartition 0.50 s, localCheckpoint 0.39 s —
    * the double compute costs ≈0.1 s at bench scale, and the two
    * alternatives that remove it either add an unreused exchange at
    * scale (repartition) or make query CONSTRUCTION eager
    * (localCheckpoint), so the stateless formulation stays.
    */
  private[dedup] def firstOccurrenceRank(
      occ: DataFrame,
      idCol: String,
      posCol: String
  ): DataFrame = {
    val withKey = occ.withColumn("__k", struct(col(idCol), col(posCol)))
    val firsts = withKey
      .groupBy(col("__digest"))
      .agg(min(col("__k")).as("__first"))
    withKey.join(firsts.hint("shuffle_hash"), Seq("__digest"))
  }

  private def firstOccurrenceCore(
      df: DataFrame,
      paras: DataFrame,
      idCol: String,
      textCol: String,
      rebuild: org.apache.spark.sql.expressions.UserDefinedFunction
  ): DataFrame = {
    val keptIdx = firstOccurrenceRank(
      paras.select(col(idCol), col("para_idx"),
        md5(col("para")).as("__digest")),
      idCol, "para_idx")
      .filter(col("__k") === col("__first"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("para_idx"))).as("__kept_idx"))
    df.join(keptIdx, Seq(idCol), "left")
      .withColumn("__fo_clean",
        when(col("__kept_idx").isNull, lit(""))
          .otherwise(rebuild(col(textCol), col("__kept_idx"))))
      .withColumn("__fo_kept",
        when(col("__kept_idx").isNull, lit(0L))
          .otherwise(size(col("__kept_idx")).cast("long")))
      .drop("__kept_idx")
  }

  /** [[windowDedup]] with column passthrough (see
    * [[firstOccurrenceCore]]): returns `df`'s full schema plus
    * `__fo_clean`/`__fo_kept`. The composed-funnel face.
    */
  private[graft] def windowDedupKeep(
      df: DataFrame,
      idCol: String,
      textCol: String,
      wordsPerPara: Int
  ): DataFrame = {
    val paras = graft.text.TextAnalysis
      .chunkByTokens(df.select(col(idCol), col(textCol)), idCol, textCol,
        maxTokens = wordsPerPara, overlap = 0)
      .select(col(idCol), col("chunk_idx").as("para_idx"), col("chunk").as("para"))
    firstOccurrenceCore(df, paras, idCol, textCol,
      windowRebuildUdf(wordsPerPara))
  }


  /** Letter histogram (a-z counts) in ONE compiled pass over the text
    * — the edit-distance prefilter's per-doc feature. (An expression
    * formulation would scan the text 26 times via replace().)
    */
  private[graft] val letterHistUdf =
    udf { (t: String) =>
      val h = new Array[Int](26)
      if (t != null) {
        var i = 0
        while (i < t.length) {
          val c = t.charAt(i) - 'a'
          if (c >= 0 && c < 26) h(c) += 1
          i += 1
        }
      }
      h
    }

  /** L1 distance of two letter histograms — lossless edit-distance
    * lower bound: one edit op moves the histogram by at most 2 in L1,
    * so lev(a,b) >= L1/2. A 26-term compiled loop per candidate pair
    * vs the O(len·maxDist) DP it avoids.
    */
  private[graft] val histL1Udf =
    udf { (a: Seq[Int], b: Seq[Int]) =>
      var s = 0
      var i = 0
      while (i < 26) { s += math.abs(a(i) - b(i)); i += 1 }
      s
    }

  /** Edit-distance (Levenshtein) near-dup pairs: all (a, b), a.id <
    * b.id, with distance ≤ maxDist. Candidate generation blocks on
    * length bands — LOSSLESS, because dist ≤ maxDist forces
    * |len(a) − len(b)| ≤ maxDist, so with band ≥ maxDist the two
    * bucket indices differ by at most 1; each left row probes
    * {b−1, b, b+1} and every qualifying pair is formed exactly once.
    * The distance itself uses Spark's threshold variant (early-exits
    * once the band of the DP matrix exceeds maxDist — O(len·maxDist),
    * not O(len²)).
    *
    * Scale role: length-banding bounds candidates only as well as the
    * length histogram is flat; at corpus scale this is the VERIFY
    * stage composed behind a real candidate generator (MinHash/LSH or
    * [[ngramJaccardPairsPrefix]]), exactly how fuzzy-dedup pipelines
    * deploy edit distance. As a standalone scan it is for
    * band-limited relations (titles, URLs, short fields).
    */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int
  ): DataFrame = {
    require(maxDist >= 1, "editDistancePairs needs maxDist >= 1")
    // null text has no edit distance to anything — drop up front so the
    // compiled histogram/DP path never sees a null row
    val nn = df.filter(col(textCol).isNotNull)
    val base = nn.select(
      col(idCol).as("id_a"),
      col(textCol).as("t_a"),
      length(col(textCol)).cast("long").as("len_a"))
      .withColumn("h_a", letterHistUdf(col("t_a")))
    val probe = base
      .withColumn("bucket0", floor(col("len_a") / maxDist))
      .withColumn(
        "bucket",
        explode(array(col("bucket0") - 1, col("bucket0"), col("bucket0") + 1)))
      .drop("bucket0")
    val build = nn.select(
      col(idCol).as("id_b"),
      col(textCol).as("t_b"),
      length(col(textCol)).cast("long").as("len_b"),
      floor(length(col(textCol)).cast("long") / maxDist).as("bucket"))
      .withColumn("h_b", letterHistUdf(col("t_b")))
    probe
      .join(build, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(col("len_a") - col("len_b")) <= maxDist)
      .filter(histL1Udf(col("h_a"), col("h_b")) <= 2 * maxDist)
      // survivors are few and bucket-skewed; spread the DP work evenly
      .repartition(col("id_a"), col("id_b"))
      .withColumn("dist", levenshtein(col("t_a"), col("t_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0) // threshold variant yields -1 above maxDist
      .select("id_a", "id_b", "len_a", "len_b", "dist")
  }

  /** First `|xs| − max(1, ceil(t·|xs| − 1e-9)) + 1` elements of the
    * sorted shingle array — the prefix-filter index window (Bayardo
    * '07 / Xiao '08; a J ≥ t or C ≥ t pair must share a shingle inside
    * it). A pure codegen slice: the former UDF formulation re-boxed
    * every prefix as a Seq[Long] per row on three corpus-sized paths
    * (jaccard-prefix, containment, containment-against). Arithmetic is
    * bit-identical to the UDF's (`ceil(double)` / `greatest` are the
    * same IEEE ops; the 1e-9 slack can only lengthen a prefix), and
    * the greatest(0, ·) guard keeps slice total (take(k≤0) = empty).
    */
  private def prefixSlice(
      xs: org.apache.spark.sql.Column,
      t: Double): org.apache.spark.sql.Column = {
    val s = size(xs)
    val minOverlap = greatest(
      lit(1L), ceil(lit(t) * s.cast("double") - lit(1e-9)))
    slice(xs, lit(1),
      greatest(lit(0L), s.cast("long") - minOverlap + lit(1L)).cast("int"))
  }

  /** Distinct word n-gram shingles per document: (id, shingle). The
    * exploded relation is the common substrate for Jaccard and MinHash.
    * Generation is one compiled loop per doc
    * ([[graft.text.CorpusAudit.gramsUdf]], spec-pinned equal to the
    * transform/slice/concat_ws HOF pipeline it replaced — interpreted
    * lambda trees, measured ~10× slower); a doc with fewer than n
    * tokens yields none, and shingle STRINGS are byte-identical, so
    * every downstream hash (xxhash64-mod-P minhash, oracle replays)
    * is unchanged.
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol),
      explode(array_distinct(
        graft.text.CorpusAudit.gramsUdf(n)(col(textCol)))).as("shingle"))

  /** Distinct hashed word n-gram shingles of one document as a sorted
    * primitive array. Since round 16 this is the NATIVE codegen
    * expression [[graft.plans.GramHashesExpr]] (name kept — call sites
    * apply it as before): the former Scala UDF paid the UDF
    * String-boxing seam, an Array[Long] → Catalyst converter per row,
    * and a broken whole-stage-codegen span on the engine's single
    * most-traversed per-row pass (every minhash / ngram-pair /
    * containment corpus path). FNV-1a 64-bit over the window's UTF-16
    * chars with ' ' separators — the hash LAYOUT is bit-identical to
    * the UDF's (the expression takes a raw-byte fast path on ASCII
    * text, provably equal, and replays the exact char loop otherwise),
    * so every downstream hash join and oracle replay is unchanged.
    * Collisions (~n²/2^64) can only merge two shingles, which the
    * downstream exact set-arithmetic absorbs as a vanishingly small
    * Jaccard perturbation.
    */
  private[graft] def shingleHashesUdf(
      n: Int): org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    c => graft.plans.GramHash.shingle_hashes(c, n)

  /** Exact n-gram Jaccard similar pairs (a<b, J ≥ minJaccard) via a
    * shingle inverted index: postings shuffle ONCE into shingle-
    * clustered, (shingle, id)-sorted runs and every co-occurring pair
    * is emitted in-stage by the streaming
    * [[graft.plans.PostingPairsExec]]; common = |A∩B| falls out of the
    * (a,b) count; |A|,|B| ride along as per-doc counts,
    * J = common/(|A|+|B|−common). No cross product, no self-join.
    * Skew guard: shingles shared by more than `maxDf` docs are dropped
    * (stopword shingles explode quadratically and carry no dedup
    * signal) — the exec skips overflowing groups as it streams.
    * Null ids are dropped up front (the pre-r15 join's a<b filter
    * dropped them silently; the exec's id buffer requires non-null).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minJaccard: Double,
      maxDf: Long = 1000L
  ): DataFrame = {
    // per-doc distinct-shingle count rides along through the explode, so
    // |A| and |B| come out of the group itself — no sizes join.
    //
    // ONE-EXCHANGE STREAMING SHAPE (round 16): the round-15 form built
    // each shingle group as ONE collect_list array and materialized all
    // d(d−1)/2 pair structs through PostingPairsExpr — ObjectHashAggregate
    // falls back to sort-based aggregation past 128 map keys (so the
    // capped funnel point paid a sort anyway AND the array build), and
    // an uncapped hot shingle threw past d ≈ 92k where the pre-r15
    // self-join streamed. PostingPairsExec keeps the one-exchange shape
    // (Catalyst inserts the shingle exchange + (shingle, id) sort) but
    // buffers only the d-sized (id, n) postings of the current group
    // and emits pairs lazily — no d² array, overflowing groups skipped
    // at maxDf+1 buffered entries. Ascending id order in the sorted run
    // gives a < b by construction, exactly as the join's filter did.
    val ex = df
      .filter(col(idCol).isNotNull)
      .select(col(idCol), shingleHashesUdf(n)(col(textCol)).as("xs"))
      .select(col(idCol), size(col("xs")).cast("long").as("n_sh"),
        explode(col("xs")).as("shingle"))
    val pairs = graft.plans.PostingPairs
      .pairs(ex, col("shingle"), col(idCol), col("n_sh"), maxDf)
      .groupBy("a", "b", "n_a", "n_b")
      .agg(count(lit(1)).as("n_common"))
      .withColumn(
        "jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double")
      )
      .filter(col("jaccard") >= minJaccard)
      .select(col("a"), col("b"), col("n_common"), col("n_a"), col("n_b"), col("jaccard"))
    // materialize the (small) pair set — callers (clusterize's CC
    // iterations, the recall-audit twins) re-read it and own the
    // unpersist, as before
    val out = pairs.cache()
    out.count()
    out
  }

  /** Exact Jaccard pairs via PREFIX FILTERING (Bayardo et al. WWW'07
    * AllPairs / Xiao et al. PPJoin): same output contract as
    * [[ngramJaccardPairs]], different candidate generation. For
    * threshold t, J(A,B) >= t forces |A∩B| >= ceil(t·|A|), so two
    * similar docs MUST share a shingle within their first
    * |X| − ceil(t·|X|) + 1 shingles under ANY fixed global order (here:
    * ascending hash) — only those prefixes are indexed. At t=0.8 the
    * index holds ~20% of the shingles and candidate pairs shrink
    * ~quadratically; verification then merge-intersects the two SORTED
    * hash arrays (compiled, O(|A|+|B|)) for the TRUE overlap.
    *
    * Pick this path for high thresholds (t >= ~0.5, the dedup regime);
    * at low thresholds the prefix is nearly the whole set and
    * [[ngramJaccardPairs]]'s count-from-the-group shape wins (it never
    * rejoins the full arrays).
    *
    * `maxDf` here caps candidate-generation postings only — verified
    * pairs always carry their exact n_common/jaccard (the base path's
    * cap also perturbs n_common). The ceiling uses a 1e-9 slack so an
    * upward float error can only LENGTHEN a prefix (extra candidates,
    * never lost exactness).
    *
    * Cap interaction with the positional filter (same contract as
    * [[containmentPairs]]): the filters are exactly lossless at
    * maxDf = Long.MaxValue. Under a finite cap the pair's true first
    * common shingle may itself be a pruned hot posting, so the
    * surviving min(pa)/min(pb) belong to a LATER common element, the
    * overlap upper bound under-estimates, and the positional filter
    * can drop a qualifying pair that pre-filter candidate generation
    * (any surviving common prefix posting) would have kept — i.e.
    * finite-maxDf recall loss is confined to hot-shingle pairs but is
    * strictly larger than the r10 prefix path's. That is the cap's
    * documented contract (hot cross-corpus shingles are boilerplate);
    * oracle faces run at maxDf = Long.MaxValue where both filters are
    * proven lossless against the brute-force truth.
    */
  def ngramJaccardPairsPrefix(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minJaccard: Double,
      maxDf: Long = 1000L
  ): DataFrame = {
    val t = minJaccard
    // xs is sorted ascending + distinct (shingleHashesUdf) — the global
    // prefix order and the merge-intersect both rely on it
    val docs = df
      .select(col(idCol), shingleHashesUdf(n)(col(textCol)).as("xs"))
      .filter(size(col("xs")) > 0)
      .cache()
    // prefix tokens carry their 0-based POSITION and the doc's set
    // size — the two integers the PPJoin filters below run on
    val pre = docs
      .withColumn("sz", size(col("xs")).cast("long"))
      .select(col(idCol), col("sz"),
        posexplode(prefixSlice(col("xs"), t)).as(Seq("pos", "shingle")))
    val rare =
      if (maxDf == Long.MaxValue) pre
      else
        pre.withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
          .filter(col("df") <= maxDf)
          .drop("df")
    // PPJoin candidate pruning (Xiao et al., WWW'08) — both filters
    // LOSSLESS at any t when maxDf = Long.MaxValue (1e-9 slack absorbs
    // the float boundary; the exact merge-intersect verify below is
    // unchanged; for finite maxDf the positional filter's recall
    // caveat is in the scaladoc above):
    //  * length filter, inside the join condition so pruned rows never
    //    reach the pair aggregation: J ≥ t forces
    //    min(sa,sb) ≥ t·max(sa,sb);
    //  * positional filter: both shingle arrays are sorted in the SAME
    //    global order, so the first prefix-prefix match (min pa / min
    //    pb — simultaneously minimized by the smallest common element)
    //    has zero common elements before it, bounding the achievable
    //    overlap by 1 + min(sa−pa−1, sb−pb−1), which must reach the
    //    t/(1+t)·(sa+sb) overlap a ≥t pair needs.
    // The pair aggregation replaces the old DISTINCT — the same
    // (a, b) shuffle, now carrying four small ints and followed by a
    // filter that keeps the expensive array-fetch verify joins off
    // every pair the bounds kill.
    val la = rare.select(col(idCol).as("a"), col("sz").as("sa"),
      col("pos").as("pa"), col("shingle"))
    val lb = rare.select(col(idCol).as("b"), col("sz").as("sb"),
      col("pos").as("pb"), col("shingle").as("shingle_b"))
    val cand = la
      .join(lb,
        col("shingle") === col("shingle_b") && col("a") < col("b") &&
          least(col("sa"), col("sb")).cast("double") >=
            lit(t) * greatest(col("sa"), col("sb")).cast("double") - lit(1e-9) &&
          // positional bound PER POSTING, ahead of the pair-agg
          // shuffle (lossless: the first common element's posting —
          // the simultaneous minimizer of pa and pb for a qualifying
          // pair — always satisfies it, so the min-aggregated values
          // and the post-agg filter outcome are unchanged; pruned
          // rows are redundant-for-min or belong to non-qualifying
          // pairs)
          (lit(1L) + least(col("sa") - col("pa") - 1L,
            col("sb") - col("pb") - 1L)).cast("double") >=
            lit(t / (1.0 + t)) * (col("sa") + col("sb")).cast("double") - lit(1e-9))
      .groupBy("a", "b")
      .agg(min("pa").as("pa"), min("pb").as("pb"),
        min("sa").as("sa"), min("sb").as("sb"))
      .filter(
        (lit(1L) + least(col("sa") - col("pa") - 1L,
          col("sb") - col("pb") - 1L)).cast("double") >=
          lit(t / (1.0 + t)) * (col("sa") + col("sb")).cast("double") - lit(1e-9))
      .select("a", "b")
    // Verify = broadcast joins under the bound / bucketed-by-id
    // co-location above it, with the native codegen merge-intersect —
    // see [[verifyPairsExact]] for the full shuffle-volume argument.
    val out = verifyPairsExact(docs, cand, idCol) { v =>
      v.withColumn(
          "jaccard",
          col("n_common").cast("double") /
            (col("n_a") + col("n_b") - col("n_common")).cast("double"))
        .filter(col("jaccard") >= minJaccard)
        .select(col("a"), col("b"), col("n_common"), col("n_a"), col("n_b"),
          col("jaccard"))
    }
    docs.unpersist()
    out
  }

  /** Verify-join broadcast bound for the prefix-filtered pair paths:
    * docs-with-shingle-arrays relations at or under this row count are
    * broadcast to both verify joins (≈0.8 GB at ~1 kB/doc of hashes —
    * sized for 8 GiB+ executors). Beyond it the verify co-locates on a
    * bucketed-by-id docs layout (see [[verifyPairsExact]]). Override
    * with the session conf `spark.graft.verify.broadcastMaxDocs`
    * (PlanShapeSpec forces the above-bound path this way).
    */
  private val VerifyBroadcastMaxDocs = 1000000L

  /** Exact verify of prefix-filter candidates: attach both sorted
    * shingle-hash arrays to each (a, b) candidate, count the true
    * intersection with the native codegen merge loop
    * ([[graft.plans.SortedIntersectCount]] — the former Seq[Long] UDF
    * boxed ~10¹⁰ longs at sf10 and was ~80% of the operator wall), and
    * hand (a, b, n_common, n_a, n_b) to `finish` for the metric filter.
    * The result is materialized (cache + count) before returning so
    * the bucketed path can drop its temp table.
    *
    * Two physical postures, chosen by corpus size:
    *
    *  - docs ≤ broadcast bound: both array sides broadcast — candidate
    *    rows never re-shuffle (the 25 GB regression the r11 broadcast
    *    killed), arrays move once per executor.
    *  - above the bound: docs are written ONCE to a bucketed-by-id
    *    table ([[graft.layout.Layout.writeBucketed]] — on a real
    *    deployment the corpus already lives bucketed by id and this
    *    write is free), and both verify joins read the arrays
    *    SCAN-LOCALLY: the a-side join shuffles only the narrow id
    *    pairs to the bucketing, and exactly one intermediate exchange
    *    carries one array per candidate (the a-side's xs, en route to
    *    the b-side join), which is the irreducible minimum for exact
    *    pairwise verification
    *    without broadcast (Vernica et al., SIGMOD'10 §5 ship exactly
    *    one record's token set per candidate in their verify phase;
    *    any exact |A∩B| needs both sets in one place, and bucketing
    *    can co-locate only one join key at a time). The docs-side
    *    scans themselves are PROVABLY exchange-free
    *    (PlanShapeSpec: no Exchange between either bucketed scan and
    *    its join), so total verify shuffle volume is
    *    |cand| × (2 ids) + |cand| × |xs_a| — at the containment
    *    defaults the contained side's (smaller) array — versus the
    *    pre-r11 |cand| × (|xs_a| + |xs_b|) BOTH ways plus two full
    *    docs-relation shuffles.
    */
  private[graft] def verifyPairsExact(
      docs: DataFrame,
      cand: DataFrame,
      idCol: String)(finish: DataFrame => DataFrame): DataFrame =
    verifyPairsExact2(docs, docs, cand, idCol)(finish)

  /** Two-sided form of [[verifyPairsExact]] for the cross-shaped
    * (new × history) verifies: the a side's arrays come from `docsA`,
    * the b side's from `docsB` (pass the same relation twice for the
    * self-join shape — it is broadcast/bucketed once, not twice).
    */
  private[graft] def verifyPairsExact2(
      docsA: DataFrame,
      docsB: DataFrame,
      cand: DataFrame,
      idCol: String)(finish: DataFrame => DataFrame): DataFrame = {
    import graft.plans.ArrayOps.sorted_intersect_count
    val spark = docsA.sparkSession
    val same = docsA eq docsB
    val bound = spark.conf.getOption("spark.graft.verify.broadcastMaxDocs")
      .map(_.toLong).getOrElse(VerifyBroadcastMaxDocs)
    // Both array sides project to the SAME column shape/constraints so
    // their broadcast subtrees canonicalize equal — a prerequisite for
    // exchange reuse, though AQE's TableCacheQueryStage wrapping still
    // materializes the two stages separately today (PlanShapeSpec pins
    // the exchange count). The session-memory story for whole-catalog
    // big-SF runs is therefore the GC nudge in Verify/ScaleBench: dead
    // plans' ~0.8 GB broadcasts are only reaped once a JVM GC notices
    // the weak refs.
    def verified(sideA: DataFrame, sideB: DataFrame): DataFrame =
      cand
        .join(sideA, col("a") === sideA("__vid"))
        // counts computed IN the post-join projections: the arrays are
        // consumed and dropped inside the join stage, never
        // materialized into downstream rows
        .select(col("a"), col("b"), sideA("__vxs").as("__xs_a"))
        .join(sideB, col("b") === sideB("__vid"))
        .select(col("a"), col("b"),
          sorted_intersect_count(col("__xs_a"), sideB("__vxs")).as("n_common"),
          size(col("__xs_a")).cast("long").as("n_a"),
          size(sideB("__vxs")).cast("long").as("n_b"))
    // the explicit isNotNull pair pins BOTH sides' scan predicates to
    // the same set in the same order — without it each join infers its
    // own isnotnull constraints in a different order, the canonical
    // plans diverge, and ReuseExchange silently builds two broadcasts
    def proj(d: DataFrame) =
      d.select(col(idCol).as("__vid"), col("xs").as("__vxs"))
        .where(col("__vid").isNotNull && col("__vxs").isNotNull)
    // A corpus that ALREADY lives hash-partitioned on the id (a
    // bucketed table scan, projected per-row to (id, xs) — projections
    // and the cache preserve the scan's partitioning) needs no layout
    // work at all above the bound: both verify joins co-locate on the
    // existing bucketing, so the temp-table write is skipped entirely.
    // This is the VERDICT r11 "accept a pre-bucketed input" posture —
    // at 100 TB the corpus is born bucketed (SCALE.md) and the verify
    // is then pure join work.
    def bucketedById(d: DataFrame): Boolean =
      d.queryExecution.sparkPlan.outputPartitioning match {
        case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
          h.expressions match {
            case Seq(a: org.apache.spark.sql.catalyst.expressions.AttributeReference) =>
              a.name == idCol
            case _ => false
          }
        case _ => false
      }
    val nDocs =
      if (same) docsA.count() else math.max(docsA.count(), docsB.count())
    if (nDocs <= bound) {
      val out = finish(
        verified(broadcast(proj(docsA)), broadcast(proj(docsB)))).cache()
      out.count()
      out
    } else if (bucketedById(docsA) && (same || bucketedById(docsB))) {
      val res = finish(verified(proj(docsA), proj(docsB)))
      captureVerifyPlan(spark, res)
      val out = res.cache()
      out.count()
      out
    } else {
      val nonce = java.util.UUID.randomUUID.toString.replace("-", "")
      val tblA = s"graft_verify_docs_a_$nonce"
      val tblB = s"graft_verify_docs_b_$nonce"
      val buckets = spark.conf.getOption("spark.graft.verify.buckets")
        .map(_.toInt)
        .getOrElse(spark.conf.get("spark.sql.shuffle.partitions").toInt)
      graft.layout.Layout.writeBucketed(
        docsA.select(col(idCol), col("xs")), tblA, idCol, buckets)
      if (!same) graft.layout.Layout.writeBucketed(
        docsB.select(col(idCol), col("xs")), tblB, idCol, buckets)
      try {
        val res = finish(verified(
          proj(spark.table(tblA)),
          proj(spark.table(if (same) tblA else tblB))))
        captureVerifyPlan(spark, res)
        // The verified-and-filtered output is PAIR-LIST sized (the
        // dedup hits, not the corpus) — materialize it to a temp
        // parquet before dropping the docs table. cache() alone is NOT
        // enough: DROP TABLE cascade-uncaches every plan referencing
        // the dropped relation, silently turning later reads of the
        // "materialized" result into recomputes against deleted files.
        val outDir = new java.io.File(
          sys.props("java.io.tmpdir"), s"graft_verify_out_$nonce").getPath
        res.write.mode("overwrite").parquet(outDir)
        registerVerifyOutputDir(outDir)
        val back = spark.read.parquet(outDir).cache()
        back.count()
        back
      } finally {
        graft.layout.Layout.dropWithLocation(spark, tblA)
        if (!same) graft.layout.Layout.dropWithLocation(spark, tblB)
      }
    }
  }

  /** Test hook: the physical plan of the most recent above-bound
    * verify ([[verifyPairsExact]]'s bucketed branch) — the returned
    * frame reads the materialized pair list, so the verify plan is
    * not reachable from it (PlanShapeSpec asserts the bucketed scans
    * and the single array-bearing exchange here instead).
    *
    * Capture is OFF unless `spark.graft.verify.capturePlan=true`
    * (PlanShapeSpec sets it): an executed plan pins exchanges/metrics
    * for the session lifetime, and the object-level var is not safe
    * under concurrent queries — production runs never populate it.
    */
  private[graft] var lastVerifyPlan
      : Option[org.apache.spark.sql.execution.SparkPlan] = None

  private def captureVerifyPlan(
      spark: org.apache.spark.sql.SparkSession,
      res: DataFrame): Unit =
    if (spark.conf.getOption("spark.graft.verify.capturePlan")
          .contains("true"))
      lastVerifyPlan = Some(res.queryExecution.executedPlan)

  // --- above-bound verify output lifecycle -------------------------
  // The materialized pair-list dirs (graft_verify_out_*) must outlive
  // the DROP TABLE of the bucketed docs temp tables (see the cascade-
  // uncache note above), so they cannot be deleted inside the verify
  // call — but a long-running ingest session that calls the above-
  // bound path repeatedly would otherwise grow java.io.tmpdir without
  // bound (ADVICE r12). Every created dir is registered here; a JVM
  // shutdown hook sweeps whatever is left, and callers that have
  // released all returned frames (end of an ingest run, between
  // Verify/ScaleBench catalogs) can reclaim eagerly via
  // [[cleanupVerifyOutputs]].
  private val verifyOutputDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val verifyShutdownHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      verifyOutputDirs.forEach(d => deleteRecursively(new java.io.File(d)))))

  private def registerVerifyOutputDir(dir: String): Unit = {
    verifyShutdownHook
    verifyOutputDirs.add(dir)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val cs = f.listFiles()
      if (cs != null) cs.foreach(deleteRecursively)
    }
    f.delete(): Unit
  }

  /** Delete every above-bound verify output dir this JVM has
    * materialized so far. Safe ONLY once all DataFrames returned by
    * above-bound [[containmentPairs]]/[[minHashLshPairs]]/… calls have
    * been fully consumed or written out — the returned frames READ
    * these dirs (their cache can be evicted and recomputed from them).
    * Verify/ScaleBench call this between catalog runs; unswept dirs
    * are also reaped by the shutdown hook.
    */
  def cleanupVerifyOutputs(): Unit = {
    var d = verifyOutputDirs.poll()
    while (d != null) {
      deleteRecursively(new java.io.File(d))
      d = verifyOutputDirs.poll()
    }
  }

  /** ASYMMETRIC containment pairs: (a, b) where C(a→b) =
    * |sh(a) ∩ sh(b)| / |sh(a)| >= t, a != b (mutual containment emits
    * both directions). This is the quotation / boilerplate-wrap face
    * symmetric Jaccard misses entirely: a paragraph pasted into a
    * 50×-longer page has J ≈ |a|/|b| ≈ 0.02 but C(a→b) = 1.0 — real
    * curation pipelines drop the short copy, which no Jaccard
    * threshold can find.
    *
    * Candidate generation is ONE-SIDED prefix filtering: a qualifying
    * pair needs overlap >= ceil(t·sa), so the globally-smallest common
    * shingle must sit within a's first sa − ceil(t·sa) + 1 hashes —
    * only that prefix is probed. The contained-in side has no upper
    * length bound, so b indexes ALL its shingles (the inherent
    * asymmetric-join cost; `maxDf` caps hot postings). Lossless prunes
    * before the exact merge-intersect verify:
    *  * length: overlap <= sb, so sb >= t·sa;
    *  * positional: for qualifying pairs min(pa)/min(pb) belong to the
    *    first common element (a's hit is in the prefix, b indexes
    *    everything), so overlap <= 1 + min(sa−pa−1, sb−pb−1) >= t·sa
    *    must hold (1e-9 slack — float error only admits extras).
    *    Both prunes are exactly lossless at maxDf = Long.MaxValue;
    *    under a finite cap the first common element may itself be a
    *    pruned hot posting, so the positional bound can discard pairs
    *    the cap already made unreachable — recall loss stays confined
    *    to hot-shingle pairs, which is the cap's documented contract.
    * Same contract shape as [[ngramJaccardPairsPrefix]]; the verify is
    * the identical compiled merge-intersect, so emitted n_common /
    * containment are exact.
    */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minContainment: Double,
      maxDf: Long = 1000L
  ): DataFrame = {
    val t = minContainment
    val docs = df
      .select(col(idCol), shingleHashesUdf(n)(col(textCol)).as("xs"))
      .filter(size(col("xs")) > 0)
      .cache()
    val withSz = docs.withColumn("sz", size(col("xs")).cast("long"))
    // probe side: prefix postings of the CONTAINED candidate a
    // (codegen slice — see [[prefixSlice]])
    val pa0 = withSz.select(col(idCol).as("a"), col("sz").as("sa"),
      posexplode(prefixSlice(col("xs"), t)).as(Seq("pa", "shingle")))
    // index side: EVERY posting of the containing candidate b
    val pb0 = withSz.select(col(idCol).as("b"), col("sz").as("sb"),
      posexplode(col("xs")).as(Seq("pb", "shingle_b")))
    // df computed over the FULL index side (true document frequency);
    // the probe side prunes against the same hot set
    val hot =
      if (maxDf == Long.MaxValue) None
      else Some(
        pb0.groupBy(col("shingle_b").as("shingle"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf)
          .select("shingle")
          .cache())
    val (pra, prb) = hot match {
      case None => (pa0, pb0)
      case Some(h) =>
        (pa0.join(h, Seq("shingle"), "left_anti"),
          pb0.join(h.select(col("shingle").as("shingle_b")),
            Seq("shingle_b"), "left_anti"))
    }
    // Positional filter PER POSTING, inside the join condition — ahead
    // of the pair-aggregation shuffle. Lossless: a qualifying pair's
    // first common element e has >= ceil(t*sa) common elements at
    // positions >= pb(e) in b, so sb - pb(e) >= t*sa and e's posting
    // survives; min(pa)/min(pb) are achieved AT e, so the aggregated
    // values are unchanged. Every pruned row was either a non-first
    // posting of a surviving pair (redundant for the min-agg) or a
    // candidate no qualifying pair needs — at scale this is the cut
    // that keeps hot cross-corpus shingles (boilerplate, numerics)
    // from exploding the shuffle.
    val cand = pra
      .join(prb,
        col("shingle") === col("shingle_b") && col("a") =!= col("b") &&
          col("sb").cast("double") >= lit(t) * col("sa").cast("double") - lit(1e-9) &&
          (col("sb") - col("pb")).cast("double") >=
            lit(t) * col("sa").cast("double") - lit(1e-9))
      .groupBy("a", "b")
      .agg(min("pa").as("pa"), min("pb").as("pb"),
        min("sa").as("sa"), min("sb").as("sb"))
      .filter(
        (lit(1L) + least(col("sa") - col("pa") - 1L,
          col("sb") - col("pb") - 1L)).cast("double") >=
          lit(t) * col("sa").cast("double") - lit(1e-9))
      .select("a", "b")
    // Verify = broadcast joins under the bound / bucketed-by-id
    // co-location above it, with the native codegen merge-intersect —
    // see [[verifyPairsExact]] for the full shuffle-volume argument
    // (here the exchange-crossing array is xs_a: the CONTAINED side,
    // the smaller one on the quotation face this operator exists for).
    val out = verifyPairsExact(docs, cand, idCol) { v =>
      v.withColumn("containment",
          col("n_common").cast("double") / col("n_a").cast("double"))
        .filter(col("containment") >= minContainment)
        .select(col("a"), col("b"), col("n_common"), col("n_a"), col("n_b"),
          col("containment"))
    }
    hot.foreach(_.unpersist())
    docs.unpersist()
    out
  }

  /** The ACTION face of [[containmentPairs]]: drop each doc that is
    * >= t contained in a LARGER doc (strictly more shingles; equal
    * sizes tie-break on smaller id so a mutual-containment pair —
    * near-identical docs — keeps exactly one). This is the curation
    * step real pipelines take on a containment hit: the short quoted
    * copy dies, the page that quotes it survives. Docs with no
    * shingles (shorter than n tokens) pass through untouched — they
    * carry no containment signal either way.
    */
  /** Incremental (refresh-shape) containment join: every NEW document
    * checked for ≥ t containment IN a standing-history document, with
    * no history-internal and no new-internal pairwork — the T2
    * resumability face of [[containmentPairs]], mirroring
    * [[minHashLshPairsAgainst]] / [[hammingPairsAgainst64]]. Real
    * curation pipelines containment-check a new crawl against the
    * corpus (drop the freshly-crawled quote of a standing page), not
    * the corpus against itself; the one-sided index is already
    * direction-aware, so index = history (every posting), probe = new
    * (prefix postings only). `maxDf` caps hot HISTORY postings — the
    * true document frequency of the standing corpus, which is the df
    * that matters across refreshes. Same lossless length + positional
    * prunes and exact merge-intersect verify as the batch face;
    * returns (new_id, hist_id, n_common, n_a, n_b, containment) where
    * containment = |new ∩ hist| / |new| ≥ t. A doc id present on both
    * sides never pairs with itself.
    */
  def containmentPairsAgainst(
      newDf: DataFrame,
      histDf: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minContainment: Double,
      maxDf: Long = 1000L
  ): DataFrame = {
    val hist = prepareContainmentHistory(histDf, idCol, textCol, n, maxDf)
    val out =
      containmentPairsAgainstPrepared(newDf, textCol, minContainment, hist)
    hist.unpersist()
    out
  }

  /** The history (containing) side of [[containmentPairsAgainst]],
    * precomputed and cached so a STREAMING ingest can pay the standing
    * corpus's shingle pass, posting explode, and hot-set aggregation
    * ONCE per stream instead of once per micro-batch — the history
    * side is a pure function of (histDf, n, maxDf), independent of
    * both the probe batch and the containment threshold (t only
    * shapes the probe-side prefix). Caller owns the caches: call
    * [[ContainmentHistory.unpersist]] when the stream ends.
    */
  final class ContainmentHistory private[dedup] (
      private[dedup] val histDocs: DataFrame, // (idCol, xs), cached
      private[dedup] val prb: DataFrame, // hot-pruned full postings
      private[dedup] val hot: Option[DataFrame],
      private[dedup] val idCol: String,
      private[dedup] val n: Int) {
    def unpersist(): Unit = {
      hot.foreach(_.unpersist())
      histDocs.unpersist(): Unit
    }
  }

  def prepareContainmentHistory(
      histDf: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      maxDf: Long = 1000L
  ): ContainmentHistory = {
    val histDocs = histDf
      .select(col(idCol), shingleHashesUdf(n)(col(textCol)).as("xs"))
      .filter(size(col("xs")) > 0)
      .cache()
    // index: EVERY posting of the HISTORY (containing) side
    val pb0 = histDocs.withColumn("sz", size(col("xs")).cast("long"))
      .select(col(idCol).as("b"), col("sz").as("sb"),
        posexplode(col("xs")).as(Seq("pb", "shingle_b")))
    val hot =
      if (maxDf == Long.MaxValue) None
      else Some(
        pb0.groupBy(col("shingle_b").as("shingle"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") > maxDf)
          .select("shingle")
          .cache())
    val prb = hot match {
      case None => pb0
      case Some(h) =>
        pb0.join(h.select(col("shingle").as("shingle_b")),
          Seq("shingle_b"), "left_anti")
    }
    new ContainmentHistory(histDocs, prb, hot, idCol, n)
  }

  /** [[containmentPairsAgainst]] with the history side supplied by
    * [[prepareContainmentHistory]] — identical pair output (the plan
    * below is the batch form's verbatim, reading the prepared
    * relations instead of rebuilding them).
    */
  def containmentPairsAgainstPrepared(
      newDf: DataFrame,
      textCol: String,
      minContainment: Double,
      hist: ContainmentHistory
  ): DataFrame = {
    val t = minContainment
    val idCol = hist.idCol
    val newDocs = newDf
      .select(col(idCol), shingleHashesUdf(hist.n)(col(textCol)).as("xs"))
      .filter(size(col("xs")) > 0)
      .cache()
    // probe: prefix postings of the NEW (contained-candidate) side
    // (codegen slice — see [[prefixSlice]])
    val pa0 = newDocs.withColumn("sz", size(col("xs")).cast("long"))
      .select(col(idCol).as("a"), col("sz").as("sa"),
        posexplode(prefixSlice(col("xs"), t)).as(Seq("pa", "shingle")))
    val pra = hist.hot match {
      case None    => pa0
      case Some(h) => pa0.join(h, Seq("shingle"), "left_anti")
    }
    val prb = hist.prb
    val histDocs = hist.histDocs
    // identical length + per-posting positional prunes as
    // [[containmentPairs]] (the cross shape changes nothing in the
    // bound: a still needs ceil(t·sa) common elements inside b)
    val cand = pra
      .join(prb,
        col("shingle") === col("shingle_b") && col("a") =!= col("b") &&
          col("sb").cast("double") >= lit(t) * col("sa").cast("double") - lit(1e-9) &&
          (col("sb") - col("pb")).cast("double") >=
            lit(t) * col("sa").cast("double") - lit(1e-9))
      .groupBy("a", "b")
      .agg(min("pa").as("pa"), min("pb").as("pb"),
        min("sa").as("sa"), min("sb").as("sb"))
      .filter(
        (lit(1L) + least(col("sa") - col("pa") - 1L,
          col("sb") - col("pb") - 1L)).cast("double") >=
          lit(t) * col("sa").cast("double") - lit(1e-9))
      .select("a", "b")
    val out = verifyPairsExact2(newDocs, histDocs, cand, idCol) { v =>
      v.withColumn("containment",
          col("n_common").cast("double") / col("n_a").cast("double"))
        .filter(col("containment") >= minContainment)
        .select(col("a").as("new_id"), col("b").as("hist_id"),
          col("n_common"), col("n_a"), col("n_b"), col("containment"))
    }
    newDocs.unpersist()
    out
  }

  /** The ACTION face of [[containmentPairsAgainst]] — the ingest
    * filter itself: drop every NEW doc that is ≥ t contained in ANY
    * standing-corpus doc, keep the rest. Unlike the batch
    * [[containmentDedup]] there is no size tie-break: the standing
    * corpus always wins (its copy is already curated/indexed), so a
    * new doc dies on any qualifying hit regardless of relative
    * length. New docs with no shingles pass through (no containment
    * signal; exact dedup owns empties).
    */
  def containmentDedupAgainst(
      newDf: DataFrame,
      histDf: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minContainment: Double,
      maxDf: Long = 1000L
  ): DataFrame = {
    val pairs = containmentPairsAgainst(
      newDf, histDf, idCol, textCol, n, minContainment, maxDf)
    val doomed = pairs.select(col("new_id").as(idCol)).distinct()
    newDf.join(doomed, Seq(idCol), "left_anti")
  }

  def containmentDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minContainment: Double,
      maxDf: Long = 1000L
  ): DataFrame = {
    val pairs = containmentPairs(df, idCol, textCol, n, minContainment, maxDf)
    val doomed = pairs
      .filter(col("n_b") > col("n_a") ||
        (col("n_b") === col("n_a") && col("b") < col("a")))
      .select(col("a").as(idCol))
      .distinct()
    df.join(doomed, Seq(idCol), "left_anti")
  }

  /** Distinct shingles hashed to longs IN-ROW (xxhash64 inside the
    * transform lambda) before exploding — the exploded relation carries
    * 8-byte longs instead of strings, which is what shuffles/joins in
    * the MinHash path. Collisions (~2^-64) only affect candidate
    * generation, which exact verification absorbs.
    */
  def hashedShingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol),
      explode(array_distinct(
        transform(graft.text.CorpusAudit.gramsUdf(n)(col(textCol)),
          g => xxhash64(g)))).as("xh"))

  /** MinHash signature columns: h_i(doc) = min over shingles of
    * ((a_i·x + b_i) mod p) where x = xxhash64(shingle). Permutation
    * seeds are fixed → fully deterministic across runs and executors.
    */
  val MinHashP: Long = 2147483647L // 2^31-1, prime

  /** Permutation coefficients stay < 2^27 and x < 2^31 so a·x+b < 2^60:
    * no ANSI long overflow on any executor.
    */
  private def perm(i: Int): (Long, Long) =
    (104729L * i + 12345L, 15485863L * (i + 1))

  def minHashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      numHashes: Int
  ): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
      .withColumn("x", pmod(xxhash64(col("shingle")), lit(MinHashP)))
    val aggs = (0 until numHashes).map { i =>
      val (a, b) = perm(i)
      min(pmod(col("x") * a + b, lit(MinHashP))).as(s"mh_$i")
    }
    sh.groupBy(idCol).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over MinHash signatures: a pair agreeing on any band
    * becomes a candidate; candidates are then verified with exact
    * Jaccard. bands*rowsPerBand hash functions total. Returns verified
    * pairs (a<b, jaccard ≥ minJaccard).
    */
  /** Full MinHash signature of a hashed-shingle set (shared by the
    * batch LSH join and the streaming bucket-state face). Since round
    * 16 a NATIVE codegen expression ([[graft.plans.MinHashSigExpr]] —
    * name kept, applies as before): the UDF seam converted the 8-byte
    * hash array to a boxed Seq[Long] per corpus row and back.
    * Signature values bit-identical (same Long modular arithmetic).
    */
  private[graft] def minHashSigUdf(numHashes: Int)
      : org.apache.spark.sql.Column => org.apache.spark.sql.Column = {
    val coeffs = (0 until numHashes).map(perm)
    c => graft.plans.GramHash.minhash_sig(
      c, coeffs.map(_._1).toArray, coeffs.map(_._2).toArray, MinHashP)
  }

  /** Band keys of a signature column named `sig`: one (band, xxhash64
    * of the band's quad) struct per band.
    */
  private[graft] def bandKeyStructs(bands: Int, rowsPerBand: Int): Seq[Column] =
    (0 until bands).map { bIdx =>
      val cols = (0 until rowsPerBand)
        .map(r => element_at(col("sig"), bIdx * rowsPerBand + r + 1))
      struct(lit(bIdx).as("band"), xxhash64(cols: _*).as("h"))
    }

  /** Sorted-array intersection count — the exact-verify core shared by
    * the batch path's array_intersect and the streaming state face.
    */
  private[graft] def interCount(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var c = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    c
  }

  def minHashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.5
  ): DataFrame = {
    val numHashes = bands * rowsPerBand
    // Explode-free: the doc's distinct hashed-shingle SET rides as one
    // array column (built by the compiled shingleHashesUdf loop, not an
    // interpreted HOF chain); signatures are per-row primitive loops
    // and exact verification is array_intersect on the (few) candidate
    // pairs. The only shuffles are the tiny band-bucket join and the
    // candidate lookups.
    // cache: tiny (|docs| × shingle-count longs) and referenced by three
    // plan branches — without it Spark recomputes the UDF per branch
    // (no cross-branch CSE)
    val base = df
      .select(col(idCol), shingleHashesUdf(n)(col(textCol)).as("xs"))
      .filter(size(col("xs")) > 0)
      .cache()
    // one primitive-loop UDF call per doc beats numHashes interpreted
    // HOF lambdas per element (~80×32 boxed evals per row)
    val sigUdf = minHashSigUdf(numHashes)
    val bandCols = bandKeyStructs(bands, rowsPerBand)
    val buckets = base
      .select(col(idCol), sigUdf(col("xs")).as("sig"))
      .select(col(idCol), explode(array(bandCols: _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.h").as("h"))
      .cache() // bands × |docs| rows of three longs — the self-join
               // below would otherwise compute the signatures twice
    val l = buckets.select(col(idCol).as("a"), col("band"), col("h"))
    val r = buckets.select(col(idCol).as("b"), col("band"), col("h"))
    val cand = l
      .join(r, Seq("band", "h"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()
    val verified = cand
      .join(base.select(col(idCol).as("a"), col("xs").as("xs_a")), Seq("a"))
      .join(base.select(col(idCol).as("b"), col("xs").as("xs_b")), Seq("b"))
      // xs is sorted+distinct, so the native count equals
      // size(array_intersect(..)) without materializing the
      // intersection array per candidate pair
      .withColumn("n_common", graft.plans.ArrayOps
        .sorted_intersect_count(col("xs_a"), col("xs_b")))
      .withColumn(
        "jaccard",
        col("n_common").cast("double") /
          (size(col("xs_a")) + size(col("xs_b")) - col("n_common")).cast("double")
      )
      .filter(col("jaccard") >= minJaccard)
      .select("a", "b", "jaccard")
    // materialize the verified pairs (orders of magnitude smaller than
    // the corpus), then release the corpus-sized intermediates — the
    // caches must not outlive the call in a long-lived session
    val out = verified.cache()
    out.count()
    base.unpersist()
    buckets.unpersist()
    out
  }

  /** Incremental near-dup: pairs between a NEW batch and the HISTORY
    * corpus — the refresh-time face of MinHash-LSH. A corpus refresh
    * must not re-cluster 100 TB to admit a 0.1% batch; this joins the
    * new batch's band buckets against the history's (at scale the
    * history's (band, h, id, xs) relation is a bucketed table built
    * once per epoch and appended like any other), exact-verifies the
    * candidates with the same shingle-set intersection as the
    * self-join path, and returns every (new_id, hist_id, jaccard ≥
    * min) match. Composition contract: new-batch-internal duplicates
    * are [[minHashLshPairs]] over the (small) batch alone; the union
    * of the two pair sets equals the full-corpus self-join's pairs
    * that touch the batch.
    */
  def minHashLshPairsAgainst(
      newDf: DataFrame,
      histDf: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      minJaccard: Double = 0.5
  ): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigUdf = minHashSigUdf(numHashes)
    def prep(df: DataFrame) = df
      .select(col(idCol), shingleHashesUdf(n)(col(textCol)).as("xs"))
      .filter(size(col("xs")) > 0)
      .cache()
    def buckets(base: DataFrame) = base
      .select(col(idCol), sigUdf(col("xs")).as("sig"))
      .select(col(idCol), explode(array(bandKeyStructs(bands, rowsPerBand): _*)).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.h").as("h"))
    val nb = prep(newDf)
    val hb = prep(histDf)
    val cand = buckets(nb).select(col(idCol).as("new_id"), col("band"), col("h"))
      .join(buckets(hb).select(col(idCol).as("hist_id"), col("band"), col("h")),
        Seq("band", "h"))
      // a re-delivered id present in both batch and history would pair
      // with itself at jaccard 1.0 and be flagged a duplicate of
      // itself, breaking the composition contract with the self-join
      // path (which enforces a < b) — drop self-pairs at candidate time
      .filter(col("new_id") =!= col("hist_id"))
      .select("new_id", "hist_id")
      .distinct()
    val verified = cand
      .join(nb.select(col(idCol).as("new_id"), col("xs").as("xs_n")), Seq("new_id"))
      .join(hb.select(col(idCol).as("hist_id"), col("xs").as("xs_h")), Seq("hist_id"))
      // sorted+distinct arrays — native merge count, no per-pair
      // intersection array (see [[minHashLshPairs]])
      .withColumn("n_common", graft.plans.ArrayOps
        .sorted_intersect_count(col("xs_n"), col("xs_h")))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (size(col("xs_n")) + size(col("xs_h")) - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("new_id", "hist_id", "jaccard")
    val out = verified.cache()
    out.count()
    nb.unpersist(); hb.unpersist()
    out
  }

  /** Connected components over a near-dup pair graph: iterative
    * min-label propagation (the alternating-star algorithm's simple
    * cousin — adequate because dup-cluster diameters are tiny). Each
    * iteration is one join + aggregate; convergence checked with a
    * count. Returns (node, component) with component = min reachable
    * node id.
    */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      maxIters: Int = 20,
      /** below this edge count the graph is solved driver-side with
        * union-find (one job instead of one per iteration) — the same
        * small-side-threshold idea as broadcast joins; identical output
        */
      localThreshold: Long = 500000L
  ): DataFrame = {
    val spark = pairs.sparkSession
    // keep the ORIGINAL id type end-to-end: casting to long would turn
    // non-numeric string ids into null and silently corrupt components,
    // and the distributed path (no cast) would then disagree with this
    // one. Row values (Long/Integer/String/...) are all Comparable, so
    // min-labeling works generically.
    //
    // ONE job decides tier AND fetches the edges: limit(threshold+1)
    // collects every edge iff the graph is local-sized (the +1 row is
    // the over-threshold sentinel) — the previous count()-then-
    // collect() shape paid two jobs over the pair relation.
    val rawEdges = pairs.select(col(aCol), col(bCol))
    val es = rawEdges.limit(localThreshold.toInt + 1).collect()
    if (es.length <= localThreshold) {
      val idType = rawEdges.schema.head.dataType
      val parent = unionFind(es)
      val out = parent.keys.toSeq
        .map(n => org.apache.spark.sql.Row(n, ufFind(parent, n)))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", idType),
        org.apache.spark.sql.types.StructField("comp", idType)
      ))
      return spark.createDataFrame(
        spark.sparkContext.parallelize(out.toSeq, 1), schema)
    }
    connectedComponentsDistributed(pairs, aCol, bCol, maxIters)
  }

  /** Path-compressed union-find over collected (a, b) edge rows,
    * components labeled by min member — the driver-side tier shared by
    * [[connectedComponents]] and [[clusterize]].
    */
  private def unionFind(
      es: Array[org.apache.spark.sql.Row]): scala.collection.mutable.HashMap[Any, Any] = {
    @inline def less(x: Any, y: Any): Boolean =
      x.asInstanceOf[Comparable[Any]].compareTo(y.asInstanceOf[Comparable[Any]]) < 0
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    es.foreach { row =>
      val a = row.get(0); val b = row.get(1)
      if (a != null && b != null) {
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (ufFind(parent, a), ufFind(parent, b))
        if (ra != rb) { if (less(ra, rb)) parent(rb) = ra else parent(ra) = rb }
      }
    }
    parent
  }

  private def ufFind(
      parent: scala.collection.mutable.HashMap[Any, Any], x: Any): Any = {
    var r = x
    while (parent.getOrElse(r, r) != r) r = parent(r)
    var c = x
    while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
    r
  }

  /** Distributed connected components — the path for graphs too big to
    * collect. Alternating large-star/small-star contraction (Kiveris
    * et al. '14, "Connected Components in MapReduce and Beyond"):
    *
    *   large-star: every node points its LARGER neighbors at the
    *     minimum of its neighborhood (min(Γ(u) ∪ {u}));
    *   small-star: every node points its smaller-or-equal neighbors
    *     (and itself) at the minimum of its smaller neighborhood.
    *
    * Each round halves long paths, so convergence is O(log n) rounds
    * versus min-label propagation's O(diameter) — the difference
    * between ~5 and ~60 rounds on a chain-structured near-dup graph
    * (StarContractionSpec measures exactly this). At the fixed point
    * the edge set is a star forest: every edge is (member → component
    * minimum), which is the label table.
    *
    * Two shuffles per star phase, all carrying bare id pairs. Every
    * round's edge set is localCheckpoint'ed: the phases reference the
    * previous round's frame multiple times, and an un-truncated
    * lineage doubles per round (the measured sf0.1 bench wedge —
    * plan stringification alone took hours by round 15).
    *
    * Convergence test is EXACT set equality (ss ⊆ prev via left_anti
    * emptiness + equal counts on distinct sets), not a hash signature.
    *
    * A loop that exhausts `maxIters` without reaching the fixed point
    * THROWS instead of deriving labels from a non-star-forest edge set
    * — wrong components would silently mis-drop documents downstream,
    * and O(log n) convergence means non-convergence at the default 20
    * rounds is a pathological graph, not a tuning matter.
    */
  def connectedComponentsDistributed(
      pairs: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      maxIters: Int = 20
  ): DataFrame =
    connectedComponentsDistributedWithCleanup(pairs, aCol, bCol, maxIters)._1

  /** The localCheckpoint RDD backing a just-checkpointed frame — see
    * [[graft.core.Graft.checkpointRdd]] (shared with the layout merge).
    */
  private def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    graft.core.Graft.checkpointRdd(df)

  /** [[connectedComponentsDistributed]] plus an explicit storage
    * release handle: the returned frame is backed by the final round's
    * localCheckpoint, so callers that materialize a derivative (as
    * [[clusterize]] does) call `cleanup()` afterwards to free the
    * checkpoint blocks immediately instead of waiting for the
    * ContextCleaner. Intermediate rounds' checkpoint blocks are freed
    * inside the loop as soon as the next round materializes.
    */
  def connectedComponentsDistributedWithCleanup(
      pairs: DataFrame,
      aCol: String = "a",
      bCol: String = "b",
      maxIters: Int = 20
  ): (DataFrame, () => Unit) = {
    // the pair graph is orders of magnitude smaller than the corpus —
    // pin the iteration to a few partitions so each contraction job is
    // not dominated by task scheduling (at true scale raise this, or
    // let AQE coalesce)
    val p = math.max(2, pairs.sparkSession.sparkContext.defaultParallelism / 8)
    var e = pairs
      .select(col(aCol).as("u"), col(bCol).as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
      .repartition(p, col("u"))
      .localCheckpoint()
    var eCount = e.count()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // large-star: u's neighborhood minimum m; larger neighbors v > u
      // re-attach as (v, m)
      val sym = e.select(col("u"), col("v"))
        .unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("cu"), col("m").as("cv"))
        .filter(col("cu") =!= col("cv"))
        .select(col("cu").as("u"), col("cv").as("v"))
        .distinct()
      // small-star on the (u > v)-directed result: all smaller
      // neighbors and u itself attach to the smaller-neighborhood min
      val d = ls.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val mins2 = d.groupBy("u").agg(min("v").as("m"))
      val ss = d.join(mins2, "u")
        .select(col("v").as("n"), col("m"))
        .filter(col("n") =!= col("m"))
        .select(col("n").as("u"), col("m").as("v"))
        .unionAll(mins2.select(col("u"), col("m").as("v")))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()
        .repartition(p, col("u"))
        .localCheckpoint()
      val ssCount = ss.count()
      val newEdges = ss.join(e, Seq("u", "v"), "left_anti").limit(1).count()
      converged = ssCount == eCount && newEdges == 0L
      // this round's frame is materialized and the convergence probe
      // above was the previous round's last reader — free the previous
      // checkpoint's BLOCKS now (DataFrame.unpersist would be a no-op
      // on the LogicalRDD-backed frame)
      checkpointRdd(e).foreach(_.unpersist(blocking = false))
      e = ss
      eCount = ssCount
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsDistributed did not reach the star-forest " +
          s"fixed point in $maxIters rounds ($eCount edges at exit) — " +
          "labels from a non-fixed-point edge set would be WRONG; " +
          "raise maxIters (O(log n) rounds suffice on any real graph)")
    // fixed point: a star forest — (u, v) = (member, component min);
    // roots appear only on the v side and label themselves. NOT
    // checkpointed: the per-round checkpoints already pin lineage at
    // O(1) depth, and leaving this last step declarative keeps the
    // distributed tier's plan (joins over the checkpointed edge set)
    // distinguishable from the driver tier's collected-rows scan —
    // ScaleSpec asserts exactly that.
    val members = e.select(col("u").as("node"), col("v").as("comp"))
    val roots = e.select(col("v").as("node")).distinct()
      .join(members.select("node"), Seq("node"), "left_anti")
      .withColumn("comp", col("node"))
    val lastCheckpoint = checkpointRdd(e)
    (members.unionByName(roots).repartition(p, col("node")),
      () => lastCheckpoint.foreach(_.unpersist(blocking = false)))
  }

  /** Components + canonical (min id) + cluster size from any near-dup
    * pair relation (columns a, b) — the keep/drop decision surface of
    * a corpus-dedup pass, shared by the exact-Jaccard and LSH paths.
    *
    * Local-sized graphs come back as a driver-built local relation
    * (recompute-free, nothing to unpersist); above `localThreshold`
    * the distributed label-propagation result is cached (consumed at
    * least twice in every caller: drop-set build + funnel count) and
    * ownership transfers to the caller — unpersist it once its
    * consumers have materialized, as CurationPipeline.run does after
    * the clean corpus count (unpersist on the local tier is a no-op).
    * Internal iteration caches are released before returning.
    */
  def clusterize(
      pairs: DataFrame,
      idCol: String,
      localThreshold: Long = 500000L): DataFrame = {
    val spark = pairs.sparkSession
    // Local-sized graphs (the common case: near-dup pair relations are
    // orders of magnitude smaller than the corpus) finish entirely
    // driver-side in the ONE job that fetched the edges — components,
    // sizes, and canonical flags are all derived from the union-find
    // table, where the previous formulation paid a count job, a
    // collect job, and a shuffle-stage materialization job.
    val rawEdges = pairs.select(col("a"), col("b"))
    val es = rawEdges.limit(localThreshold.toInt + 1).collect()
    if (es.length <= localThreshold) {
      val idType = rawEdges.schema.head.dataType
      val parent = unionFind(es)
      val byComp = parent.keys.toSeq.groupBy(n => ufFind(parent, n))
      val rows = byComp.toSeq.flatMap { case (comp, members) =>
        val size = members.size.toLong
        members.map(n =>
          org.apache.spark.sql.Row(n, comp, size, n == comp))
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(idCol, idType),
        org.apache.spark.sql.types.StructField("component", idType),
        org.apache.spark.sql.types.StructField("cluster_size",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("is_canonical",
          org.apache.spark.sql.types.BooleanType)
      ))
      return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
    }
    val (comps, releaseCheckpoint) =
      connectedComponentsDistributedWithCleanup(pairs)
    val sizes = comps.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
    // materialize the (small — one row per node that appears in a
    // pair) label table, then release the distributed-path iteration
    // storage (the final round's localCheckpoint blocks — a plain
    // comps.unpersist() would be a no-op on the checkpoint-backed
    // frame); intermediates must not outlive the call
    val out = comps
      .join(sizes, Seq("comp"))
      .select(
        col("node").as(idCol),
        col("comp").as("component"),
        col("cluster_size"),
        (col("node") === col("comp")).as("is_canonical")
      )
      .cache()
    out.count()
    releaseCheckpoint()
    out
  }

  /** Quality-aware representative selection over near-dup clusters:
    * instead of [[clusterize]]'s min-id canonical, keep per cluster
    * the member with the HIGHEST score (ties → smallest id) — the
    * "keep the longest/best document" policy real dedup pipelines
    * apply, where near-dup groups mix truncated and full versions of
    * the same page and min-id would keep whichever was crawled first.
    *
    * `clusters` is any [[clusterize]]-shaped relation (idCol,
    * component, cluster_size, ...); `scored` supplies (idCol,
    * scoreCol). Rows of `scored` absent from `clusters` are singleton
    * clusters and come back as their own representative (component =
    * own id, cluster_size 1), so the output is a total keep/drop
    * decision for the corpus: one row per scored doc,
    * (idCol, component, cluster_size, scoreCol, is_representative).
    *
    * Scale: one broadcast-or-shuffle join on id (clusters is
    * pair-graph-sized, far smaller than the corpus) + one window over
    * components (dup-cluster-sized partitions).
    */
  def clusterRepresentatives(
      clusters: DataFrame,
      scored: DataFrame,
      idCol: String,
      scoreCol: String
  ): DataFrame = {
    val joined = scored
      .select(col(idCol), col(scoreCol))
      .join(clusters.select(col(idCol), col("component"), col("cluster_size")),
        Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
      .withColumn("cluster_size", coalesce(col("cluster_size"), lit(1L)))
    val w = Window
      .partitionBy(col("component"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    joined
      .withColumn("__rn", row_number().over(w))
      .withColumn("is_representative", col("__rn") === 1)
      .drop("__rn")
  }

  /** Near-dup clusters from exact n-gram Jaccard pairs (the
    * oracle-checkable path; use lshClusters at corpus scale).
    *
    * `maxDf` defaults to the library-safe skew guard (1000): a shingle
    * shared by d docs fans out d² join rows, so the unguarded join is
    * the scale-killer path. An exactness-requiring caller (the DuckDB
    * oracle query) must OPT OUT explicitly with `maxDf = Long.MaxValue`.
    *
    * The intermediate pair cache is released here once the (small)
    * cluster labels materialize — it must not outlive the call.
    */
  def jaccardClusters(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minJaccard: Double,
      maxDf: Long = 1000L,
      /** forwarded to [[connectedComponents]]; 0 forces the
        * distributed label-propagation tier — the components path a
        * 100 TB corpus actually runs
        */
      localThreshold: Long = 500000L
  ): DataFrame = {
    val pairs = ngramJaccardPairs(df, idCol, textCol, n, minJaccard, maxDf)
    val out = clusterize(pairs, idCol, localThreshold) // materialized by clusterize
    pairs.unpersist()
    out
  }

  /** Near-dup clusters from MinHash-LSH candidate pairs with exact
    * Jaccard verification — the 100 TB path: candidate generation is
    * band-bucketed (never an all-shingle self-join), recall at
    * s=minJaccard is 1-(1-s^r)^b (≈98.5% at s=0.8, b=8, r=4).
    * Releases the intermediate pair cache once clusters materialize.
    */
  def lshClusters(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minJaccard: Double,
      bands: Int = 8,
      rowsPerBand: Int = 4
  ): DataFrame = {
    val pairs = minHashLshPairs(df, idCol, textCol, n, bands, rowsPerBand, minJaccard)
    val out = clusterize(pairs, idCol) // materialized by clusterize
    pairs.unpersist()
    out
  }

  /** Bloom-prefiltered anti-join: rows of `newDf` whose key is NOT in
    * `hist` — exactly `newDf LEFT ANTI JOIN hist`, computed with a
    * Bloom filter front door. The filter has no false negatives, so
    * rows it rejects are DEFINITELY novel and skip the join entirely;
    * the ~fpp fraction it (maybe falsely) accepts goes through the
    * exact anti-join, which kills false positives. Output is therefore
    * bit-identical to the plain anti-join while the join input shrinks
    * from |new| to ~fpp·|new| + true-dup rows.
    *
    * The filter is driver metadata (−n·ln(fpp)/ln²2 bits ≈ 1.2 GB for
    * 10⁹ keys at 1%) broadcast once; at larger history sizes raise
    * fpp (the verify join stays exact) or shard the history and chain
    * the pass. The scale win is on mostly-novel batches — the common
    * resumability shape — where almost nothing reaches the shuffle.
    */
  def bloomAntiJoin(
      newDf: DataFrame,
      hist: DataFrame,
      keyCol: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01
  ): DataFrame = {
    val spark = newDf.sparkSession
    // An EMPTY history admits everything: stat.bloomFilter over zero
    // rows returns a null buffer (engine NPE on readFrom), and the
    // anti-join against nothing is the identity — short-circuit. This
    // is the cold-start shape of every resume loop (first run, no
    // manifest yet), so it must work, not throw.
    if (hist.isEmpty) return newDf
    // Build and probe MUST hash the same representation: stat
    // .bloomFilter hashes integral columns as longs and strings as
    // bytes, so the probe is typed to match (a string probe against a
    // long-built filter never hits -> every history row would leak
    // through as "definitely novel"; caught by the refresh composite,
    // regression-pinned in TextDedupSpec).
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}
    val mightContain = newDf.schema(keyCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        val bc = spark.sparkContext.broadcast(
          hist.select(col(keyCol).cast("long").as(keyCol))
            .stat.bloomFilter(keyCol, expectedItems, fpp))
        udf { (k: java.lang.Long) =>
          k != null && bc.value.mightContainLong(k)
        }.apply(col(keyCol).cast("long"))
      case StringType =>
        val bc = spark.sparkContext.broadcast(
          hist.stat.bloomFilter(keyCol, expectedItems, fpp))
        udf { (k: String) =>
          k != null && bc.value.mightContainString(k)
        }.apply(col(keyCol))
      case _ =>
        val bc = spark.sparkContext.broadcast(
          hist.select(col(keyCol).cast("string").as(keyCol))
            .stat.bloomFilter(keyCol, expectedItems, fpp))
        udf { (k: String) =>
          k != null && bc.value.mightContainString(k)
        }.apply(col(keyCol).cast("string"))
    }
    val definitelyNovel = newDf.filter(!mightContain)
    val candidates = newDf.filter(mightContain)
    definitelyNovel.unionByName(
      candidates.join(
        hist.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti"))
  }

  /** Rolling 64-bit polynomial window hashes: h(w) = Σ c_j·B^(L-1-j)
    * mod 2^64 for every L-char window, computed in O(n) by the
    * Karp-Rabin recurrence on wrapping longs. Mod-2^64 with an odd
    * base is collision-safe at n²/2^64 for non-adversarial corpora
    * (document-scale: ~10^12 windows → a handful of collisions, each
    * costing one L-char span — negligible).
    */
  private[graft] def rollingWindowHashesUdf(
      l: Int): org.apache.spark.sql.expressions.UserDefinedFunction = udf {
    (text: String) =>
      if (text == null || text.length < l) Array.empty[Long]
      else {
        val b = 0x100000001b3L
        var pw = 1L
        var i = 0
        while (i < l - 1) { pw *= b; i += 1 }
        val n = text.length
        val out = new Array[Long](n - l + 1)
        var h = 0L
        i = 0
        while (i < l) { h = h * b + text.charAt(i).toLong; i += 1 }
        out(0) = h
        i = l
        while (i < n) {
          h = (h - text.charAt(i - l).toLong * pw) * b + text.charAt(i).toLong
          out(i - l + 1) = h
          i += 1
        }
        out
      }
  }

  /** EXACT substring deduplication (Lee et al. '22, "Deduplicating
    * Training Data Makes Language Models Better" — the ExactSubstr
    * variant, window-hash formulation): every L-char window that
    * occurs more than once in the corpus is removed from every
    * occurrence EXCEPT the canonical one (smallest (doc, pos));
    * overlapping/adjacent removed windows merge into spans, and each
    * document's cleaned text is the original with those spans cut.
    *
    * Dataflow: one compiled rolling-hash pass per document → explode
    * (doc, pos, h) → rank occurrences per hash (one shuffle on the
    * 8-byte hash — ~16 bytes/char of shuffle, the honest cost of
    * corpus-wide substring dedup; suffix-array builds move comparable
    * volume) → per-doc interval merge (gaps-and-islands) → one
    * compiled cut per document. Nothing is ever pairwise.
    *
    * Returns one row per input document:
    * (id, n_dup_spans, removed_chars, clean_len, clean_md5, clean_text).
    */
  def substringDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      l: Int = 20
  ): DataFrame = {
    val occ = df.select(
      col(idCol),
      posexplode(rollingWindowHashesUdf(l)(col(textCol))).as(Seq("pos", "h")))
    // non-first occurrences via the sort-free two-phase min
    // ([[firstOccurrenceRank]]) — the same r14 de-skew the token-level
    // span family uses: a boilerplate L-char window repeated across
    // 10⁸ docs must not pin one sort reducer the way the old
    // row_number()-over-h rank did
    val dups = firstOccurrenceRank(
      occ.withColumnRenamed("h", "__digest"), idCol, "pos")
      .filter(col("__k") =!= col("__first"))
      .select(col(idCol), col("pos"))
    val wD = Window.partitionBy(idCol).orderBy("pos")
    val spans = dups
      .withColumn(
        "brk",
        when(lag("pos", 1).over(wD).isNull || col("pos") - lag("pos", 1).over(wD) > l, 1)
          .otherwise(0))
      .withColumn("sess",
        sum("brk").over(wD.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("sess"))
      .agg(min("pos").as("s"), (max("pos") + l).as("e"))
      .groupBy(idCol)
      .agg(
        sort_array(collect_list(struct(col("s"), col("e")))).as("spans"))
    val cutUdf = udf { (text: String, ss: Seq[Int], es: Seq[Int]) =>
      val sb = new java.lang.StringBuilder(text.length)
      var prev = 0
      var i = 0
      while (i < ss.length) {
        sb.append(text, prev, ss(i))
        prev = es(i)
        i += 1
      }
      sb.append(text, prev, text.length)
      sb.toString
    }
    df.join(spans, Seq(idCol), "left")
      .withColumn(
        "clean_text",
        when(col("spans").isNull, col(textCol))
          .otherwise(cutUdf(
            col(textCol),
            transform(col("spans"), _.getField("s")),
            transform(col("spans"), _.getField("e")))))
      .select(
        col(idCol),
        coalesce(size(col("spans")), lit(0)).cast("long").as("n_dup_spans"),
        (length(col(textCol)) - length(col("clean_text"))).cast("long").as("removed_chars"),
        length(col("clean_text")).cast("long").as("clean_len"),
        md5(col("clean_text")).as("clean_md5"),
        col("clean_text"))
  }

}
