package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SimHash / Hamming-distance near-dup family (Charikar '02 prints,
  * Manku et al. '07 rotation covers): 64- and 128-bit fingerprints,
  * banded Hamming pair joins, rep-level clustering. Split from
  * Dedup.scala for file hygiene (VERDICT r14 #6); mixed into [[Dedup]]
  * so every call site keeps the `Dedup.simHash*` / `Dedup.hamming*`
  * API. Generic connected components (`clusterize`) stays in
  * Dedup.scala — MinHash and containment clustering share it.
  */
private[dedup] trait SimHashOps { self: Dedup.type =>

  /** 64-bit SimHash over whitespace tokens: per token h = FNV-1a(tok);
    * each bit contributes ±1; fingerprint bit j = sign of the sum.
    * ONE compiled loop per row — a pure scalar map with zero shuffle
    * (the earlier relational explode→64-column-aggregate formulation
    * shuffled the whole token stream; at corpus scale the per-row form
    * is strictly better and the bench agrees ~4×).
    *
    * The fold iterates Unicode CODEPOINTS (not UTF-16 units), matching
    * DuckDB's codepoint-based `unicode()` replay exactly on ALL text —
    * including supplementary-plane characters (emoji, historic
    * scripts), which a charAt fold would hash as surrogate halves.
    */
  val simHashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null) 0L
      else {
        val counts = new Array[Int](64)
        val toks = text.split(" ", -1)
        var i = 0
        while (i < toks.length) {
          val t = toks(i)
          if (t.nonEmpty) {
            var h = 0xcbf29ce484222325L
            var k = 0
            while (k < t.length) {
              val cp = t.codePointAt(k)
              h ^= cp.toLong; h *= 0x100000001b3L
              k += Character.charCount(cp)
            }
            var j = 0
            while (j < 64) {
              if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
              j += 1
            }
          }
          i += 1
        }
        var fp = 0L
        var j = 0
        while (j < 64) { if (counts(j) > 0) fp |= (1L << j); j += 1 }
        fp
      }
    }

  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), simHashUdf(col(textCol)).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, found by
    * Manku-style combinatorial blocking (WWW'07): split the 64-bit
    * fingerprint into m = maxHamming + 2 chunks. A pair within distance
    * k dirties ≤ k chunks, so ≥ 2 chunks are clean — banding on every
    * C(m,2) two-chunk combination is a complete cover (same pair set as
    * any complete cover, which is what the oracle checks). vs the
    * minimal m = k+1 single-chunk cover, the band key widens from
    * 64/(k+1) bits to ~2·64/(k+2) bits, so random band collisions drop
    * from C(k+1,1)·n²/2^(64/(k+1)) to C(k+2,2)·n²/2^(128/(k+2)) — for
    * k=7 that is 8·n²/2⁹ → 36·n²/2¹⁵, ~28× fewer candidates, and the
    * measured sf0.1→sf1 wall ratio falls from 23× to near-linear.
    * Join per band, verify with popcount.
    *
    * `maxPerBucket`: optional skew guard for production corpora — keep
    * only the first `cap` DISTINCT fingerprints (by value) of each band
    * bucket before the self-join (an adversarial or degenerate corpus
    * can still pile one key). Trades bounded recall for a hard
    * O(m·d·cap) candidate ceiling over d distinct prints, while a hot
    * key still contributes its first cap prints' pairs instead of
    * vanishing; leave None on oracle-checked faces (exact cover).
    *
    * AUTO-ESCALATION (round 11, re-measured round 13): any fixed
    * 64-bit banding has a random-collision floor ∝ n²/2^w (SCALE.md).
    * Round 11 answered it by auto-capping band buckets above 200k
    * docs; round 13's SimHashStageProbe measured that posture against
    * the exact cover it replaced at sf10 (500k docs) and found the
    * cap GUARDING THE WRONG STAGE there: the per-bucket row_number
    * window costs 12.9 s while the uncapped band join it protects
    * costs 7.7 s — and canonical-cover emission (hammingPairs64 r13)
    * removes the exact path's distinct() on top. A 3-chunk C(k+3,3)
    * cover (lower collision floor, 120 bands) was also measured and
    * LOST at this scale — 65.7 s vs 17.4 s — because this corpus's
    * band collisions are near-dup-structure-dominated, not
    * key-width-dominated (570M candidates of the 2-chunk's 1.1B
    * remain), so tripling the band rows just triples the join input.
    *
    * The posture is therefore: EXACT 2-chunk cover up to `autoCapDocs`
    * = 1M docs (raised from 200k — recall 100% where r12 had 99.1%,
    * and faster), bucket cap `autoCap` above it (the n²-growth guard
    * the next decade genuinely needs: ~4.4B raw candidates at 1M docs
    * is the handoff point where the linear window undercuts the
    * quadratic join). Pass `maxPerBucket = Some(Int.MaxValue)` to
    * force the exact cover at any size, or migrate to
    * [[simHashPairs128]] (the committed ≥10⁸-doc configuration —
    * wider fingerprints move the floor itself).
    *
    * MEASURED recall of the capped posture (tools/SimHashRecallProbe,
    * capped-vs-forced-exact at maxHamming=7, cap=512): 99.33% at sf1,
    * 99.09% at sf10, strict subset both times; adversarial
    * one-hot-bucket floor 27.4% (SimHashRecallSpec). Under the r13
    * bound both those corpora are now EXACT; the capped numbers
    * describe the >1M-doc tier and the explicit-cap contract.
    *
    * CAP OUTPUT CONTRACT (r12, restated for pair-relation consumers):
    * with any cap in effect, identical-fingerprint groups larger than
    * the cap emit a linear min-id rep→member STAR instead of the full
    * hamming-0 clique — connected components (what clusterize/drop
    * consume) are preserved exactly, but edge multiplicity/coverage
    * semantics over the raw pair list are not; see [[hammingPairs64]].
    */
  def simHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxPerBucket: Option[Int] = None,
      autoCapDocs: Long = 1000000L,
      autoCap: Int = 512
  ): DataFrame = {
    // Token-less docs (null/empty/space-only text) all fingerprint to
    // 0L — banding them would emit every such pair as a hamming-0
    // "near-dup". They carry no similarity signal (exact dedup owns
    // empty docs), so drop them before banding.
    val tokenful = df.filter(
      coalesce(translate(col(textCol), " ", ""), lit("")) =!= "")
    val fps = simHash(tokenful, idCol, textCol).cache()
    val cap = maxPerBucket match {
      case Some(c) if c == Int.MaxValue => None // explicit exact cover
      case Some(c)                      => Some(c)
      case None =>
        // one count over the cached 16-byte-row fingerprint relation —
        // metadata-priced next to the banding join it sizes
        if (fps.count() > autoCapDocs) {
          log.warn(
            s"simHashPairs: corpus exceeds $autoCapDocs docs — " +
              s"capping band buckets at $autoCap distinct prints " +
              "(bounded recall; see scaladoc / SCALE.md, or use " +
              "simHashPairs128 for an exact wider-key cover)")
          Some(autoCap)
        } else None
    }
    val out = hammingPairs64(fps, idCol, "simhash", maxHamming, cap)
    fps.unpersist() // out is eagerly materialized inside hammingPairs64
    out
  }

  /** MinHash-LSH banding planner: for a target Jaccard threshold t
    * (percent), choose the (bands, rowsPerBand) factorization of
    * `nHashes` whose S-curve inflection s* = (1/b)^(1/r) sits closest
    * to t — the standard Datasketch/MMDS §3.4.3 rule, so a user asks
    * for "dedup at 0.8 Jaccard" and the planner picks the banding
    * instead of hand-tuning. Ties (equal |s*−t|) break toward MORE
    * bands (higher recall at the threshold). Pure driver-side planning
    * arithmetic — the output configures [[minHashLshPairs]].
    *
    * The float comparison is decision-only (rule 9 of the QueryDef
    * determinism contract): LshPlanMarginSpec proves every grid
    * decision at the committed nHashes values carries ≥1e-6 margin, 3+
    * orders above cross-libm pow noise.
    */
  def lshBandPlan(nHashes: Int, tPct: Int): (Int, Int) = {
    require(nHashes >= 1 && tPct >= 1 && tPct <= 99, s"bad plan inputs: $nHashes, $tPct")
    val t = tPct / 100.0
    val cands = (1 to nHashes).filter(nHashes % _ == 0).map(b => (b, nHashes / b))
    cands.minBy { case (b, r) =>
      (math.abs(math.pow(1.0 / b, 1.0 / r) - t), -b)
    }
  }

  /** Manku-style combinatorial-blocking Hamming join over ANY 64-bit
    * fingerprint relation (one row per id, `fpCol` LongType) — the
    * banding core of [[simHashPairs]], factored out so non-text
    * fingerprints (image dHash, audio energy hashes) reuse the exact
    * same complete-cover machinery. Returns (a, b, hamming) with
    * a < b and hamming ≤ maxHamming; the C(m, c) c-chunk cover
    * (m = maxHamming + `bandChunks`) is complete for any c, so the
    * UNCAPPED pair set equals the all-pairs predicate regardless of
    * `bandChunks` — c only moves the random-collision floor vs band
    * count trade (capped output IS banding-relative; callers that cap
    * must pin their c).
    *
    * `maxPerBucket` bounds BOTH candidate and output volume: band
    * buckets rank-limit to the first `cap` distinct prints, and
    * identical-fingerprint groups larger than the cap emit a linear
    * star (min-id rep → member) instead of their ~n²/2 clique —
    * connected components are preserved exactly either way (see the
    * `within` comment below). Unset, both are exact.
    */
  def hammingPairs64(
      fpDf: DataFrame,
      idCol: String,
      fpCol: String,
      maxHamming: Int,
      maxPerBucket: Option[Int] = None,
      bandChunks: Int = 2
  ): DataFrame = {
    // GENERALIZED cover (round 13): m = k + c chunks, band = every
    // C(m, c) c-chunk combination. A pair within hamming k dirties ≤ k
    // chunks, so ≥ c are clean, and the clean set contains (at least)
    // one full band — completeness holds for any c ≥ 1; c picks the
    // collision-floor/band-count trade (see the simHashPairs ladder).
    require(bandChunks >= 1 && bandChunks <= 3,
      s"bandChunks=$bandChunks out of range (1..3 supported)")
    val m = maxHamming + bandChunks
    require(m <= 64, s"maxHamming=$maxHamming too large for a 64-bit fingerprint")
    // chunk i covers fingerprint bits [starts(i), starts(i+1))
    val starts = (0 to m).map(i => i * 64 / m)
    def chunk(c: org.apache.spark.sql.Column, i: Int): org.apache.spark.sql.Column = {
      val lo = starts(i)
      val w = starts(i + 1) - lo
      val mask = if (w >= 64) -1L else (1L << w) - 1
      shiftright(c, lo).bitwiseAND(mask)
    }
    // one row per doc, two longs — cached because the distinct-print
    // banding AND both expansion joins read it
    val fp = fpDf.select(col(idCol), col(fpCol).as("simhash")).cache()
    // EXACT-GROUP COLLAPSE on the pair-emission path (round 11): the
    // banded self-join runs over DISTINCT fingerprints only, then the
    // surviving fingerprint pairs expand back to id pairs through two
    // co-keyed equi-joins, and identical-fingerprint id pairs come
    // from one fingerprint-keyed self-join. The emitted pair set is
    // PROVABLY the original's: a doc pair (x, y), hamming ≤ k, has
    // either equal prints (→ the within-group join, hamming 0) or
    // distinct prints whose pair shares ≥1 Manku band (→ the distinct
    // banding, expanded via x's and y's print groups — each doc pair
    // arises from exactly ONE print pair, so no distinct over the
    // expanded relation is needed). Candidate work collapses from
    // Σ_buckets |bucket|² over DOCS to the same sum over distinct
    // PRINTS — on a corpus where every payload occurs c times, a c²
    // join reduction (measured on the stripe-PNG image face at sf0.1:
    // 19.1M → ~0.2M band candidates, 5.1 s → sub-second).
    val combos = (0 until m).combinations(bandChunks).map(_.toSeq).toSeq
    val bandCols = combos.zipWithIndex.map { case (cs, idx) =>
      // band key = the combo's chunks packed little-endian; total
      // width ≤ c·ceil(64/m) ≤ 64 bits for every supported (k, c).
      // `prior` is the canonical-cover mask: the chunks that would
      // have to be DIRTY for this combo to be the lexicographically
      // first all-clean one (every chunk below the combo's last,
      // minus the combo's own) — see the uncapped join below.
      val (key, _) = cs.foldLeft((lit(0L), 0)) { case ((acc, off), i) =>
        val w = starts(i + 1) - starts(i)
        (acc.bitwiseOR(shiftleft(chunk(col("simhash"), i), off)), off + w)
      }
      val prior = ((1L << cs.last) - 1L) & ~cs.map(1L << _).reduce(_ | _)
      struct(lit(idx).as("band"), key.as("key"), lit(prior).as("prior"))
    }
    val bandedAll = fp
      .select(col("simhash")).distinct()
      .select(col("simhash"), explode(array(bandCols: _*)).as("bk"))
      .select(col("simhash"), col("bk.band").as("band"),
        col("bk.key").as("key"), col("bk.prior").as("prior"))
    val banded = maxPerBucket match {
      case None => bandedAll
      case Some(cap) =>
        // rank-limit WITHIN the bucket (first `cap` DISTINCT prints by
        // fingerprint value) rather than dropping over-cap buckets
        // outright: a hot key keeps its first cap prints' pairs
        // instead of losing all of them, and the candidate ceiling
        // stays O(m·d·cap) over d distinct prints (≤ cap² join rows
        // per bucket). The window shuffles on the same (band, key) the
        // self-join exchanges anyway. Note the cap now counts PRINTS,
        // not docs — strictly more recall per cap than the pre-r11
        // doc cap, since exact duplicates no longer consume budget.
        val wBucket = Window.partitionBy(col("band"), col("key"))
          .orderBy(col("simhash").asc)
        bandedAll
          .withColumn("__bn", row_number().over(wBucket))
          .filter(col("__bn") <= cap)
          .drop("__bn")
    }
    // NEVER let the static planner broadcast a band side: Generate
    // (the explode) keeps its CHILD's size estimate, so the banded
    // relation looks ~8 MB when it is actually |prints|·C(m,c) rows —
    // at 500k prints × 120 bands that is a 6 GiB broadcast build (OOM,
    // found by SimHashStageProbe at sf10). The hint pins a shuffle
    // merge join; AQE still re-plans splits/skew from runtime stats.
    val l = banded.select(col("simhash").as("fa"), col("band"),
      col("key"), col("prior"))
    val r = banded.select(col("simhash").as("fb"), col("band"), col("key"))
    val joined = l.hint("shuffle_merge").join(r, Seq("band", "key"))
      .filter(col("fa") < col("fb"))
    val fpPairs = maxPerBucket match {
      case None =>
        // CANONICAL-COVER EMISSION (round 13): a ≤k pair with clean
        // chunk set S collides in C(|S|, c) bands — near-dup-dense
        // corpora emit each surviving pair up to C(k+c-1, c) times and
        // the distinct() that crunched them was the measured wall
        // (~4 s of the 17.4 s exact sf10 run, over 1.1e9 raw rows,
        // SimHashStageProbe). Instead each pair is kept ONLY in its
        // canonical band — the lexicographically first all-clean
        // combo, tested per row as "every chunk below the combo's
        // last, minus the combo's own, is dirty" against the xor's
        // clean-chunk bitmask. Pure bitops inside the join's codegen
        // stage: the duplicates die before any exchange, the pair set
        // is emitted exactly once, and no distinct runs at all.
        val xorC = col("fa").bitwiseXOR(col("fb"))
        val cleanMask = (0 until m).map { lch =>
          val lo = starts(lch)
          val w = starts(lch + 1) - lo
          val mask = if (w >= 64) -1L else (1L << w) - 1
          when(shiftright(xorC, lo).bitwiseAND(mask) === 0L,
            lit(1L << lch)).otherwise(lit(0L))
        }.reduce(_ bitwiseOR _)
        joined
          .withColumn("hamming", bit_count(xorC).cast("long"))
          .filter(col("hamming") <= maxHamming)
          .filter(cleanMask.bitwiseAND(col("prior")) === 0L)
          .select(col("fa"), col("fb"), col("hamming"))
      case Some(_) =>
        // capped buckets prune prints PER BAND, so a pair's canonical
        // band may be the pruned one while a later band keeps both —
        // the capped path must keep the distinct
        joined
          .select(col("fa"), col("fb"))
          .distinct()
          .withColumn("hamming",
            bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long"))
          .filter(col("hamming") <= maxHamming)
    }
    val xa = fp.select(col(idCol).as("__xa"), col("simhash").as("fa"))
    val xb = fp.select(col(idCol).as("__xb"), col("simhash").as("fb"))
    val cross = fpPairs.join(xa, "fa").join(xb, "fb")
      .select(
        least(col("__xa"), col("__xb")).as("a"),
        greatest(col("__xa"), col("__xb")).as("b"),
        col("hamming"))
    // Within-group (identical-fingerprint) pairs. Uncapped, the clique
    // is exact. With a cap set, the caller has opted into BOUNDED
    // OUTPUT — and an exact-duplicate pileup (one print repeated n
    // times: the adversarial/degenerate corpus the cap exists for)
    // would otherwise emit ~n²/2 identical-print pairs no cap touches.
    // So groups LARGER than the cap emit a linear star rep→member
    // (min-id rep) instead of the clique: connected components — the
    // property every downstream consumer (clusterize, drop sets) uses
    // — are preserved exactly, output is O(n) per group, and groups at
    // or under the cap keep their full clique so the capped pair set
    // only changes on corpora that were already past the posture's
    // bounds. maxPerBucket = Some(Int.MaxValue) still means the exact
    // cover everywhere ([[simHashPairs]] maps it to cap = None).
    val within = maxPerBucket match {
      case None =>
        fp.select(col(idCol).as("a"), col("simhash"))
          .join(fp.select(col(idCol).as("b"), col("simhash")), "simhash")
          .filter(col("a") < col("b"))
          .select(col("a"), col("b"), lit(0L).as("hamming"))
      case Some(cap) =>
        // group size + rep ride one window over the same simhash
        // exchange the self-join below uses
        val wG = Window.partitionBy(col("simhash"))
        val sized = fp
          .withColumn("__gn", count(lit(1)).over(wG))
          .withColumn("__rep", min(col(idCol)).over(wG))
        val small = sized.filter(col("__gn") <= cap)
        val clique = small.select(col(idCol).as("a"), col("simhash"))
          .join(small.select(col(idCol).as("b"), col("simhash")), "simhash")
          .filter(col("a") < col("b"))
          .select(col("a"), col("b"))
        val star = sized.filter(col("__gn") > cap)
          .filter(col(idCol) =!= col("__rep"))
          .select(col("__rep").as("a"), col(idCol).as("b"))
        clique.unionByName(star).withColumn("hamming", lit(0L))
    }
    val out = within.unionByName(cross).cache()
    out.count()
    fp.unpersist()
    out
  }

  /** Incremental (refresh-shape) Hamming join: every NEW fingerprint
    * against the STANDING HISTORY's, with no history-internal pairwork
    * — the T2 resumability story for 64-bit fingerprints (image dHash,
    * SimHash), mirroring [[minHashLshPairsAgainst]]. Both sides go
    * through the identical C(m,2) chunk bands as [[hammingPairs64]];
    * the pigeonhole completeness argument is unchanged by the cross
    * shape (a ≤ maxHamming pair still shares ≥2 clean chunks), so the
    * result equals the all-pairs new×history predicate. Returns
    * (new_id, hist_id, hamming ≤ maxHamming).
    */
  def hammingPairsAgainst64(
      newFp: DataFrame,
      histFp: DataFrame,
      idCol: String,
      fpCol: String,
      maxHamming: Int
  ): DataFrame = {
    val m = maxHamming + 2
    require(m <= 64, s"maxHamming=$maxHamming too large for a 64-bit fingerprint")
    val starts = (0 to m).map(i => i * 64 / m)
    def chunk(c: org.apache.spark.sql.Column, i: Int): org.apache.spark.sql.Column = {
      val lo = starts(i)
      val w = starts(i + 1) - lo
      val mask = if (w >= 64) -1L else (1L << w) - 1
      shiftright(c, lo).bitwiseAND(mask)
    }
    val combos = for { i <- 0 until m; j <- (i + 1) until m } yield (i, j)
    // Exact-group collapse, cross-shape (round 11, same algebra as
    // [[hammingPairs64]]): band-join DISTINCT prints of each side,
    // then expand each surviving print pair through both sides' print
    // groups. A (new, hist) doc pair has exactly one print pair, and
    // a ≤k print pair (including fa = fb, hamming 0) shares ≥1 Manku
    // band — so the expansion reproduces the original pair set with
    // candidate work scaled by distinct prints, not doc counts.
    def banded(df: DataFrame): DataFrame = {
      val bandCols = combos.zipWithIndex.map { case ((i, j), idx) =>
        val wi = starts(i + 1) - starts(i)
        // canonical-cover mask, as in [[hammingPairs64]] (r13): the
        // chunks that must be dirty for (i, j) to be the pair's
        // lexicographically first all-clean combo
        val prior = ((1L << j) - 1L) & ~(1L << i)
        struct(
          lit(idx).as("band"),
          chunk(col("fp"), i)
            .bitwiseOR(shiftleft(chunk(col("fp"), j), wi))
            .as("key"),
          lit(prior).as("prior")
        )
      }
      df.select(col(fpCol).as("fp")).distinct()
        .select(col("fp"), explode(array(bandCols: _*)).as("bk"))
        .select(col("fp"), col("bk.band").as("band"),
          col("bk.key").as("key"), col("bk.prior").as("prior"))
    }
    val newC = newFp.select(col(idCol), col(fpCol)).cache()
    val histC = histFp.select(col(idCol), col(fpCol)).cache()
    // canonical-cover emission instead of distinct() — each surviving
    // (fa, fb) pair (INCLUDING fa = fb, whose clean set is everything
    // and whose canonical band is combo 0) is kept only in the band of
    // its first two clean chunks; duplicates die inside the join's
    // codegen stage before any exchange (see hammingPairs64 r13). The
    // static planner must also never broadcast an exploded band side
    // (Generate keeps its child's size estimate) — hint as there.
    val xorC = col("fa").bitwiseXOR(col("fb"))
    val cleanMask = (0 until m).map { lch =>
      val lo = starts(lch)
      val w = starts(lch + 1) - lo
      val mask = if (w >= 64) -1L else (1L << w) - 1
      when(shiftright(xorC, lo).bitwiseAND(mask) === 0L,
        lit(1L << lch)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    val fpPairs = banded(newC)
      .select(col("fp").as("fa"), col("band"), col("key"), col("prior"))
      .hint("shuffle_merge")
      .join(
        banded(histC).select(col("fp").as("fb"), col("band"), col("key")),
        Seq("band", "key"))
      .withColumn("hamming", bit_count(xorC).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .filter(cleanMask.bitwiseAND(col("prior")) === 0L)
      .select(col("fa"), col("fb"), col("hamming"))
    val out = fpPairs
      .join(newC.select(col(idCol).as("new_id"), col(fpCol).as("fa")), "fa")
      .join(histC.select(col(idCol).as("hist_id"), col(fpCol).as("fb")), "fb")
      .select(col("new_id"), col("hist_id"), col("hamming"))
      .cache()
    out.count()
    newC.unpersist()
    histC.unpersist()
    out
  }

  /** Components + canonicals directly from a 64-bit FINGERPRINT
    * relation, exact-group collapsed — the production shape of
    * fingerprint clustering at corpus scale. Exact-duplicate
    * fingerprints are pervasive in real corpora (byte-identical
    * images/docs re-crawled millions of times), and feeding the full
    * pair relation to components pays C(k,2) pairs per
    * identical-fingerprint clique — quadratic in the clique size for
    * edges that carry zero extra connectivity. Collapse first:
    *
    *   1. one representative (min id) per DISTINCT fingerprint;
    *   2. each exact group contributes a linear star rep→member;
    *   3. the Manku Hamming banding join runs over distinct
    *      fingerprints only.
    *
    * The cluster partition PROVABLY equals `clusterize` over the full
    * [[hammingPairs64]] relation: identical fingerprints are
    * hamming-0 connected (the star), any cross pair connects its two
    * exact groups through their reps, component minima are reps (a
    * rep is its group's min id), and the node sets coincide. The
    * candidate work now scales with the distinct-fingerprint
    * population instead of corpus size — on a corpus where every
    * image occurs k times, that is a k² reduction of the join and a
    * k×→1× reduction of pair emission (measured: the sf1 image-dedup
    * graph drops from 138 s of quadratic pair emission to seconds).
    */
  def clusterizeHamming64(
      fpDf: DataFrame,
      idCol: String,
      fpCol: String,
      maxHamming: Int,
      maxPerBucket: Option[Int] = None,
      localThreshold: Long = 500000L): DataFrame = {
    val fp = fpDf.select(col(idCol).as("__id"), col(fpCol).as("__fp")).cache()
    val groups = fp.groupBy("__fp")
      .agg(min("__id").as("__rep"), count(lit(1)).as("__gn")).cache()
    // near-dup connectivity between exact groups: distinct prints only
    val repPairs = hammingPairs64(
      groups.select(col("__rep").as("__id"), col("__fp")),
      "__id", "__fp", maxHamming, maxPerBucket)
      .select(col("a"), col("b"))
    // Components are computed at the REP level only (one node per
    // distinct fingerprint — DhashGraphProbe r13: 579 reps for 500k
    // images), then every member INHERITS its rep's label through one
    // linear join. The pre-r13 formulation unioned the ~corpus-sized
    // member→rep star edges into the generic clusterize, which (a)
    // collected them all to the driver in the local tier and (b)
    // tipped the 500k-image corpus over localThreshold into iterated
    // distributed star-contraction for a graph whose contraction is
    // already known — 28 s of CC for 579 real nodes (5.2x/decade on
    // linear data). Label equality is exact: a component's min id is
    // its min rep (each rep is its group's min), members never lower
    // it, so rep-graph labels ARE the member-graph labels.
    val repComp = clusterize(repPairs, "__rep", localThreshold)
      .select(col("__rep"), col("component").as("__comp"))
    // node set preserved exactly: docs in exact groups >= 2 (they had
    // star edges) plus members of singleton groups whose rep is
    // near-dup connected (they appeared via repPairs)
    val out = fp.join(groups, "__fp")
      .join(repComp, Seq("__rep"), "left")
      .filter(col("__gn") >= 2L || col("__comp").isNotNull)
      .select(col("__id"),
        coalesce(col("__comp"), col("__rep")).as("component"))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("component"))))
      .select(col("__id").as(idCol), col("component"),
        col("cluster_size"),
        (col("__id") === col("component")).as("is_canonical"))
      .cache()
    out.count()
    groups.unpersist()
    fp.unpersist()
    out
  }

  /** 128-bit SimHash: two independent FNV-1a folds per token (the
    * second seeded with offset-basis ⊕ golden-ratio — both bases are
    * public constants, replayed by the oracle), 128 per-bit ±1
    * majorities, fingerprint = (word1, word2). This is the production
    * fingerprint width for 10⁹-document corpora: ANY fixed 64-bit
    * banding has a random-collision floor ∝ n²/2^w (SCALE.md), and
    * widening the fingerprint — not the bands — is what moves it.
    */
  val simHash128Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (text: String) =>
      if (text == null) Array(0L, 0L)
      else {
        val counts = new Array[Int](128)
        val toks = text.split(" ", -1)
        var i = 0
        while (i < toks.length) {
          val t = toks(i)
          if (t.nonEmpty) {
            var h1 = 0xcbf29ce484222325L
            var h2 = 0x55c5e55dfb685f30L // basis ^ 0x9e3779b97f4a7c15
            var k = 0
            while (k < t.length) {
              // codepoint fold — see [[simHashUdf]]
              val c = t.codePointAt(k).toLong
              h1 ^= c; h1 *= 0x100000001b3L
              h2 ^= c; h2 *= 0x100000001b3L
              k += Character.charCount(c.toInt)
            }
            var j = 0
            while (j < 64) {
              if (((h1 >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
              if (((h2 >>> j) & 1L) == 1L) counts(64 + j) += 1 else counts(64 + j) -= 1
              j += 1
            }
          }
          i += 1
        }
        var f1 = 0L
        var f2 = 0L
        var j = 0
        while (j < 64) {
          if (counts(j) > 0) f1 |= (1L << j)
          if (counts(64 + j) > 0) f2 |= (1L << j)
          j += 1
        }
        Array(f1, f2)
      }
    }

  /** 128-bit SimHash near-dup pairs — the same Manku combinatorial
    * blocking as [[simHashPairs]], over the wider fingerprint: m =
    * maxHamming+2 chunks rounded up to EVEN (so chunks never straddle
    * the two words — m/2 per word), band on every C(m,2) two-chunk
    * combination; a ≤k pair leaves ≥2 chunks clean. At k=7 keys are
    * ~25 bits (vs ~15 for 64-bit), pushing the random-collision floor
    * to C(10,2)·n²/2²⁵ — the committed 10⁹-doc configuration.
    * Verified with popcount over both words.
    */
  def simHashPairs128(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 7,
      maxPerBucket: Option[Int] = None
  ): DataFrame = {
    // maxHamming=0 would give m=2 single-word chunks, and the band-key
    // pack shiftleft(chunk(j), 64) wraps to shift 0 on the JVM — the
    // key silently degrades to f1|f2. Hamming-0 "pairs" are exact
    // fingerprint duplicates anyway: groupBy (f1, f2) (Dedup.exact on
    // the fingerprint) is the right operator for that question.
    require(maxHamming >= 1,
      s"simHashPairs128 needs maxHamming >= 1 (got $maxHamming); " +
        "for hamming-0 use exact dedup on the (f1, f2) fingerprint")
    val m0 = maxHamming + 2
    val m = if (m0 % 2 == 0) m0 else m0 + 1
    require(m <= 128, s"maxHamming=$maxHamming too large for a 128-bit fingerprint")
    val mw = m / 2
    val starts = (0 to mw).map(i => i * 64 / mw)
    // chunk c (0-based over all m): word = c / mw, in-word index c % mw
    def chunk(c: Int): org.apache.spark.sql.Column = {
      val w = c / mw
      val j = c % mw
      val lo = starts(j)
      val width = starts(j + 1) - lo
      val mask = if (width >= 64) -1L else (1L << width) - 1
      shiftright(col(s"f${w + 1}"), lo).bitwiseAND(mask)
    }
    def chunkWidth(c: Int): Int = starts(c % mw + 1) - starts(c % mw)
    val tokenful = df.filter(
      coalesce(translate(col(textCol), " ", ""), lit("")) =!= "")
    val fp = tokenful
      .select(col(idCol), simHash128Udf(col(textCol)).as("fp"))
      .select(col(idCol), col("fp").getItem(0).as("f1"), col("fp").getItem(1).as("f2"))
      .cache()
    val combos = for { i <- 0 until m; j <- (i + 1) until m } yield (i, j)
    val bandCols = combos.zipWithIndex.map { case ((i, j), idx) =>
      // canonical-cover prior mask, as in [[hammingPairs64]] (r13) —
      // m = k+2(+1) stays ≤ 64 for any sane k, so one long covers it
      val prior = ((1L << j) - 1L) & ~(1L << i)
      struct(
        lit(idx).as("band"),
        chunk(i).bitwiseOR(shiftleft(chunk(j), chunkWidth(i))).as("key"),
        lit(prior).as("prior"))
    }
    val bandedAll = fp
      .select(col(idCol), col("f1"), col("f2"), explode(array(bandCols: _*)).as("bk"))
      .select(col(idCol), col("f1"), col("f2"),
        col("bk.band").as("band"), col("bk.key").as("key"),
        col("bk.prior").as("prior"))
    val banded = maxPerBucket match {
      case None => bandedAll
      case Some(cap) =>
        // same rank-limit-within-bucket semantics as simHashPairs
        val wBucket = Window.partitionBy(col("band"), col("key"))
          .orderBy(col(idCol).asc)
        bandedAll
          .withColumn("__bn", row_number().over(wBucket))
          .filter(col("__bn") <= cap)
          .drop("__bn")
    }
    val l = banded.select(col(idCol).as("a"), col("f1").as("a1"), col("f2").as("a2"),
      col("band"), col("key"), col("prior"))
    val r = banded.select(col(idCol).as("b"), col("f1").as("b1"), col("f2").as("b2"),
      col("band"), col("key"))
    // shuffle_merge: the exploded band relation's static size estimate
    // is its (small, cached) child's — see the hammingPairs64 note on
    // Generate fooling the broadcast planner (r13, found live at sf10)
    val joined = l.hint("shuffle_merge").join(r, Seq("band", "key"))
      .filter(col("a") < col("b"))
      .withColumn("hamming",
        (bit_count(col("a1").bitwiseXOR(col("b1"))) +
          bit_count(col("a2").bitwiseXOR(col("b2")))).cast("long"))
      .filter(col("hamming") <= maxHamming)
    val pairs = maxPerBucket match {
      case None =>
        // canonical-cover emission (r13, same algebra as
        // hammingPairs64): keep each pair only in the band of its
        // first two clean chunks — a per-row bitmask test replaces
        // the distinct over every duplicate band hit. Identical
        // fingerprints (both xors zero, all chunks clean) survive
        // exactly in band 0.
        val cleanMask = (0 until m).map { c =>
          val w = c / mw
          val lo = starts(c % mw)
          val width = starts(c % mw + 1) - lo
          val mask = if (width >= 64) -1L else (1L << width) - 1
          val xorW = col(s"a${w + 1}").bitwiseXOR(col(s"b${w + 1}"))
          when(shiftright(xorW, lo).bitwiseAND(mask) === 0L,
            lit(1L << c)).otherwise(lit(0L))
        }.reduce(_ bitwiseOR _)
        joined
          .filter(cleanMask.bitwiseAND(col("prior")) === 0L)
          .select(col("a"), col("b"), col("hamming"))
      case Some(_) =>
        // capped buckets prune per band — the canonical band may be
        // the pruned one, so the capped path keeps the distinct
        joined.select(col("a"), col("b"), col("hamming")).distinct()
    }
    val out = pairs.cache()
    out.count()
    fp.unpersist()
    out
  }
}
