package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling primitives for training-data
  * curation: every decision is a pure function of (salt, id) through
  * md5, so a sample/split is reproducible across runs, engines and
  * cluster layouts — no RNG state, no seed-per-partition coupling, and
  * any engine with md5 (Spark, DuckDB, Trino, ...) derives the exact
  * same subset. Comparisons happen on lowercase-hex prefixes, which
  * sidesteps hex→int conversion portability entirely.
  *
  * At 100 TB this is the right shape: the sampling predicate is a
  * per-row expression (codegen'd, no shuffle), pushes through joins,
  * and the same salt on two tables yields co-sampled views.
  */
object Sampling {

  /** Lowercase-hex md5 of salt:id — the decision variable. */
  def saltedHex(salt: String, id: Column): Column =
    md5(concat(lit(salt + ":"), id.cast("string")))

  /** Deterministic Bernoulli(p) sample: keep rows whose first 4 hex
    * chars sort at or below `hexThresh4` (p = (thresh+1)/65536, e.g.
    * "3fff" → 25%).
    */
  def sampleFlag(salt: String, id: Column, hexThresh4: String): Column =
    substring(saltedHex(salt, id), 1, 4) <= hexThresh4

  /** Deterministic train/val/test assignment from the first hex char:
    * '0'..trainMax → train, ..valMax → val, rest → test. Defaults give
    * 12/16 train, 2/16 val, 2/16 test.
    */
  def splitAssign(
      salt: String,
      id: Column,
      trainMax: String = "b",
      valMax: String = "d"
  ): Column = {
    val h = substring(saltedHex(salt, id), 1, 1)
    when(h <= trainMax, "train").when(h <= valMax, "val").otherwise("test")
  }

  /** Mixture sampling: keep each row with a per-source rate (hex-4
    * threshold column), e.g. upsample curated sources and downsample
    * crawl. `rateHex4` is any Column expression yielding the 4-hex
    * threshold for the row's source.
    */
  def mixtureFlag(salt: String, id: Column, rateHex4: Column): Column =
    substring(saltedHex(salt, id), 1, 4) <= rateHex4

  /** Deterministic corpus shuffle key: training-data loaders need the
    * corpus in a reproducible "random" order (decorrelated from crawl/
    * source order). Sorting by this key IS the shuffle — a pure
    * function of (salt, id), so the same permutation falls out on any
    * engine and any cluster layout, and a different salt gives an
    * independent epoch permutation. At scale, ORDER BY key is one
    * range exchange; for sharded output, `substring(key, 1, 2)` is a
    * ready-made 256-way shard assignment consistent with the order.
    */
  def shuffleKey(salt: String, id: Column): Column = saltedHex(salt, id)

  /** Token-budget mixture planner: given per-source token totals and
    * integer mixture weights (parts-per-million — float weights would
    * break cross-engine exactness), derive each source's token target
    * and the hex-4 threshold [[mixtureFlag]] consumes:
    *
    *   target_s = budget · ppm_s div 10^6
    *   thresh_s = target_s · 65536 div total_s − 1   (keep_all → ffff)
    *
    * mixtureFlag keeps (thresh+1)/65536 of rows, so the realized token
    * take approximates target_s with no RNG and no float thresholds.
    * All arithmetic is long div — oracle-exact. The per-source totals
    * aggregate is one shuffle of (source, n_tok) pairs; the weights
    * relation is dimension-sized and broadcast.
    *
    * Bounds: target·65536 must stay below 2^63 — holds through ~10^14
    * target tokens (a 100 T-token budget), document larger budgets by
    * switching the div chain to DECIMAL.
    */
  def planMixture(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      weights: DataFrame, // (sourceCol, weight_ppm long)
      budgetTokens: Long
  ): DataFrame = {
    val totals = df
      .groupBy(sourceCol)
      .agg(sum(TextAnalysis.tokenCountWs(col(textCol))).as("n_tok_total"))
    totals
      .join(broadcast(weights), Seq(sourceCol), "left")
      .withColumn("weight_ppm", coalesce(col("weight_ppm"), lit(0L)))
      .withColumn("target_tok", expr(s"weight_ppm * ${budgetTokens}L div 1000000"))
      .withColumn("keep_all", col("target_tok") >= col("n_tok_total"))
      .withColumn(
        "rate_thresh",
        when(col("keep_all"), lit(65535L))
          .otherwise(greatest(lit(0L), expr("target_tok * 65536 div n_tok_total") - 1L)))
      .withColumn("rate_hex4", lpad(lower(hex(col("rate_thresh"))), 4, "0"))
  }

  /** Deterministic k-per-group sample: rank rows inside each group by
    * their salted hash (a reproducible random order) and keep the
    * first k — balanced subsets across sources/languages without an
    * RNG. One shuffle on the group key; at scale this is the same
    * shape as any per-group top-k (bounded-heap friendly).
    */
  def perGroupSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      k: Int,
      salt: String
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(saltedHex(salt, col(idCol)), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
  }

  /** EXACT stratified train/val/test split: within each stratum, rank
    * by (salted md5, id) and cut at floor(n·permille/1000) — every
    * stratum's split sizes are exact to ±0 rows (vs [[splitAssign]]'s
    * hash-proportional sizes, exact only in expectation). The cut is
    * cross-multiplied (`rank·1000 <= n·permille`), so the decision
    * carries no float and replays bit-exactly in any engine.
    *
    * Scale tiering: the rank window sorts each stratum — fine for
    * strata up to billions of rows (one range exchange per stratum),
    * but [[splitAssign]] remains the zero-shuffle path when
    * hash-proportional sizes are acceptable. Membership here is NOT
    * stable under corpus growth (ranks shift); use splitAssign when
    * rows must never migrate between splits across snapshots.
    */
  def stratifiedExactSplit(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      salt: String,
      trainPermille: Int = 800,
      valPermille: Int = 100
  ): DataFrame = {
    require(trainPermille >= 0 && valPermille >= 0 &&
      trainPermille + valPermille <= 1000,
      "permille arguments must be non-negative and sum to <= 1000")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(saltedHex(salt, col(idCol)), col(idCol))
    val wn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
    df.withColumn("__rank", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wn))
      .withColumn("split",
        when(col("__rank") * 1000 <= col("__n") * trainPermille, "train")
          .when(col("__rank") * 1000 <= col("__n") * (trainPermille + valPermille),
            "val")
          .otherwise("test"))
      .drop("__rank", "__n")
  }

  /** Temperature-based mixture plan (the multilingual-LM sampling rule:
    * weight each source s by n_s^α, α ∈ [0,1] — α=1 is proportional,
    * α=0 uniform, in-between upsamples low-resource sources; mT5 /
    * XLM-R use α≈0.3–0.5). Produces exact integer token targets per
    * source that sum to budgetTokens EXACTLY (largest-remainder
    * apportionment), so a training run consumes precisely its budget.
    *
    * Engine-portable determinism: α is quantized to quarters
    * (alphaQuarters/4), n^(1/4) = sqrt(sqrt(n)) — IEEE sqrt is
    * bit-stable across engines where libm pow is not — and the weight
    * is a pinned-order product of that root, quantized to a long
    * BEFORE any decision; apportionment is pure integer arithmetic
    * (floor division + remainder ranking). targets can exceed n_s:
    * that IS upsampling (epochs_permille > 1000 means the source
    * repeats).
    *
    * Scale: one (source, n_tok) aggregate — the relation is
    * dimension-sized from there on; the apportionment window ranks
    * #sources rows. Bounds: the apportionment products budget·w_q and
    * base·w_sum are computed in DECIMAL(38,0) (they reach ~10^32 at a
    * 10^13-token corpus with a full-corpus budget — past 2^63, where
    * non-ANSI long arithmetic would silently wrap); only the final
    * per-source target (≤ budget) is cast back to long.
    */
  def temperaturePlan(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      alphaQuarters: Int,
      budgetTokens: Long
  ): DataFrame = {
    require(alphaQuarters >= 0 && alphaQuarters <= 4,
      "alphaQuarters quantizes alpha to [0,1] in quarters (0..4)")
    require(budgetTokens >= 0, "budgetTokens must be non-negative")
    val root = sqrt(sqrt(col("n_tok_total").cast("double"))) // n^(1/4)
    val w = (1 to alphaQuarters).foldLeft(lit(1.0))((acc, _) => acc * root)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val wRank = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col(sourceCol).asc)
    df.groupBy(sourceCol)
      .agg(sum(TextAnalysis.tokenCountWs(col(textCol))).as("n_tok_total"))
      .withColumn("w_q", floor(w * lit(1048576.0)).cast("long"))
      // budget·w_q overflows a long at advertised corpus scale
      // (budget ~10^13 × w_q ~10^19); DECIMAL(38,0) holds the ~10^32
      // products exactly. `div` (IntegralDivide) on decimals yields long.
      .withColumn("__wq_d", col("w_q").cast("decimal(19,0)"))
      .withColumn("__w_sum", sum(col("__wq_d")).over(wAll))
      .withColumn("__base", expr(
        s"(cast(${budgetTokens} as decimal(19,0)) * __wq_d) div __w_sum"))
      .withColumn("__rem", expr(
        s"cast(${budgetTokens} as decimal(19,0)) * __wq_d" +
          " - cast(__base as decimal(38,0)) * __w_sum"))
      .withColumn("__extra", lit(budgetTokens) - sum(col("__base")).over(wAll))
      .withColumn("__rank", row_number().over(wRank).cast("long"))
      .withColumn("target_tok",
        col("__base") + when(col("__rank") <= col("__extra"), 1L).otherwise(0L))
      .withColumn("epochs_permille", expr("(target_tok * 1000) div n_tok_total"))
      .select(sourceCol, "n_tok_total", "w_q", "target_tok", "epochs_permille")
  }

  /** Materialize a per-source token-budget plan at DOCUMENT level —
    * the step between [[temperaturePlan]]'s (source, target_tok) and
    * an actual training mix: every source repeats
    * `target_tok div total` FULL epochs (every doc), and the
    * remainder epoch takes docs in salted-shuffle order until the
    * leftover token budget is covered, INCLUDING the first doc to
    * cross the line (the scan-until rule, O6) — so the emitted token
    * mass meets the target, overshooting by less than one document.
    * Output: one row per doc with `n_copies` ≥ 0 — the Llama-style
    * data-recipe repeat factor, doc-level deterministic (same salt →
    * same partial epoch on any cluster).
    *
    * Scale: a per-source window rank + exclusive prefix sum over
    * (id, n_tok) rows — text never moves; same shuffle shape as
    * [[perGroupSample]]. Replication itself stays lazy: downstream
    * materializes copies via `explode(sequence(1, n_copies))` only at
    * the final write, or passes n_copies to a repeat-aware loader.
    */
  def epochExpand(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      textCol: String,
      targets: DataFrame, // (sourceCol, target_tok)
      salt: String): DataFrame = {
    val wSrc = org.apache.spark.sql.expressions.Window.partitionBy(col(sourceCol))
    val wPrefix = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(col("__shuf").asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(sourceCol), col(idCol),
        TextAnalysis.tokenCountWs(col(textCol)).as("n_tok"))
      .join(targets.select(col(sourceCol), col("target_tok")), Seq(sourceCol))
      .withColumn("__total", sum(col("n_tok")).over(wSrc))
      .withColumn("__full", expr("target_tok div __total"))
      .withColumn("__rem", expr("target_tok % __total"))
      .withColumn("__shuf", shuffleKey(salt, col(idCol)))
      .withColumn("__before", coalesce(sum(col("n_tok")).over(wPrefix), lit(0L)))
      .withColumn("n_copies",
        (col("__full") +
          when(col("__before") < col("__rem"), 1L).otherwise(0L)).cast("long"))
      .select(col(sourceCol), col(idCol), col("n_tok"), col("n_copies"))
  }

  /** UniMax language-balancing budget plan (Chung et al. '23,
    * "UniMax: Fairer and More Effective Language Sampling for
    * Large-Scale Multilingual Pretraining" — the T5X/PaLM-2
    * allocator): process languages in INCREASING corpus-size order;
    * each gets min(maxEpochs·n_l, remaining ∕ languages_left) tokens
    * (integer floor division — documented determinism choice), so
    * small languages are capped at their epoch budget and the surplus
    * flows to larger ones instead of a temperature exponent.
    *
    * Shape: one corpus-sized token-count aggregation, then the greedy
    * fold runs driver-local over the DIMENSION-sized language table
    * (the codebook pattern — same bounded-collect rule as the k-means
    * codebooks). Returns (langCol, n_tok, alloc_tok, epochs_permille)
    * — epochs·1000 as an integer so the "how many epochs does each
    * language see" answer carries no float.
    */
  def unimaxPlan(
      df: DataFrame,
      langCol: String,
      textCol: String,
      budgetTokens: Long,
      maxEpochs: Int
  ): DataFrame = {
    require(budgetTokens >= 0 && maxEpochs >= 1)
    val spark = df.sparkSession
    val rows = df
      .groupBy(col(langCol))
      .agg(sum(TextAnalysis.tokenCountWs(col(textCol))).cast("long").as("n_tok"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (l, n) => (n, l) }
    var rem = budgetTokens
    val out = rows.zipWithIndex.map { case ((l, n), i) =>
      val left = rows.length - i
      val a = math.min(maxEpochs.toLong * n, rem / left)
      rem -= a
      (l, n, a, if (n == 0) 0L else a * 1000L / n)
    }
    spark.createDataFrame(out.toSeq)
      .toDF(langCol, "n_tok", "alloc_tok", "epochs_permille")
  }

  /** Preference-pair construction — the DPO/RLHF data-prep op
    * (Rafailov et al. '23): within each candidate group (the k
    * responses sampled for one prompt), pair the BEST-scored response
    * as `chosen` against the WORST as `rejected`. Deterministic
    * tiebreaks (best: lower id; worst: higher id) make the pairing a
    * pure function of the data. Groups with fewer than two candidates
    * yield no pair.
    *
    * Shape: one keyed aggregation — best/worst are struct max/min
    * (map-side partial), never a per-group sort or window; at 100 TB
    * the shuffle carries one (score, id) pair per candidate.
    * Returns (groupCol, n_cands, chosen_id, chosen_score,
    * rejected_id, rejected_score).
    */
  def preferencePairs(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      scoreCol: String
  ): DataFrame =
    df.select(col(groupCol), col(idCol).cast("long").as("__id"),
        col(scoreCol).cast("long").as("__score"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_cands"),
        max(struct(col("__score").as("s"), (-col("__id")).as("ni"))).as("__best"),
        min(struct(col("__score").as("s"), (-col("__id")).as("ni"))).as("__worst"))
      .filter(col("n_cands") >= 2)
      .select(
        col(groupCol),
        col("n_cands"),
        (-col("__best.ni")).cast("long").as("chosen_id"),
        col("__best.s").as("chosen_score"),
        (-col("__worst.ni")).cast("long").as("rejected_id"),
        col("__worst.s").as("rejected_score"))
}
