package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the standard first look at a new corpus drop:
  * per-column row/null/distinct counts and native-order min/max
  * (stringified after aggregating, so numeric columns keep numeric
  * order). ONE aggregation job over the table produces every
  * column's profile (a single wide agg row, exploded to one row per
  * column) — never one pass per column.
  *
  * `count(DISTINCT ...)` is exact and therefore shuffles per column
  * (Spark plans multiple distinct aggregates via expand); at corpus
  * scale swap in approx_count_distinct — the sketches operator
  * (q_approx_sketches) is the shipped approximate face.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__${c}_nn"),
        countDistinct(col(c)).as(s"__${c}_nd"),
        min(col(c)).cast("string").as(s"__${c}_min"),
        max(col(c)).cast("string").as(s"__${c}_max")
      )
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val structs = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__${c}_nn")).as("n_null"),
        col(s"__${c}_nd").as("n_distinct"),
        col(s"__${c}_min").as("min_val"),
        col(s"__${c}_max").as("max_val")
      )
    }
    row.select(explode(array(structs: _*)).as("p")).select("p.*")
  }

  /** Merkle-style corpus integrity manifest — the reproducibility
    * artifact a 100 TB training-set drop ships alongside the data: a
    * content digest per shard plus one corpus root digest, so any two
    * parties (or the same party after a migration/compaction) can
    * prove byte-identical content without moving the corpus.
    *
    * Tree shape: leaf = md5(id ":" md5(text)) per document; documents
    * chain into GROUP digests (md5 of the id-ordered leaf
    * concatenation, ≤ `groupSize` docs per group, group = id ∕
    * groupSize); groups chain into the shard digest; shard digests
    * chain into the root. The bounded fan-out is the scale story:
    * every collect_list the aggregation plans is capped at groupSize
    * (docs→group) or docs∕groupSize (groups→shard) elements of 32-byte
    * hex — never an unbounded corpus-sized buffer — and the shuffle
    * carries digests, never text. Digest-equality of two manifests is
    * content-equality of the corpora (up to md5 collisions); a
    * mismatch localizes to the differing shard, then group, by
    * construction.
    *
    * Returns one row per shard: (shardCol, n_docs, n_chars, n_groups,
    * shard_digest, root_digest) — root_digest identical on every row.
    */
  def corpusManifest(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shardCol: String,
      groupSize: Int = 1024
  ): DataFrame = {
    require(groupSize >= 1, "groupSize >= 1")
    val id = col(idCol)
    // null text folds as "" — a null leaf would otherwise be silently
    // DROPPED by array_join and the manifest would vouch for a corpus
    // it didn't fully hash
    val text = coalesce(col(textCol), lit(""))
    val leaf = md5(concat(id.cast("string"), lit(":"), md5(text)))
    val leaves = df.select(
      col(shardCol).as("shard"),
      id.as("__id"),
      floor(id / groupSize).cast("long").as("grp"),
      leaf.as("__leaf"),
      length(text).cast("long").as("__chars"))
    def chain(sorted: org.apache.spark.sql.Column) =
      md5(array_join(transform(sorted, x => x.getField("d")), ""))
    val groups = leaves
      .groupBy(col("shard"), col("grp"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__chars")).as("n_chars"),
        chain(sort_array(collect_list(struct(col("__id").as("k"), col("__leaf").as("d")))))
          .as("grp_digest"))
    val shards = groups
      .groupBy(col("shard"))
      .agg(
        sum(col("n_docs")).cast("long").as("n_docs"),
        sum(col("n_chars")).cast("long").as("n_chars"),
        count(lit(1)).as("n_groups"),
        chain(sort_array(collect_list(struct(col("grp").as("k"), col("grp_digest").as("d")))))
          .as("shard_digest"))
    val root = shards
      .agg(chain(sort_array(collect_list(
        struct(col("shard").as("k"), col("shard_digest").as("d")))))
        .as("root_digest"))
    shards.crossJoin(broadcast(root))
      .withColumnRenamed("shard", shardCol)
  }

  /** Cross-source content-overlap matrix — the governance artifact a
    * multi-source training mix ships with: for every source pair, how
    * many distinct content digests they share (is source B already
    * inside source A? how much of the new crawl is old news?). Drives
    * dedup-order and licensing decisions before any mixing weights
    * are chosen.
    *
    * Shape: one distinct over (digest, source) — text collapses to a
    * 16-byte digest at the scan — then a digest-keyed self-join
    * restricted to src_a < src_b, then a dimension-sized pair
    * aggregation. The self-join shuffles digests only; its output is
    * bounded by shared digests × source-pair fan-out (sources are a
    * dimension, so the matrix is tiny at any corpus size). Per-source
    * digest totals ride along so overlap fractions are caller-side
    * integer divisions.
    */
  def sourceOverlapMatrix(
      df: DataFrame,
      textCol: String,
      sourceCol: String
  ): DataFrame = {
    val d = df
      .select(md5(col(textCol)).as("digest"), col(sourceCol).as("src"))
      .distinct()
    val pairs = d.select(col("digest"), col("src").as("src_a"))
      .join(d.select(col("digest"), col("src").as("src_b")), "digest")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("shared_digests"))
    val totals = d.groupBy("src").agg(count(lit(1)).as("n"))
    pairs
      .join(totals.select(col("src").as("src_a"), col("n").as("digests_a")), "src_a")
      .join(totals.select(col("src").as("src_b"), col("n").as("digests_b")), "src_b")
      .select(col("src_a"), col("src_b"), col("shared_digests"),
        col("digests_a"), col("digests_b"))
  }

  /** Per-source corpus report — the "data card" rollup a training-set
    * drop ships with: volume (docs/tokens/chars), exact duplicate
    * pressure (distinct content digests), language spread, and the
    * token-length distribution (exact discrete percentiles). ONE
    * aggregation keyed by source; every metric is integer-exact, so
    * the whole report is oracle-checkable.
    *
    * Scale: the groupBy shuffles (source, digest, lang, counts) —
    * digests are 16 bytes and sources are dimension-sized, so the
    * report costs one pass + one dimension-sized reduce. The two
    * countDistincts plan through Spark's expand (×2 row multiplier on
    * the shuffle); at 100 TB swap approx_count_distinct in for the
    * digest column if the 2× matters more than exactness.
    */
  def corpusReport(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      langCol: String): DataFrame = {
    val base = df.select(
      col(sourceCol),
      col(langCol),
      md5(col(textCol)).as("__digest"),
      graft.text.TextAnalysis.tokenCountWs(col(textCol)).as("__n_tok"),
      length(col(textCol)).cast("long").as("__n_chars"))
    base
      .groupBy(sourceCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__n_tok")).as("n_tokens"),
        sum(col("__n_chars")).as("n_chars"),
        countDistinct(col("__digest")).as("n_distinct_texts"),
        countDistinct(col(langCol)).as("n_langs"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __n_tok)")
          .cast("long").as("p50_tok"),
        expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY __n_tok)")
          .cast("long").as("p95_tok"))
      .withColumn("n_dup_docs", col("n_docs") - col("n_distinct_texts"))
  }

  /** Exact per-group discrete percentiles (SQL-standard
    * PERCENTILE_DISC: the smallest group element whose cume_dist
    * reaches p — always an actual element, never an interpolation, so
    * it is integer-exact and cross-engine checkable). One shuffle on
    * the group key; Spark's percentile aggregate buffers per-group
    * value counts, so memory is O(distinct values per group), not
    * O(rows).
    *
    * This is the corpus-calibration primitive: length/quality gates at
    * 100 TB should come from the corpus's own distribution (p5/p95 per
    * language), not hand-picked constants that mis-trim low-resource
    * languages. For a quick-and-dirty profile at scale, swap in
    * approx_percentile; gates that DROP data should pay for the exact
    * pass.
    */
  def quantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0,1], got $ps")
    val aggs = ps.map { p =>
      expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY $valueCol)")
        .cast("long")
        .as(s"p${math.round(p * 100)}")
    }
    df.groupBy(groupCol)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Adaptive outlier gate: keep rows whose value sits inside their
    * own group's [pLo, pHi] discrete-percentile band. The band table
    * is one row per group — broadcast, so the gate adds NO shuffle to
    * the corpus side.
    */
  def adaptiveBandGate(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pLo: Double,
      pHi: Double): DataFrame = {
    val bands = quantiles(df, groupCol, valueCol, Seq(pLo, pHi))
      .withColumnRenamed(s"p${math.round(pLo * 100)}", "__lo")
      .withColumnRenamed(s"p${math.round(pHi * 100)}", "__hi")
      .select(groupCol, "__lo", "__hi")
    df.join(broadcast(bands), Seq(groupCol))
      .withColumn(
        "in_band",
        col(valueCol) >= col("__lo") && col(valueCol) <= col("__hi"))
      .withColumnRenamed("__lo", "band_lo")
      .withColumnRenamed("__hi", "band_hi")
  }

  /** Gate ablation — the tuning report for a curation config: for each
    * quality gate, how many documents it fails (`n_fail`) and how many
    * it ALONE kills (`n_unique_kill`: fails this gate, passes every
    * other) — the marginal-contribution number that says which gate to
    * loosen when the funnel over-trims, plus the pass_all/n_docs
    * context on every row. ONE pass over the corpus: the per-gate
    * booleans are per-row columns, the counts one wide aggregate row
    * stacked to one row per gate. Every decision is an exact
    * string/integer/IEEE-stable comparison, so the whole report is
    * oracle-checkable.
    */
  def gateAblation(
      df: DataFrame,
      textCol: String,
      allowedLangs: Seq[String] = Seq("en", "fr", "es", "de", "zh"),
      minQuality: Double = 0.25,
      minTokens: Long = 8L,
      gopherMinWords: Long = 50L
  ): DataFrame = {
    import graft.text.TextAnalysis
    val flags = Seq(
      "lang" -> TextAnalysis.langId(col(textCol)).isin(allowedLangs: _*),
      "quality" -> (TextAnalysis.qualityScore(col(textCol)) >= minQuality),
      "tokens" -> (TextAnalysis.tokenCountWs(col(textCol)) >= minTokens),
      "gopher" -> TextAnalysis
        .gopherSignals(col(textCol), minWords = gopherMinWords)
        .toMap.apply("pass_gopher"))
    val withFlags = flags.foldLeft(df) { case (d, (n, c)) =>
      d.withColumn(s"__p_$n", c)
    }
    def others(n: String) =
      flags.filter(_._1 != n).map(f => col(s"__p_${f._1}")).reduce(_ && _)
    val aggs = flags.flatMap { case (n, _) =>
      Seq(
        count(when(!col(s"__p_$n"), 1)).as(s"fail_$n"),
        count(when(!col(s"__p_$n") && others(n), 1)).as(s"uniq_$n"))
    } ++ Seq(
      count(when(flags.map(f => col(s"__p_${f._1}")).reduce(_ && _), 1))
        .as("pass_all"),
      count(lit(1)).as("n_docs"))
    val wide = withFlags.agg(aggs.head, aggs.tail: _*)
    val stacked = flags
      .map { case (n, _) =>
        s"'$n', fail_$n, uniq_$n"
      }
      .mkString(s"stack(${flags.size}, ", ", ", ") as (gate, n_fail, n_unique_kill)")
    wide
      .select(expr(stacked), col("pass_all"), col("n_docs"))
      .orderBy("gate")
  }
}
