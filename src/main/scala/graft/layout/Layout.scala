package graft.layout

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, md5, struct, when}

/** Physical corpus layout: hash-bucketed parquet tables so that every
  * downstream key-equijoin and key-aggregation is EXCHANGE-FREE.
  *
  * Why this matters at 100 TB: the curation passes (exact dedup by
  * digest, near-dup drop-set anti-join, embedding attach, incremental
  * ingest anti-join) all join the corpus on its document key. Unbucketed,
  * EVERY such pass re-shuffles the full corpus — at 100 TB that is the
  * dominant cost of the whole pipeline, paid per pass. Written once as
  * a bucketed table (`CLUSTERED BY (key) INTO n BUCKETS`), the corpus
  * is born hash-partitioned on disk: Spark's scan reports
  * HashPartitioning(key, n), Catalyst's EnsureRequirements sees the
  * child already satisfies the join/agg distribution, and the shuffle
  * disappears from the plan (LayoutSpec asserts zero
  * ShuffleExchangeExec). Two tables bucketed the SAME way co-locate,
  * so corpus⋈embeddings is a per-bucket merge with no data movement
  * at all.
  *
  * Reference analog: the reference keeps per-channel directory trees
  * and re-reads them per stage (data_pipeline.py's per-stage rglob);
  * the bucketed table is the Spark-native replacement that also fixes
  * the re-shuffle cost.
  *
  * Sizing guidance (SCALE.md): buckets ≈ corpus_bytes / 256 MB,
  * rounded to a power of two — 100 TB → 2^18-2^19 buckets; bucket
  * count is fixed at write time, so size for the corpus you intend to
  * grow into (cheap over-bucketing beats a rewrite).
  *
  * The writer repartitions by the bucket key into exactly `buckets`
  * partitions first: Spark's bucket-file hash and repartition hash are
  * both Murmur3 pmod n, so each task owns exactly one bucket and each
  * bucket lands in ONE file per write — keeping `sortBy` metadata
  * usable (Spark only trusts per-bucket sort order when a bucket is a
  * single file) and avoiding the small-files explosion of
  * task-count × bucket-count outputs.
  */
object Layout {

  /** Drop a managed table from BOTH the catalog and the warehouse
    * directory. Idempotence across SESSIONS, not just within one: the
    * in-memory catalog forgets tables on restart but the managed-table
    * directory survives, and saveAsTable then refuses with
    * LOCATION_ALREADY_EXISTS. (A cluster metastore remembers the table,
    * making this a plain overwrite; the cleanup is for catalog/location
    * drift.)
    */
  def dropWithLocation(spark: SparkSession, tableName: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    // Hadoop FS, not java.io.File: a warehouse on hdfs://s3a:// must
    // resolve through the table location's own filesystem (the same
    // remote-FS blind spot fixed in appendTrainingShards' corpus probe)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog
        .defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(tableName)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true): Unit
  }

  /** Write `df` as a bucketed+sorted managed parquet table. Idempotent
    * (overwrite). The table lives in the session catalog's warehouse;
    * on a cluster this would be the shared metastore + object store.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      key: String,
      buckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val sorts = if (sortCols.isEmpty) Seq(key) else sortCols
    val spark = df.sparkSession
    dropWithLocation(spark, tableName)
    df.repartition(buckets, col(key))
      .write
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(tableName)
  }

  /** Append a batch into an existing bucketed table, preserving the
    * layout: rows are bucket-aligned (same repartition-by-key trick,
    * one NEW file per bucket per append) and written with insertInto,
    * which keeps the table's bucket spec. Readers stay exchange-free;
    * what grows is files-per-bucket — one per append — so periodic
    * re-bucketing (writeBucketed over the read-back) is the compaction
    * step once appends accumulate, exactly the [[compact]] small-files
    * story transposed to bucketed tables.
    */
  def appendBucketed(df: DataFrame, tableName: String): Unit = {
    val spark = df.sparkSession
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(tableName))
    val spec = meta.bucketSpec.getOrElse(
      throw new IllegalArgumentException(
        s"$tableName is not bucketed; use writeBucketed first"))
    val key = spec.bucketColumnNames.head
    df.repartition(spec.numBuckets, col(key))
      .write
      .mode(SaveMode.Append)
      .insertInto(tableName)
  }

  /** Read a bucketed table back. The scan's output partitioning is
    * HashPartitioning(key, buckets) — joins and aggregations on the
    * bucket key skip their Exchange.
    */
  def readTable(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)

  /** Hive-style partitioned parquet layout: one directory per distinct
    * partition value. This is the COARSE axis of the 100 TB layout
    * story (partition by ingest month/date, bucket by the join key,
    * z-order inside files for the selective filter dims): a filter on
    * the partition column never opens a non-matching directory (static
    * pruning, no footer reads), and a join against a filtered
    * dimension prunes partitions at RUNTIME — Catalyst inserts a
    * dynamicpruningexpression subquery on the fact scan once the dim
    * side broadcasts, so only the surviving months are read at all
    * (LayoutSpec asserts both the plan shape and the row counts).
    *
    * Cardinality guidance: partition values must stay coarse (dates,
    * months, sources — thousands, not millions); high-cardinality keys
    * belong in buckets, where the fan-out is fixed at write time.
    */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCol: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Z-order (Morton) clustered parquet layout over two integer
    * dimensions: range-partition by the interleaved key, sort within
    * partitions by it, one file per range. Because z-proximity implies
    * proximity in BOTH dimensions, every file's parquet min/max stats
    * are tight for x AND y simultaneously — predicates on either
    * dimension prune files/row-groups, where a plain sort clusters
    * only its leading column. LayoutSpec quantifies this: per-file
    * spans of both dims shrink vs the unsorted layout.
    *
    * At 100 TB this is the scan-side complement to bucketing: bucket
    * for the JOIN key, z-order the big fact files for the two
    * selective FILTER dimensions (e.g. time x channel).
    */
  def zorderWrite(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      files: Int): Unit = {
    require(files >= 1, s"files must be >= 1, got $files")
    val z = graft.plans.ZOrderExpr.zorder(col(xCol), col(yCol))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Size a compaction: how many output files a directory of parquet
    * should become at `targetBytes` per file. Listing is metadata-only
    * (no data read); the answer is ceil(total/target), never 0.
    *
    * Why it matters at scale: incremental ingest (T2's per-batch
    * appends) accretes files far smaller than a row group, and every
    * downstream scan then pays per-file open/footer costs and tiny
    * tasks. Periodic compaction to ~256 MB files restores scan
    * efficiency; the planner makes the rewrite deterministic and
    * right-sized instead of guess-partitioned.
    */
  def compactionPlan(
      spark: SparkSession,
      path: String,
      targetBytes: Long): (Long, Long, Int) = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    // Hadoop FS listing so the planner sizes hdfs://s3a:// ingest
    // directories, not only warehouse-local ones
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
    (files.length.toLong, totalBytes, nOut.toInt)
  }

  /** Rewrite a small-files directory as `ceil(bytes/target)` files.
    * Round-robin repartition (not coalesce): coalesce glues existing
    * partitions and inherits their skew, while the shuffle writes
    * near-uniform files — the point of compacting. Row-preserving,
    * order-free; callers needing an order compose with zorderWrite.
    */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long): Int = {
    val (_, _, nOut) = compactionPlan(spark, inPath, targetBytes)
    spark.read.parquet(inPath)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    nOut
  }

  /** Equijoin of two tables bucketed IDENTICALLY (same key semantics,
    * same bucket count): a co-located per-bucket join. The plan
    * contains no ShuffleExchangeExec (asserted by LayoutSpec /
    * PlanShapeSpec) — the only movement is the scan itself.
    */
  /** Corpus snapshot diff — the audit every refresh ships with: per-id
    * status between two corpus snapshots (added / removed / changed /
    * unchanged), decided on content digests. One full-outer join of
    * (id, 16-byte digest) pairs — payload text never moves, so the
    * diff of a 100 TB corpus shuffles only its id+digest projection.
    *
    * Presence is decided by a per-side marker, NOT digest nullness: an
    * id present in both snapshots with null text diffs as unchanged
    * (null-safe digest compare), never as added/removed. Precondition:
    * ids are unique within each snapshot (the full-outer join fans out
    * duplicate ids into one status row per match otherwise).
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol), md5(col(textCol)).as("__old_digest"),
      lit(true).as("__in_old"))
    val n = newDf.select(col(idCol), md5(col(textCol)).as("__new_digest"),
      lit(true).as("__in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn(
        "status",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("__old_digest") <=> col("__new_digest"), "unchanged")
          .otherwise("changed"))
      .select(col(idCol), col("status"))
  }

  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String): DataFrame = {
    val l = readTable(spark, leftTable)
    val r = readTable(spark, rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** Incremental materialized rollup: fold a delta batch's PARTIAL
    * aggregates into a stored aggregate table. Every measure column
    * must be a mergeable LONG sum (counts are sums of 1; averages are
    * (sum, count) pairs; min/max merge the same way via a later
    * extension) — the algebraic-aggregate property that makes a
    * materialized view maintainable without touching history.
    *
    * Why it matters at 100 TB: the naive refresh of a daily dashboard
    * rollup re-reads the whole fact table per day. This reads ONLY the
    * delta (already partially aggregated — group-cardinality-sized,
    * not event-sized) plus the existing rollup (also
    * group-cardinality-sized), merges by key in one shuffle, and
    * rewrites the rollup. Fact data is never re-scanned. Same
    * contract as streaming aggregation state, expressed as a batch
    * table.
    *
    * Idempotence caveat: folding the SAME delta twice double-counts —
    * callers dedupe batches upstream (the T2 resumability machinery:
    * ingested-manifest anti-join), exactly as a streaming sink would.
    */
  def mergeRollup(
      spark: SparkSession,
      path: String,
      keys: Seq[String],
      delta: DataFrame): Unit = {
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val measures = delta.columns.filterNot(keys.contains)
    require(measures.nonEmpty, "delta needs at least one measure column")
    val merged =
      if (!fs.exists(fsPath)) delta
      else {
        val cur = spark.read.parquet(path)
        require(cur.columns.sorted.sameElements(delta.columns.sorted),
          s"rollup schema drift: ${cur.columns.mkString(",")} vs ${delta.columns.mkString(",")}")
        cur.unionByName(delta)
          .groupBy(keys.map(col): _*)
          .agg(
            org.apache.spark.sql.functions.sum(measures.head).as(measures.head),
            measures.tail.map(m =>
              org.apache.spark.sql.functions.sum(m).as(m)): _*)
      }
    // reads-own-path overwrite: materialize first (bounded by rollup
    // cardinality, never fact volume)
    val out = merged.localCheckpoint()
    out.write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Delta/Iceberg-style MERGE for a plain partitioned parquet table:
    * apply a batch of upserts + deletes, rewriting ONLY the partitions
    * the batch touches (partition-pruned copy-on-write).
    *
    * Semantics (per key, keys unique in both target and batch):
    *   - batch row with `deleteCol` true and a matching target key →
    *     target row removed (an unmatched delete is a no-op);
    *   - batch row with `deleteCol` false, matching key → target row
    *     REPLACED by the batch row;
    *   - batch row with `deleteCol` false, no match → inserted.
    *
    * Contract: `partitionCol` is immutable under merge — a batch row
    * carries the partition its key already lives in (the Hive-ACID
    * constraint). That is what makes pruning sound: affected
    * partitions = the batch's own distinct partition values, so the
    * scan reads (and the overwrite rewrites) exactly those
    * directories. The distinct-partition collect is bounded by the
    * partition cardinality contract of `writePartitioned` (coarse
    * values — thousands, not millions), never by batch row count.
    * The contract is ENFORCED, not just documented: a batch row that
    * moves a key across partitions of the pruned set fails the merge
    * (require), and `validateKeysGlobally = true` additionally runs a
    * column-pruned full-table key scan to catch keys already living
    * outside the batch's partition set. Deletes that empty an entire
    * partition remove its directory (dynamic overwrite alone would
    * leave the stale files in place).
    *
    * Scale shape: at 100 TB with daily-partitioned ingest, a merge
    * batch touching 3 days reads 3 directories, full-outer-joins them
    * against the (much smaller, broadcastable) batch on the key, and
    * dynamically overwrites the same 3 directories; the other ~3000
    * partitions are never opened. Re-applying the same batch is
    * idempotent whenever the batch's values are absolute (not reads of
    * current state) — merge∘merge = merge.
    */
  def mergeUpsert(
      spark: SparkSession,
      path: String,
      partitionCol: String,
      keyCol: String,
      batch: DataFrame,
      deleteCol: String = "__deleted",
      validateKeysGlobally: Boolean = false): Unit = {
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataCols = batch.columns.filterNot(_ == deleteCol)
    require(dataCols.contains(keyCol) && dataCols.contains(partitionCol),
      s"batch must carry $keyCol and $partitionCol")

    if (!fs.exists(fsPath)) {
      // cold start: the whole batch is inserts
      batch.filter(!col(deleteCol)).select(dataCols.map(col): _*)
        .write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
      return
    }

    // bounded by partition cardinality (coarse by contract), not rows.
    // Each value is collected alongside its Spark STRING rendering —
    // the same Cast(_, StringType, sessionTz) the dynamic-partition
    // writer feeds getPartitionPathString — so the emptied-directory
    // cleanup below targets the directory Spark actually wrote
    // (String.valueOf diverges for timestamps/decimals, and null is
    // written as __HIVE_DEFAULT_PARTITION__, not "null")
    val partRows = batch
      .select(col(partitionCol), col(partitionCol).cast("string").as("__ps"))
      .distinct().collect()
    val partsTyped = partRows.map(_.get(0)).toSeq
    val partsRendered = partRows.map(r =>
      if (r.isNullAt(1)) null else r.getString(1)).toSeq
    val nonNullParts = partsTyped.filter(_ != null)
    val batchHasNullPart = partsTyped.contains(null)
    // null-safe membership in the batch's partition set: a bare isin
    // yields NULL (never true) for a null partition value, which would
    // exclude the target's null partition from the pruned scan and
    // silently duplicate its keys on merge
    def inBatchParts(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val base =
        if (nonNullParts.isEmpty) lit(false)
        else coalesce(c.isin(nonNullParts: _*), lit(false))
      if (batchHasNullPart) base || c.isNull else base
    }
    val target = spark.read.parquet(path)
      .filter(inBatchParts(col(partitionCol))) // partition-pruned scan
    val b = batch.select(
      col(keyCol).as("__mk"), col(deleteCol).as("__mdel"),
      struct(dataCols.map(col): _*).as("__mrow"))

    // Keys living in partitions OUTSIDE the batch's set are invisible
    // to any pruned scan; `validateKeysGlobally` opts into the
    // column-pruned full-table key scan that catches those too (pay
    // it on low-trust batches). The within-pruned-set immutability
    // check is free — it rides the merge join itself, below.
    if (validateKeysGlobally) {
      val outside = spark.read.parquet(path)
        .filter(!inBatchParts(col(partitionCol)))
        .select(col(keyCol), col(partitionCol))
        .join(b.select(col("__mk")), col(keyCol) === col("__mk"), "left_semi")
        .limit(5).collect()
      require(outside.isEmpty,
        s"mergeUpsert contract violation: batch key(s) " +
          s"${outside.map(_.get(0)).mkString(", ")} already live in " +
          s"partitions outside the batch's own partition set " +
          s"(merge would duplicate them)")
    }

    // ENFORCE partition immutability ON the merge join itself (it is
    // what makes pruning sound, so a violation must fail loudly, not
    // insert a silent duplicate): a matched row whose batch partition
    // differs from its target partition raises a flag column; the
    // flag is checked on the CHECKPOINTED merge, so the guard costs
    // one metadata-cheap pass over already-materialized rows — no
    // second scan of the pruned partitions. The merge projection runs
    // BEFORE the checkpoint (narrow rows buffer — the __mrow struct
    // would double the footprint) and the delete filter runs AFTER the
    // flag check, so a delete row carrying the wrong partition (which
    // would silently no-op the intended delete) fails too.
    val merged = target
      .join(b, col(keyCol) === col("__mk"), "full_outer")
      .select(dataCols.map(c =>
        // batch wins on match; target-only rows keep their values
        when(col("__mk").isNotNull, col(s"__mrow.$c"))
          .otherwise(col(c)).as(c)) ++ Seq(
        col("__mdel"),
        // null-SAFE inequality: a key moving into or out of the null
        // partition must flag too (plain =!= is null there, so max()
        // would never see the violation)
        (col(keyCol).isNotNull && col("__mk").isNotNull &&
          !(col(partitionCol) <=> col(s"__mrow.$partitionCol")))
          .as("__pmoved")): _*)

    // materialize BEFORE overwriting: the merged frame reads the same
    // path it writes, which Spark's self-overwrite check rejects (and
    // lazily overwriting a live input would be wrong anyway).
    // localCheckpoint bounds the buffered data to the pruned
    // partitions; its blocks are released explicitly at the end (see
    // Graft.checkpointRdd — run-over-run leak measured without it).
    val matMerged = merged.localCheckpoint()
    // ONE pass over the checkpointed rows answers both bookkeeping
    // questions (violation flag; partitions that still have live
    // rows — needed below to detect delete-emptied directories):
    // example keys for the error message are looked up only on the
    // rare violation path
    // live partitions are collected as their STRING renderings (to
    // match partsRendered above); collect_set skips nulls, so a live
    // null partition gets its own flag — without it the cleanup below
    // would delete a null partition that still has rows
    val liveCond = col("__mdel").isNull || !col("__mdel")
    val audit = matMerged.agg(
      org.apache.spark.sql.functions.max(col("__pmoved")).as("moved"),
      org.apache.spark.sql.functions.collect_set(
        when(liveCond, col(partitionCol).cast("string")))
        .as("live"),
      org.apache.spark.sql.functions.max(
        when(liveCond && col(partitionCol).isNull, lit(true)))
        .as("live_null")).head()
    if (!audit.isNullAt(0) && audit.getBoolean(0)) {
      val moved = matMerged.filter(col("__pmoved"))
        .select(col(keyCol)).limit(5).collect()
      throw new IllegalArgumentException(
        s"mergeUpsert contract violation: batch rows move key(s) " +
          s"${moved.map(_.get(0)).mkString(", ")} across partitions " +
          s"of $partitionCol (partition is immutable under merge)")
    }
    val materialized = matMerged
      .filter(col("__mdel").isNull || !col("__mdel")) // drop deletes
      .drop("__mdel", "__pmoved")

    // dynamic overwrite: only directories present in `merged` (= the
    // pruned set) are replaced; untouched partitions' files stay put
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      materialized.write.mode(SaveMode.Overwrite).partitionBy(partitionCol)
        .parquet(path)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }

    // a batch whose deletes EMPTY an entire partition produces no rows
    // for it, so dynamic overwrite never touches the old directory and
    // the deleted rows would silently survive — diff the batch's
    // partition set against the merged output's and drop the now-empty
    // directories explicitly (both sets are partition-cardinality
    // bounded by contract)
    val liveParts = audit.getSeq[String](1).toSet
    val liveNull = !audit.isNullAt(2) && audit.getBoolean(2)
    partsRendered.foreach { rendered =>
      val isLive =
        if (rendered == null) liveNull else liveParts.contains(rendered)
      if (!isLive) {
        // getPartitionPathString is the writer's own naming: null (and
        // empty string) become __HIVE_DEFAULT_PARTITION__, everything
        // else is the escaped session-timezone string cast — the
        // previous escapePathName(String.valueOf(v)) missed nulls,
        // timestamps, and decimals, leaving their emptied directories
        // (and thus their "deleted" rows) alive
        val dirName = org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils.getPartitionPathString(partitionCol, rendered)
        fs.delete(new org.apache.hadoop.fs.Path(fsPath, dirName), true)
      }
    }
    // release the checkpoint blocks NOW — they buffered the pruned
    // partitions' rows and nothing references them after the write
    graft.core.Graft.checkpointRdd(matMerged)
      .foreach(_.unpersist(blocking = false))
  }
}
