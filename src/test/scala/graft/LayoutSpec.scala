package graft

import graft.layout.Layout
import graft.plans.BottomKIds
import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Bucketed-layout plan properties (the point of the layout: zero
  * exchange) and the native bottom-k aggregate's semantics across the
  * partial/merge/final aggregation path.
  */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bucketed co-located join plans with ZERO hash exchange") {
    val df = Registry.byName("q_layout_bucketed_join").fn(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    // the scan reports the bucket layout
    assert(p.contains("SelectedBucketsCount"), p)
  }

  test("aggregation on the bucket key plans with ZERO hash exchange") {
    val df = Registry.byName("q_layout_bucketed_agg").fn(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("unbucketed baseline DOES shuffle — the layout is what removes it") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars")
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"))
    val p = docs.hint("merge").join(embs, docs("doc_id") === embs("vec_id"))
      .queryExecution.executedPlan.toString
    assert(p.contains("Exchange hashpartitioning"), p)
  }

  test("writeBucketed produces one file per bucket (sort metadata stays usable)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars")
    Layout.writeBucketed(docs, "graft_bkt_spec_files", "doc_id", buckets = 4)
    val catalog = spark.sessionState.catalog
    val meta = catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("graft_bkt_spec_files"))
    val files = new java.io.File(new java.net.URI(meta.location.toString))
      .listFiles().filter(f => f.getName.startsWith("part-"))
    assert(files.length == 4, files.map(_.getName).mkString(","))
    assert(meta.bucketSpec.exists(_.numBuckets == 4))
  }

  test("bottomKIds agrees with the window formulation across a real shuffle") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("string").as("id"), col("source"))
      .repartition(7) // force partial buffers + serialize/merge path
    val agg = docs.groupBy("source")
      .agg(BottomKIds.bottomKIds(col("id"), "spec", 5).as("ids"))
      .select(col("source"), explode(col("ids")).as("id"))
    val win = docs
      .withColumn("h", md5(concat(lit("spec:"), col("id"))))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy("h", "id")))
      .filter(col("rn") <= 5)
      .select("source", "id")
    assert(agg.count() == win.count())
    assert(agg.except(win).isEmpty && win.except(agg).isEmpty)
  }

  test("bottomKIds output is sorted by (hash, id) and capped at k") {
    val df = Seq("a", "b", "c", "d", "e").toDF("id")
    val ids = df.agg(BottomKIds.bottomKIds(col("id"), "s", 3).as("ids"))
      .select("ids").as[Seq[String]].head()
    assert(ids.length == 3)
    val hashed = ids.map(i =>
      org.apache.commons.codec.digest.DigestUtils.md5Hex("s:" + i))
    assert(hashed == hashed.sorted)
  }

  test("bottomKIds with k larger than the group returns the whole group") {
    val df = Seq(("g", "x"), ("g", "y")).toDF("grp", "id")
    val ids = df.groupBy("grp")
      .agg(BottomKIds.bottomKIds(col("id"), "s", 100).as("ids"))
      .select("ids").as[Seq[String]].head()
    assert(ids.toSet == Set("x", "y"))
  }

  test("bottom_k_ids is callable from SQL once registered") {
    graft.plans.ArrayOps.register(spark)
    val got = spark.sql(
      "SELECT bottom_k_ids(id, 'q', 2) AS ids FROM VALUES ('a'),('b'),('c') t(id)")
      .as[Seq[String]].head()
    assert(got.length == 2)
  }
}
