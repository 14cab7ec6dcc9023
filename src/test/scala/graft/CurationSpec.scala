package graft

import graft.catalog.Curation
import graft.io.{FakeAudioFetcher, FakeChannelApi}
import graft.pipeline.{FakeClassifier, Probe}
import org.apache.spark.sql.functions._

/** §3.2 probe pipeline + §3.3 curation chains over the fakes. */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private def catalogRow(id: String, subs: Long) =
    (s"title-$id", id, 20L, 1000L, subs, s"@$id", "a@b.com", s"https://yt/c/$id")

  test("probe pipeline emits nested quality rows and a DLQ (filter_channel.py)") {
    val urls = Seq("https://yt/c/one", "https://yt/c/two").toDF("url")
    val out = Probe.run(spark, urls, new FakeAudioFetcher(4), FakeClassifier,
      maxPerChannel = 2, probeCutS = 10)
    val q = out.quality.collect()
    assert(q.length == 2)
    q.foreach { cq =>
      assert(cq.snrss.nonEmpty)
      assert(cq.snrss.length == cq.acss.length) // parallel per-segment arrays
      assert(cq.acss.head.nonEmpty)
    }
    assert(out.errors.count() == 0)
  }

  test("qualityStats computes within-array counts (A1 over nested rows)") {
    val urls = Seq("https://yt/c/one").toDF("url")
    val out = Probe.run(spark, urls, new FakeAudioFetcher(4), FakeClassifier,
      maxPerChannel = 2, probeCutS = 10)
    val stats = Probe.qualityStats(out.quality.toDF(), minSnr = 12.0, minSpeechScore = 0.5)
      .select("n_total", "n_snr_ok", "n_ac_ok")
      .head()
    assert(stats.getLong(0) > 0)
    assert(stats.getLong(1) <= stats.getLong(0))
    assert(stats.getLong(2) <= stats.getLong(0))
  }

  test("mergeDedupFilter: union + dedup + subscriber gate + projection (§3.3a)") {
    val a = Seq(catalogRow("UC1", 20000L), catalogRow("UC2", 5000L))
      .toDF("title", "id", "n_videos", "n_views", "n_subs", "custom_url", "email", "url")
    val b = Seq(catalogRow("UC1", 20000L), catalogRow("UC3", 50000L))
      .toDF("title", "id", "n_videos", "n_views", "n_subs", "custom_url", "email", "url")
    val merged = Curation.mergeDedupFilter(a.unionByName(b))
    assert(merged.columns.toSeq == Curation.catalogColumns)
    assert(merged.select("id").as[String].collect().sorted.toSeq == Seq("UC1", "UC3"))
  }

  test("qualityJoin scores and ranks channels (§3.3b)") {
    val catalog = Seq(catalogRow("UC1", 20000L), catalogRow("UC2", 30000L))
      .toDF("title", "id", "n_videos", "n_views", "n_subs", "custom_url", "email", "url")
    val quality = Seq(
      ("https://yt/c/UC1", Seq(25.0, 25.0, 5.0), Seq(Seq(("Speech", 0.95)), Seq(("Speech", 0.95)), Seq(("Music", 0.9)))),
      ("https://yt/c/UC2", Seq(5.0, 4.0), Seq(Seq(("Music", 0.9)), Seq(("Music", 0.9))))
    ).toDF("url", "snrss", "raw")
      .withColumn("acss", transform(col("raw"), seg =>
        transform(seg, p => struct(p.getField("_1").as("label"), p.getField("_2").as("score")))))
      .drop("raw")
    val ranked = Curation.qualityJoin(catalog, quality).select("id", "score").collect()
    assert(ranked.head.getString(0) == "UC1") // clean channel ranks first
    assert(ranked.head.getDouble(1) > ranked.last.getDouble(1))
  }

  test("crawlerEnrich: batched lookup + not-found difference + email extraction (§3.3c)") {
    val handles = (1 to 60).map(i => s"@UChandle$i").toDF("handle")
    val (found, notFound) = Curation.crawlerEnrich(spark, handles, FakeChannelApi)
    assert(found.columns.toSeq == Curation.catalogColumns)
    val nf = found.count()
    assert(nf > 0 && nf < 60) // fake drops ids where hash % 13 == 0
    assert(notFound.count() == 60 - nf)
    // email extracted from description or N/A
    val emails = found.select("email").as[String].collect()
    assert(emails.forall(e => e == "N/A" || e.contains("@example.com")))
  }

  test("c4LineFilters applies the line rules and page gates exactly") {
    import graft.text.TextAnalysis
    val docs = Seq(
      // 4 lines: kept, kept, dropped (no terminal punct), dropped (js)
      (1L, "the quick brown fox jumps.\nanother good long line here!\nno punctuation here\nenable javascript to continue."),
      // page killed by '{' even though lines pass
      (2L, "a perfectly fine first line.\nsecond fine line is here.\nthird fine line too.\nconfig { x }"),
      // page killed by lorem ipsum
      (3L, "lorem ipsum dolor sit amet.\nsecond decent line here.\nthird decent line here.\nfourth decent line here."),
      // short lines dropped (< 3 words); page fails minKeptLines
      (4L, "too short.\nalso short.\nok?\nthe only sufficiently long line survives.")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.c4LineFilters(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("n_lines") == 4L && r1.getAs[Long]("n_kept") == 2L)
    assert(r1.getAs[String]("clean_text") ==
      "the quick brown fox jumps.\nanother good long line here!")
    assert(!r1.getAs[Boolean]("page_kept")) // only 2 kept < 3
    val r2 = out(1)
    assert(r2.getAs[Long]("n_kept") == 3L && !r2.getAs[Boolean]("page_kept")) // '{'
    val r3 = out(2)
    assert(r3.getAs[Long]("n_kept") == 4L && !r3.getAs[Boolean]("page_kept")) // lorem
    val r4 = out(3)
    assert(r4.getAs[Long]("n_kept") == 1L && !r4.getAs[Boolean]("page_kept"))
    // a clean page passes everything
    val ok = TextAnalysis.c4LineFilters(
      Seq((9L, "first long line is good.\nsecond long line is good.\nthird long line is good."))
        .toDF("doc_id", "text"), "doc_id", "text").head()
    assert(ok.getAs[Boolean]("page_kept") && ok.getAs[Long]("n_kept") == 3L)
  }

  test("gateAblation counts fails and unique kills per gate on a hand fixture") {
    // lang gate needs stopword profile hits; quality/tokens/gopher are
    // arithmetic — craft docs so each gate's role is known
    val good = ("the quick brown fox and the lazy dog walked to the " +
      "market in the morning and it was a fine day for everyone there ") * 3
    val docs = Seq(
      (1L, good),                         // passes everything
      (2L, good),                         // passes everything
      (3L, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk jj ii hh gg " * 4)
      // no stopwords → lang 'und' (fails lang) AND 0 stop hits (fails gopher)
    ).toDF("doc_id", "text")
    val rep = graft.ops.Profile.gateAblation(docs, "text")
      .collect().map(r => r.getAs[String]("gate") ->
        (r.getAs[Long]("n_fail"), r.getAs[Long]("n_unique_kill"),
          r.getAs[Long]("pass_all"), r.getAs[Long]("n_docs"))).toMap
    assert(rep("lang")._1 == 1L)
    assert(rep("lang")._2 == 0L) // doc 3 also fails gopher → not unique
    assert(rep("gopher")._1 == 1L && rep("gopher")._2 == 0L)
    assert(rep.values.forall { case (_, _, passAll, nDocs) =>
      passAll == 2L && nDocs == 3L })
    // invariant: unique kills never exceed fails
    assert(rep.values.forall { case (f, u, _, _) => u <= f })
  }
}
