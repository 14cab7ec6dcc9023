package graft

import graft.functions.Scalars
import org.apache.spark.sql.functions._

/** FIXTURES.md §1/§2 boundary cases for the pure scalar operators. */
class ScalarsSpec extends SparkTestBase {
  import spark.implicits._

  test("quotaForSubs hits every tier edge (data_pipeline.py:520-531)") {
    val df = Seq(9999L, 10000L, 29999L, 30000L, 49999L, 50000L, 99999L,
      100000L, 199999L, 200000L, 5000000L)
      .toDF("n_subs")
      .withColumn("q", Scalars.quotaForSubs($"n_subs"))
    val got = df.select("q").as[Long].collect().toSeq
    assert(got == Seq(10L, 20L, 20L, 30L, 30L, 40L, 40L, 50L, 50L, 60L, 60L))
  }

  test("trimBounds branch edges 179/180/2042/2043 (data_pipeline.py:609-620)") {
    val df = Seq(100L, 179L, 180L, 2042L, 2043L)
      .toDF("dur")
      .withColumn("b", Scalars.trimBounds($"dur"))
      .select($"b.ss", $"b.to")
      .as[(Long, Long)]
    assert(
      df.collect().toSeq ==
        Seq((0L, 100L), (0L, 179L), (60L, 120L), (60L, 1982L), (120L, 1923L))
    )
  }

  test("speechScore applies reference label weights (audio_ac.py:53-79)") {
    val preds = Seq(
      (Seq(("Speech", 0.9), ("Music", 0.1))),
      (Seq(("Narration, monologue", 0.5), ("Conversation", 0.2), ("Dog bark", 0.3))),
      (Seq.empty[(String, Double)])
    ).toDF("raw")
      .withColumn(
        "preds",
        transform($"raw", p => struct(p.getField("_1").as("label"), p.getField("_2").as("score")))
      )
      .withColumn("s", Scalars.speechScore($"preds"))
      .select("s")
      .as[Double]
      .collect()
    assert(math.abs(preds(0) - 0.8) < 1e-12)
    assert(math.abs(preds(1) - 0.3) < 1e-12)
    assert(preds(2) == 0.0)
  }

  test("extractEmail first match with N/A default") {
    val got = Seq("contact me a@b.com or c@d.org", "no email here", null)
      .toDF("t")
      .withColumn("e", Scalars.extractEmail($"t"))
      .select("e")
      .as[String]
      .collect()
      .toSeq
    assert(got == Seq("a@b.com", "N/A", "N/A"))
  }

  test("embedUrl floors start and ceils end to seconds (data_pipeline.py:660)") {
    val got = Seq((16001L, 31999L))
      .toDF("s", "e")
      .withColumn("u", Scalars.embedUrl(lit("vid1"), $"s", $"e"))
      .select("u")
      .as[String]
      .head()
    assert(got == "https://www.youtube.com/embed/vid1?start=1&end=2")
  }

  test("flattenError keeps one record one line (filter_channel.py:62)") {
    val got = Seq("multi\nline\terror")
      .toDF("t")
      .select(Scalars.flattenError($"t"))
      .as[String]
      .head()
    assert(got == "multi line error")
  }
}
