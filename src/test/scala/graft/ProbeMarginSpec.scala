package graft

import graft.functions.Scalars

/** The epsilon-margin demonstration that closes q_probe_quality's oracle
  * gap argument (QueryDef.scala libm rule #9): the query's only float-
  * dependent outputs are THRESHOLD DECISIONS (snr > 12.0, speechScore >
  * 0.5). Cross-libm (JVM Math.log/sin vs any other correctly-rounded
  * libm) discrepancies are a few ulps — relative error < 1e-12 on these
  * magnitudes. This spec enumerates EVERY segment the q_probe_quality
  * seed population can produce at any fixture SF up to sf1 (custkey
  * multiples of 499 in [0, 150000) — the url set is a pure function of
  * the custkey value, not of parquet contents) and proves no segment's
  * SNR or speech score lands within 1e-3 of its threshold. Hence the
  * n_snr_ok / n_ac_ok counts are invariant under any conceivable libm
  * perturbation, and the rows-only check on q_probe_quality is as
  * strong as an oracle for the thresholded counts.
  */
class ProbeMarginSpec extends SparkTestBase {

  private def speechScoreScalar(preds: Seq[graft.schema.LabelScore]): Double =
    preds.foldLeft(0.0) { (acc, p) =>
      val w =
        if (Scalars.positiveLabels.contains(p.label)) 1.0
        else if (Scalars.negativeLabels.contains(p.label)) -1.0
        else 0.0
      acc + w * p.score
    }

  test("no probe segment lands within 1e-3 of the 12.0 dB / 0.5 thresholds") {
    import spark.implicits._
    // q_probe_quality's seed population at every SF up to sf1
    val urls = (0 until 150000 by 499).map(k => s"https://yt/c/$k").toDF("url")
    val out = graft.pipeline.Probe.run(
      spark, urls, new graft.io.FakeAudioFetcher(2),
      graft.pipeline.FakeClassifier, maxPerChannel = 2, probeCutS = 6)
    val rows = out.quality.collect()
    out.unpersist()
    assert(rows.nonEmpty)

    val snrs = rows.flatMap(_.snrss)
    val scores = rows.flatMap(_.acss).map(speechScoreScalar)
    assert(snrs.nonEmpty && scores.nonEmpty)

    val snrMargin = snrs.map(v => math.abs(v - 12.0)).min
    val scoreMargin = scores.map(v => math.abs(v - 0.5)).min
    info(f"segments=${snrs.length} snrMargin=$snrMargin%.6f scoreMargin=$scoreMargin%.6f")
    assert(snrMargin > 1e-3,
      s"a segment SNR sits within 1e-3 of the 12.0 threshold ($snrMargin)")
    assert(scoreMargin > 1e-3,
      s"a speech score sits within 1e-3 of the 0.5 threshold ($scoreMargin)")
  }
}
