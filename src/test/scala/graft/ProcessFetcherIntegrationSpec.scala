package graft

import graft.signal.Signal
import org.scalatest.Tag

/** Opt-in integration tag: select with
  *   sbt "testOnly graft.ProcessFetcherIntegrationSpec -- -n graft.Integration"
  * or exclude with `-- -l graft.Integration`. The suite is self-
  * contained (local /bin/sh doubles standing in for yt-dlp), so it
  * also runs in the default `sbt test` sweep.
  */
object IntegrationTag extends Tag("graft.Integration")

/** The REAL subprocess fetch path composed through the WHOLE pipeline:
  * `Pipeline.run` → playlist argv ({url}) → per-video fetch argv
  * ({id}, {out}) → typed statuses → DLQ/skip-log surfaces. The sh
  * doubles replay yt-dlp's observable behaviors (reference error
  * taxonomy: yt_download.py:82-136): a premiere, an offline video, an
  * exit-0 run that writes nothing, a HANG (child must be killed by the
  * fetcher's timeout, not by the test), and a healthy download — plus
  * a channel whose listing is all premieres, which must die as a
  * TOO_MANY_PREMIERES channel abort, not an exception.
  */
class ProcessFetcherIntegrationSpec extends SparkTestBase {

  private def mkScript(dir: java.nio.file.Path, name: String, body: String): String = {
    val p = dir.resolve(name)
    java.nio.file.Files.writeString(p, s"#!/bin/sh\n$body\n")
    p.toFile.setExecutable(true)
    p.toString
  }

  test("composed Pipeline.run over the subprocess fetcher: full error " +
    "taxonomy, timeout kill, and channel-abort DLQ", IntegrationTag) {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftit")
    val work = java.nio.file.Files.createTempDirectory("graftitwork").toString
    // speech-like source the healthy fetch copies into place
    val n = 6 * 16000
    val wavArr = Array.tabulate(n) { i =>
      val t = math.sin(0.19634954 * (i + 1)); t * t * t * 0.5
    }
    val src = dir.resolve("src.wav")
    java.nio.file.Files.write(src, Signal.wavEncode(wavArr, 16000))
    // {url} argv face: the per-channel listing branches on the URL it
    // was handed — errors first so the taxonomy is exercised before
    // the quota can declare the channel DONE
    val lister = mkScript(dir, "list.sh",
      """case "$1" in
        |  *allpremieres*)
        |    echo pv_premiere_a; echo pv_premiere_b; echo pv_premiere_c
        |    echo pv_premiere_d; echo pv_premiere_e;;
        |  *) echo pv_premiere_1; echo pv_offline_1; echo pv_empty_1
        |     echo pv_hang_1; echo pv_ok_1;;
        |esac""".stripMargin)
    // {id}/{out} argv face: yt-dlp's observable behaviors by id
    val fetcherSh = mkScript(dir, "fetch.sh",
      s"""case "$$1" in
         |  *premiere*) echo "ERROR: this live event is a Premiere" >&2; exit 1;;
         |  *offline*)  echo "ERROR: video unavailable/offline" >&2; exit 1;;
         |  *empty*)    exit 0;;
         |  *hang*)     sleep 30;;
         |  *) cp "$src" "$$2";;
         |esac""".stripMargin)
    val channels = Seq(
      ("ok", "UC_taxonomy", 20L, 1000L, 5000L, "@t", null: String, "https://yt/c/mixed"),
      ("bad", "UC_premieres", 20L, 1000L, 5000L, "@b", null: String, "https://yt/c/allpremieres")
    ).toDF("title", "id", "n_videos", "n_views", "n_subs", "custom_url", "email", "url")

    val t0 = System.nanoTime()
    val out = graft.pipeline.Pipeline.run(
      spark, channels,
      ingested = Seq.empty[String].toDF("video_id"),
      fetcher = graft.io.ProcessAudioFetcher(
        Seq(lister, "{url}"), Seq(fetcherSh, "{id}", "{out}"), work,
        timeoutSec = 2L),
      classifier = graft.pipeline.LinearProbeClassifier(),
      cfg = graft.pipeline.Pipeline.Config(minSnr = 5.0, minSpeechScore = 0.0,
        minVideoDurationS = 4, shortVideoS = 2))

    // DLQ surface (K3-shape): every failure mode is a TYPED row
    val errs = out.videoErrors
      .select("video_id", "status").as[(String, String)].collect().toMap
    assert(errs("pv_premiere_1") == "PREMIERE_VIDEO")
    assert(errs("pv_offline_1") == "OFFLINE_VIDEO")
    assert(errs("pv_empty_1") == "NO_OUTPUT_FILE")
    assert(errs("pv_hang_1") == "NO_OUTPUT_FILE") // killed by timeout, typed not thrown
    val wallS = (System.nanoTime() - t0) / 1e9
    assert(wallS < 25.0,
      s"pipeline took ${wallS}s — the hanging fetch was not killed at the 2s timeout")

    // the healthy download still produced scored segments on the SAME
    // channel the four failures hit
    val segs = out.segments.collect()
    assert(segs.nonEmpty && segs.map(_.getAs[String]("video_id")).toSet == Set("pv_ok_1"))

    // skip-log surface (K7-shape): the all-premieres channel aborts
    // with the reference's counter reason; the mixed channel does not
    val skips = out.skips.collect().map(s => s.channel_id -> s.reason).toMap
    assert(skips.get("UC_premieres").contains("TOO_MANY_PREMIERES"))
    assert(!skips.contains("UC_taxonomy"))
    // and the aborting channel still logged its typed per-video errors
    val badErrs = out.videoErrors
      .filter($"channel_id" === "UC_premieres").count()
    assert(badErrs == 4L, s"expected 4 premiere errors before the abort, got $badErrs")
    out.unpersist()
  }
}
