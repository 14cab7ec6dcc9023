package graft

import graft.io.{Connectors, FakeChannelApi}
import graft.signal.Signal

class ConnectorsSpec extends SparkTestBase {
  import spark.implicits._

  test("lookupChannels batches 50 per request executor-side (S6/O5)") {
    val ids = (1 to 120).map(i => s"UC$i").toDF("id")
    val out = Connectors.lookupChannels(ids, "id", FakeChannelApi)
    val n = out.count()
    assert(n > 0 && n <= 120) // some ids are "not found" by the fake
    assert(out.columns.contains("n_subs"))
  }

  test("searchChannels lands as a typed DataFrame (S5)") {
    val out = Connectors.searchChannels(spark, FakeChannelApi, "vietnamese audiobook", 10)
    assert(out.count() == 10)
  }

  test("48k format gate parses yt-dlp-style tables with retry (F6)") {
    val with48k =
      """ID  EXT   RESOLUTION FPS │ FILESIZE   TBR PROTO │ VCODEC  VBR ACODEC
        |249 webm  audio only      │  1.91MiB    52 https │ audio only  opus 48k
        |250 webm  audio only      │  2.54MiB    69 https │ audio only  opus 48000Hz
        |134 mp4   640x360     30  │ 11.25MiB   246 https │ avc1.4d401e""".stripMargin
    val no48k =
      """140 m4a   audio only      │  3.31MiB   129 https │ audio only  mp4a 44100Hz""".stripMargin
    val noAudio = "134 mp4 640x360 30 | video stuff only"
    assert(Connectors.has48kAudio(with48k).contains(true))
    assert(Connectors.has48kAudio(no48k).contains(false))
    assert(Connectors.has48kAudio(noAudio).isEmpty)
    // retry: first probe inconclusive, second has audio lines
    assert(Connectors.has48kAudioWithRetry(noAudio, with48k))
    assert(!Connectors.has48kAudioWithRetry(noAudio, noAudio))
  }

  test("alternate SNR estimators separate clean from noise (G3, snr_dev methodology)") {
    def sig(noise: Double) = Array.tabulate(16000) { i =>
      val t = math.sin(2 * math.Pi * 440 * i / 16000.0)
      (if (i / 1600 % 2 == 0) t * 0.5 else 0.001 * t) + noise * math.sin(78.233 * i)
    }
    val cleanF = Signal.frameSnr(sig(0.001))
    val noisyF = Signal.frameSnr(sig(0.3))
    assert(cleanF > noisyF, s"frameSnr: $cleanF vs $noisyF")
    val cleanR = Signal.rmsThresholdSnr(sig(0.001))
    val noisyR = Signal.rmsThresholdSnr(sig(0.3))
    assert(cleanR > noisyR, s"rmsThresholdSnr: $cleanR vs $noisyR")
    // degenerate input → 0, not NaN (divergence from reference noted)
    assert(Signal.frameSnr(Array.fill(100)(0.0)) == 0.0)
    assert(Signal.rmsThresholdSnr(Array.emptyDoubleArray) == 0.0)
  }

  // ---- process-spawning fetcher (S8's real subprocess shape) --------

  private def mkScript(dir: java.nio.file.Path, name: String, body: String): String = {
    val p = dir.resolve(name)
    java.nio.file.Files.writeString(p, s"#!/bin/sh\n$body\n")
    p.toFile.setExecutable(true)
    p.toString
  }

  test("ProcessAudioFetcher: subprocess list + fetch with typed statuses (S8)") {
    val dir = java.nio.file.Files.createTempDirectory("graftproc")
    val work = java.nio.file.Files.createTempDirectory("graftprocwork").toString
    // a source wav the "downloader" copies into place
    val wav = Signal.wavEncode(
      Array.tabulate(16000)(i => 0.3 * math.sin(0.2 * i)), 16000)
    val src = dir.resolve("src.wav")
    java.nio.file.Files.write(src, wav)
    val lister = mkScript(dir, "list.sh",
      """echo vid_alpha
        |echo vid_premiere_x
        |echo vid_offline_y
        |echo "  "
        |echo vid_beta""".stripMargin)
    val fetcher = mkScript(dir, "fetch.sh",
      s"""case "$$1" in
         |  *premiere*) echo "ERROR: this live event is a Premiere" >&2; exit 1;;
         |  *offline*)  echo "ERROR: video unavailable/offline" >&2; exit 1;;
         |  *empty*)    exit 0;;
         |  *) echo fetched >> "${dir.resolve("fetch_count")}"; cp "$src" "$$2";;
         |esac""".stripMargin)
    val f = graft.io.ProcessAudioFetcher(
      listCmd = Seq(lister, "{url}"),
      fetchCmd = Seq(fetcher, "{id}", "{out}"),
      workDir = work, timeoutSec = 30L)

    assert(f.listVideoIds("https://yt/c/42") ==
      Seq("vid_alpha", "vid_premiere_x", "vid_offline_y", "vid_beta"))

    val (st1, bytes1) = f.fetchAudio("vid_alpha")
    assert(st1 == "OK" && bytes1.sameElements(wav))
    val (sr, decoded) = Signal.wavDecode(bytes1)
    assert(sr == 16000 && decoded.length == 16000)

    // typed statuses from stderr patterns, never exceptions
    assert(f.fetchAudio("vid_premiere_x")._1 == "PREMIERE_VIDEO")
    assert(f.fetchAudio("vid_offline_y")._1 == "OFFLINE_VIDEO")
    assert(f.fetchAudio("vid_empty_z")._1 == "NO_OUTPUT_FILE")

    // idempotency: a second fetch re-reads the existing output and
    // does NOT spawn the downloader again (task-retry safety)
    val countBefore = java.nio.file.Files.readAllLines(dir.resolve("fetch_count")).size
    val (st2, bytes2) = f.fetchAudio("vid_alpha")
    assert(st2 == "OK" && bytes2.sameElements(wav))
    val countAfter = java.nio.file.Files.readAllLines(dir.resolve("fetch_count")).size
    assert(countAfter == countBefore, "re-fetch spawned the downloader again")

    // a fetch that dies mid-write (partial bytes, non-zero exit) must
    // NOT leave a file the resume shortcut would accept as completed:
    // the download goes to a temp path and is only renamed into place
    // after exit 0 + size check, so the retry re-fetches for real
    val partial = mkScript(dir, "partial.sh",
      """head -c 4096 /dev/zero > "$2"; exit 1""")
    val fp = graft.io.ProcessAudioFetcher(
      listCmd = Seq(lister, "{url}"),
      fetchCmd = Seq(partial, "{id}", "{out}"),
      workDir = work, timeoutSec = 30L)
    assert(fp.fetchAudio("vid_killed")._1 == "NO_OUTPUT_FILE")
    // retry with a HEALTHY fetcher: gets the full wav, not 4096 zeros
    val fr = graft.io.ProcessAudioFetcher(
      listCmd = Seq(lister, "{url}"),
      fetchCmd = Seq(fetcher, "{id}", "{out}"),
      workDir = work, timeoutSec = 30L)
    val (st3, bytes3) = fr.fetchAudio("vid_killed")
    assert(st3 == "OK" && bytes3.sameElements(wav),
      "partial write from a failed fetch leaked into the resume path")
  }

  test("Pipeline.run drives the process-spawning fetcher end to end (S7/S8/G4)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graftproc2")
    val work = java.nio.file.Files.createTempDirectory("graftproc2work").toString
    // speech-like bursts so the VAD/classifier chain has something real
    val n = 6 * 16000
    val wavArr = Array.tabulate(n) { i =>
      val t = math.sin(0.19634954 * (i + 1)); t * t * t * 0.5
    }
    val src = dir.resolve("src.wav")
    java.nio.file.Files.write(src, Signal.wavEncode(wavArr, 16000))
    val lister = mkScript(dir, "list.sh", "echo pv_1\necho pv_2\necho pv_3")
    val fetcherSh = mkScript(dir, "fetch.sh", s"""cp "$src" "$$2"""")
    val channels = Seq(
      ("t", "UC_proc", 20L, 1000L, 5000L, "@p", null: String, "https://yt/c/proc")
    ).toDF("title", "id", "n_videos", "n_views", "n_subs", "custom_url", "email", "url")
    val out = graft.pipeline.Pipeline.run(
      spark, channels,
      ingested = Seq.empty[String].toDF("video_id"),
      fetcher = graft.io.ProcessAudioFetcher(
        Seq(lister, "{url}"), Seq(fetcherSh, "{id}", "{out}"), work, 60L),
      classifier = graft.pipeline.LinearProbeClassifier(),
      cfg = graft.pipeline.Pipeline.Config(minSnr = 5.0, minSpeechScore = 0.0,
        minVideoDurationS = 4, shortVideoS = 2))
    val segs = out.segments.collect()
    assert(segs.nonEmpty, "no segments from the subprocess-fetched audio")
    assert(segs.map(_.getAs[String]("video_id")).toSet == Set("pv_1", "pv_2", "pv_3"))
    out.unpersist()
  }
}
