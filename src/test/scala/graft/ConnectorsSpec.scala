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
}
