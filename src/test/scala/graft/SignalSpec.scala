package graft

import graft.signal.Signal
import graft.signal.Signal.VadParams
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Test => ScTest}

/** Labeled-fixture separation tests reproducing the snr_dev.ipynb
  * methodology (SURVEY §5): synthetic clean vs noise signals must be
  * thresholdably separated; plus codec/VAD/resample unit behavior.
  */
class SignalSpec extends AnyFunSuite {

  private def tone(n: Int, peaky: Boolean, noise: Double): Array[Double] =
    Array.tabulate(n) { i =>
      val t = math.sin(0.19634954 * (i + 1))
      val s = if (peaky) t * t * t else t
      s + noise * math.sin(78.233 * (i + 1))
    }

  test("wadaSnr separates clean from noise (snr_dev methodology)") {
    val clean = Signal.wadaSnr(tone(16000, peaky = true, noise = 1e-4))
    val noisy = Signal.wadaSnr(tone(16000, peaky = true, noise = 0.5))
    val pureNoise = Signal.wadaSnr(Array.tabulate(16000)(i => math.sin(78.233 * (i + 1))))
    assert(clean > 20.0, s"clean=$clean")
    assert(noisy < clean)
    assert(pureNoise < 0.0, s"pureNoise=$pureNoise")
  }

  test("wadaSnr clamps and handles degenerate input") {
    assert(Signal.wadaSnr(Array.emptyDoubleArray) == -20.0)
    assert(Signal.wadaSnr(Array.fill(100)(0.0)) == -20.0)
    // sine+noise mix sits near the low end of the scale
    assert(Signal.wadaSnr(tone(8000, peaky = false, noise = 1.0)) <= 5.0)
  }

  test("wadaSnr is amplitude-invariant (peak normalization)") {
    val w = tone(4000, peaky = true, noise = 0.01)
    val a = Signal.wadaSnr(w)
    val b = Signal.wadaSnr(w.map(_ * 7.5))
    assert(math.abs(a - b) < 1e-9)
  }

  test("WAV PCM16 codec roundtrip") {
    val w = tone(1234, peaky = false, noise = 0.1).map(_ * 0.8)
    val bytes = Signal.wavEncode(w, 16000)
    val (sr, back) = Signal.wavDecode(bytes)
    assert(sr == 16000)
    assert(back.length == w.length)
    val maxErr = w.zip(back).map { case (x, y) => math.abs(x - y) }.max
    assert(maxErr < 1.0 / 32000, s"maxErr=$maxErr") // 16-bit quantization
  }

  test("wavDecode rejects junk") {
    intercept[IllegalArgumentException](Signal.wavDecode(Array.fill(100)(1.toByte)))
  }

  test("energyVad finds the two bursts in silence+burst fixture (FIXTURES §5)") {
    val sr = 16000
    // silence 0.5s | tone 1s | gap 200ms | tone 2s | silence 0.5s
    val sig = Array.fill(sr / 2)(0.0) ++
      Array.tabulate(sr)(i => 0.3 * math.sin(2 * math.Pi * 440 * i / sr)) ++
      Array.fill(sr / 5)(0.0) ++
      Array.tabulate(2 * sr)(i => 0.3 * math.sin(2 * math.Pi * 440 * i / sr)) ++
      Array.fill(sr / 2)(0.0)
    val segs = Signal.energyVad(sig)
    assert(segs.length == 2, s"got $segs")
    assert(math.abs(segs.head.start - sr / 2) < sr / 10)
    assert(math.abs(segs.head.end - 3 * sr / 2) < sr / 10)
  }

  test("energyVad merges short silences and drops short speech") {
    val sr = 16000
    // 100ms gap (< min_silence 150ms) must merge into one segment
    val sig = Array.tabulate(sr)(i => 0.3 * math.sin(2 * math.Pi * 440 * i / sr)) ++
      Array.fill(sr / 10)(0.0) ++
      Array.tabulate(sr)(i => 0.3 * math.sin(2 * math.Pi * 440 * i / sr))
    assert(Signal.energyVad(sig).length == 1)
    // 200ms burst (< min_speech 500ms) must drop
    val short = Array.fill(sr)(0.0) ++
      Array.tabulate(sr / 5)(i => 0.3 * math.sin(2 * math.Pi * 440 * i / sr)) ++
      Array.fill(sr)(0.0)
    assert(Signal.energyVad(short).isEmpty)
  }

  test("energyVad splits over-long speech at max_speech_duration (audio_vad.py:24)") {
    val sr = 16000
    val sig = Array.tabulate(40 * sr)(i => 0.3 * math.sin(2 * math.Pi * 440 * i / sr))
    val segs = Signal.energyVad(sig, VadParams(maxSpeechS = 15.0))
    assert(segs.length >= 3)
    assert(segs.forall(s => s.length <= 15 * sr + 2 * 480))
  }

  test("resampleLinear 48k→16k preserves duration and shape") {
    val sr = 48000
    val sig = Array.tabulate(sr)(i => math.sin(2 * math.Pi * 100 * i / sr))
    val out = Signal.resampleLinear(sig, 48000, 16000)
    assert(out.length == 16000)
    // low-frequency content survives linear interpolation
    val ref = Array.tabulate(16000)(i => math.sin(2 * math.Pi * 100 * i / 16000.0))
    val err = out.zip(ref).map { case (a, b) => math.abs(a - b) }.max
    assert(err < 0.01, s"err=$err")
  }

  test("property: wadaSnr total energy split is consistent (scalacheck)") {
    val gen = for {
      n <- Gen.choose(100, 2000)
      noise <- Gen.choose(0.0001, 0.9)
    } yield tone(n, peaky = true, noise = noise)
    val prop = forAll(gen) { w =>
      val snr = Signal.wadaSnr(w)
      snr >= -21.0 && snr <= 101.0 // clamped range (±1 for energy-split log)
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(50), prop)
    assert(res.passed, res.status.toString)
  }
}
