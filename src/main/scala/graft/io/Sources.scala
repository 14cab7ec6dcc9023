package graft.io

import graft.schema.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan-side operators (SURVEY §2.1). The file-backed scans are real
  * Spark sources with declared schemas; the network-backed ones
  * (YouTube API, yt-dlp, crawler) are traits with deterministic local
  * fakes — external I/O must never look like a relational operator
  * (non-deterministic, side-effecting; SURVEY §2.10).
  */
object Sources {

  /** S1 — channel-catalog CSV scan. Multi-path read subsumes the
    * reference's pd.concat-of-read_csv union; "N/A" becomes null
    * instead of stringly-typed counters.
    */
  def channelsCsv(spark: SparkSession, paths: String*): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", "N/A")
      .option("mode", "PERMISSIVE")
      .schema(Schemas.channels)
      .csv(paths: _*)

  /** S2 — JSONL quality-record scan (JSON-lines is Spark's default). */
  def qualityJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.channelQuality).json(path)

  /** S3 — one-URL-per-line text scan with trim. */
  def urlList(spark: SparkSession, path: String): DataFrame =
    spark.read
      .text(path)
      .select(trim(col("value")).as("url"))
      .filter(length(col("url")) > 0)

  /** S4 — whole-file JSON document array scan. */
  def jsonDocument(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** S9 — WAV file scan: binaryFile source + PCM16 decode into
    * (path, sample_rate, samples). Decode runs task-side; waveforms
    * are born inside their partition and stay there.
    */
  def wavFiles(spark: SparkSession, pathGlob: String): DataFrame = {
    val decode = udf { (bytes: Array[Byte]) =>
      val (sr, samples) = graft.signal.Signal.wavDecode(bytes)
      (sr, samples)
    }
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", "*.wav")
      .load(pathGlob)
      .select(col("path"), decode(col("content")).as("d"))
      .select(col("path"), col("d._1").as("sample_rate"), col("d._2").as("samples"))
  }
}

/** S5/S6 — channel-metadata API (YouTube search / channels.list). The
  * real connector batches 50 ids per request (starngage_crawler c4);
  * the interface takes a whole batch so implementations can amortize.
  */
trait ChannelApi extends Serializable {
  def search(keyword: String, maxResults: Int): Seq[ChannelInfo]
  def lookup(ids: Seq[String]): Seq[ChannelInfo] // ≤50 ids per call
}

final case class ChannelInfo(
    id: String, title: String, description: String, n_videos: Option[Long],
    n_views: Option[Long], n_subs: Option[Long], custom_url: Option[String])

/** S7/S8 — video enumeration + audio fetch. Typed error statuses
  * replace the reference's exception strings (yt_download.py:121-134);
  * fetch is keyed by video id so task retries are idempotent (SURVEY
  * §7.4 risk 1).
  */
trait AudioFetcher extends Serializable {
  def listVideoIds(channelUrl: String): Seq[String]
  /** Returns (status, wavBytes): status OK | PREMIERE_VIDEO |
    * OFFLINE_VIDEO | NO_OUTPUT_FILE; bytes empty unless OK.
    */
  def fetchAudio(videoId: String): (String, Array[Byte])
}

/** Deterministic offline fakes: everything derives from stable hashes
  * of the ids, so any executor (or retry) computes identical data.
  */
object FakeChannelApi extends ChannelApi {
  private def h(s: String): Long = math.abs(s.hashCode.toLong)
  def search(keyword: String, maxResults: Int): Seq[ChannelInfo] =
    (0 until math.min(maxResults, 50)).map { i =>
      val id = f"UC${keyword.hashCode}%08x${i}%06d"
      info(id)
    }
  def lookup(ids: Seq[String]): Seq[ChannelInfo] = {
    require(ids.size <= 50, "channels.list accepts at most 50 ids per call")
    ids.filter(i => h(i) % 13 != 0).map(info) // some ids are "not found"
  }
  private def info(id: String): ChannelInfo = ChannelInfo(
    id = id,
    title = s"channel-$id",
    description = if (h(id) % 3 == 0) s"contact owner-$id@example.com for business" else "no contact",
    n_videos = Some(h(id) % 300),
    n_views = Some(h(id) % 1000000),
    n_subs = Some(h(id) % 250000),
    custom_url = if (h(id) % 2 == 0) Some(s"@handle$id") else None
  )
}

final class FakeAudioFetcher(segmentSeconds: Int = 4) extends AudioFetcher {
  private def h(s: String): Long = math.abs(s.hashCode.toLong)
  private val sr = 16000

  // burst templates computed once per executor — synthesis is then
  // per-sample adds instead of 10^8 Math.sin calls
  @transient private lazy val tone: Array[Double] =
    Array.tabulate(segmentSeconds * sr) { i =>
      val t = math.sin(0.19634954 * (i + 1)); t * t * t
    }
  @transient private lazy val noiseBase: Array[Double] =
    Array.tabulate(segmentSeconds * sr + 8)(i => math.sin(78.233 * (i + 1)))

  def listVideoIds(channelUrl: String): Seq[String] = {
    val n = (h(channelUrl) % 40 + 5).toInt
    (0 until n).map(i => f"v${h(channelUrl)}%010d_$i%03d")
  }

  /** Synthesizes a deterministic WAV per video: alternating speech-like
    * peaky-tone bursts and silences; a hash-derived noise floor makes
    * some videos "clean" (high WADA SNR) and some "noisy".
    */
  def fetchAudio(videoId: String): (String, Array[Byte]) = {
    val k = h(videoId)
    if (k % 17 == 0) return ("PREMIERE_VIDEO", Array.emptyByteArray)
    if (k % 19 == 0) return ("OFFLINE_VIDEO", Array.emptyByteArray)
    if (k % 23 == 0) return ("NO_OUTPUT_FILE", Array.emptyByteArray)
    val noise = 0.0002 * (1 + k % 400) // 0.0002 .. 0.08 → WADA SNR ~28 down to ~8
    val nBursts = (k % 3 + 2).toInt
    val burstLen = segmentSeconds * sr
    val silLen = sr / 2
    val out = new Array[Double](nBursts * (burstLen + silLen))
    var b = 0
    while (b < nBursts) {
      val base = b * (burstLen + silLen)
      var i = 0
      while (i < burstLen) {
        out(base + i) = tone(i) + noise * noiseBase(i + b)
        i += 1
      }
      java.util.Arrays.fill(out, base + burstLen, base + burstLen + silLen, noise * 0.1)
      b += 1
    }
    ("OK", graft.signal.Signal.wavEncode(out, sr))
  }
}
