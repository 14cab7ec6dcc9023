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
    // corruption-tolerant: a malformed file becomes a ROW with a
    // decode_error (DLQ-able, K3 style), never a task failure — one
    // truncated upload must not kill a corpus-wide scan job
    val decode = udf { (bytes: Array[Byte]) =>
      try {
        val (sr, samples) = graft.signal.Signal.wavDecode(bytes)
        (sr, samples, null: String)
      } catch {
        case e: Exception =>
          (-1, null: Array[Double],
            Option(e.getMessage).getOrElse(e.getClass.getName))
      }
    }
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", "*.wav")
      .load(pathGlob)
      .select(col("path"), decode(col("content")).as("d"))
      .select(col("path"), col("d._1").as("sample_rate"),
        col("d._2").as("samples"), col("d._3").as("decode_error"))
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

/** PROCESS-SPAWNING fetcher — the reference's actual fetch path (a
  * yt-dlp subprocess per video, yt_download.py:82-136) compiled
  * against the same [[AudioFetcher]] trait the offline fakes
  * implement, so `Pipeline.run` drives it unchanged. Commands are
  * templates executed via ProcessBuilder arg lists (no shell
  * interpolation): `listCmd` takes `{url}` and must print one video id
  * per stdout line; `fetchCmd` takes `{id}`/`{out}` and must write a
  * WAV at `{out}`.
  *
  * Runs INSIDE the executor task (the pipeline calls the trait from
  * its per-channel flatMapGroups), one bounded process per fetch,
  * stdout/stderr drained concurrently (a full pipe would deadlock the
  * child). Failures are TYPED STATUSES, never exceptions — stderr is
  * pattern-matched the way the reference matches yt-dlp's error
  * strings (yt_download.py:121-134): "premiere" → PREMIERE_VIDEO,
  * "offline"/"unavailable" → OFFLINE_VIDEO, anything else (including
  * a timeout or an exit-0 run that wrote nothing) → NO_OUTPUT_FILE.
  *
  * Idempotent per video id (SURVEY §7.4 risk 1): the output path is a
  * pure function of the id and a pre-existing non-empty output
  * short-circuits the spawn, so Spark task retries re-read instead of
  * re-downloading. At cluster scale `workDir` is executor-local
  * scratch — payloads are born in the task and never shuffle.
  */
final case class ProcessAudioFetcher(
    listCmd: Seq[String],
    fetchCmd: Seq[String],
    workDir: String,
    timeoutSec: Long = 600L
) extends AudioFetcher {

  /** (exitCode, stdout, stderr); exit −1 on timeout (child killed). */
  private def exec(cmd: Seq[String]): (Int, String, String) = {
    val pb = new ProcessBuilder(cmd: _*)
    val p = pb.start()
    val out = new java.io.ByteArrayOutputStream()
    val err = new java.io.ByteArrayOutputStream()
    def pump(in: java.io.InputStream, to: java.io.ByteArrayOutputStream) = {
      val t = new Thread(() => {
        val b = new Array[Byte](8192)
        var n = in.read(b)
        while (n >= 0) { to.write(b, 0, n); n = in.read(b) }
      })
      t.setDaemon(true); t.start(); t
    }
    val to = pump(p.getInputStream, out)
    val te = pump(p.getErrorStream, err)
    val done = p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
    if (!done) {
      p.destroyForcibly()
      (-1, "", "timeout")
    } else {
      to.join(5000); te.join(5000)
      (p.exitValue(), out.toString("UTF-8"), err.toString("UTF-8"))
    }
  }

  private def fileFor(videoId: String): java.io.File =
    new java.io.File(workDir, videoId.replaceAll("[^A-Za-z0-9_-]", "_") + ".wav")

  def listVideoIds(channelUrl: String): Seq[String] = {
    val (code, out, _) = exec(listCmd.map(_.replace("{url}", channelUrl)))
    if (code != 0) Seq.empty
    else out.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  def fetchAudio(videoId: String): (String, Array[Byte]) = {
    val f = fileFor(videoId)
    if (f.exists && f.length > 44L) // 44 = RIFF header; shorter is empty
      return ("OK", java.nio.file.Files.readAllBytes(f.toPath))
    // fetch into a temp path and promote with an atomic rename only
    // after exit 0 + size check — a fetch killed mid-write (timeout
    // destroyForcibly, executor loss) must never leave a partial file
    // that the resume shortcut above would hand back as completed
    val tmp = new java.io.File(f.getPath + ".part")
    if (tmp.exists) tmp.delete()
    val (code, _, err) = exec(fetchCmd.map(
      _.replace("{id}", videoId).replace("{out}", tmp.getPath)))
    if (code != 0) {
      tmp.delete()
      val e = err.toLowerCase
      if (e.contains("premiere")) ("PREMIERE_VIDEO", Array.emptyByteArray)
      else if (e.contains("offline") || e.contains("unavailable"))
        ("OFFLINE_VIDEO", Array.emptyByteArray)
      else ("NO_OUTPUT_FILE", Array.emptyByteArray)
    } else if (!tmp.exists || tmp.length <= 44L) {
      tmp.delete()
      ("NO_OUTPUT_FILE", Array.emptyByteArray)
    } else {
      java.nio.file.Files.move(tmp.toPath, f.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      ("OK", java.nio.file.Files.readAllBytes(f.toPath))
    }
  }
}
