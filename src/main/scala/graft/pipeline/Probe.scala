package graft.pipeline

import graft.io.AudioFetcher
import graft.schema.{ChannelQuality, LabelScore}
import graft.signal.Signal
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The channel quality-probe pipeline (SURVEY §3.2, `filter_channel.py`):
  * per channel URL, fetch the first ≤maxPerChannel playable videos,
  * middle-cut them, VAD-segment, score every segment with SNR and the
  * classifier, and emit ONE nested quality row
  * {url, snrss: array<double>, acss: array<array<{label,score}>>} —
  * errors go to the DLQ side-channel instead of err.jsonl
  * (filter_channel.py:49-63).
  */
object Probe {

  final case class ProbeError(url: String, error: String)

  /** Concrete sum for Dataset encoding (Either has no encoder). */
  final case class ProbeResult(
      quality: Option[ChannelQuality], error: Option[ProbeError])

  final case class Outputs(
      quality: Dataset[ChannelQuality],
      errors: Dataset[ProbeError],
      /** releases the probe-result cache both branches read from */
      unpersist: () => Unit = () => ())

  def run(
      spark: SparkSession,
      urls: DataFrame, // one `url` column (S3 scan shape)
      fetcher: AudioFetcher,
      classifier: AudioClassifier,
      maxPerChannel: Int = 2,
      probeCutS: Long = 600 // middle 10 minutes (yt_download.py:139-159)
  ): Outputs = {
    import spark.implicits._

    val results: Dataset[ProbeResult] = urls
      .select("url")
      .as[String]
      .map { url =>
        try {
          val vids = fetcher.listVideoIds(url)
          val snrs = Seq.newBuilder[Double]
          val acs = Seq.newBuilder[Seq[LabelScore]]
          var taken = 0
          var idx = 0
          // premiere/offline extends the scan window like the reference
          // (yt_download.py:186-188)
          var maxIdx = maxPerChannel
          while (taken < maxPerChannel && idx < math.min(vids.length, maxIdx)) {
            val (status, bytes) = fetcher.fetchAudio(vids(idx))
            if (status == "OK") {
              val (sr, wav) = Signal.wavDecode(bytes)
              // middle cut: at most probeCutS seconds around the center
              val total = wav.length.toLong
              val want = probeCutS * sr
              val cut =
                if (total <= want) wav
                else {
                  val start = ((total - want) / 2).toInt
                  java.util.Arrays.copyOfRange(wav, start, start + want.toInt)
                }
              val sixteenK = if (sr == 16000) cut else Signal.resampleLinear(cut, sr, 16000)
              val segs = Signal.energyVad(sixteenK)
              val waves = segs.map(s => sixteenK.slice(s.start.toInt, s.end.toInt))
              val preds = classifier.classifyBatch(waves)
              waves.foreach(w => snrs += Signal.wadaSnr(w))
              preds.foreach(p => acs += p)
              taken += 1
            } else {
              maxIdx += 1
            }
            idx += 1
          }
          ProbeResult(Some(ChannelQuality(url, snrs.result(), acs.result())), None)
        } catch {
          case e: Exception =>
            ProbeResult(None, Some(ProbeError(url, Option(e.getMessage).getOrElse(e.getClass.getName))))
        }
      }

    val cached = results.cache()
    Outputs(
      quality = cached.flatMap(_.quality),
      errors = cached.flatMap(_.error),
      unpersist = () => { cached.unpersist(); () }
    )
  }

  /** A1 — the per-row array stats the quality notebook derives from a
    * probe row (yt_channel_list_quality_merge.ipynb c4), as a reusable
    * transform over the nested quality relation.
    */
  def qualityStats(quality: DataFrame, minSnr: Double = 20.0,
      minSpeechScore: Double = 0.9): DataFrame = {
    val speech = graft.functions.Scalars
    quality
      .withColumn("n_total", size(col("snrss")).cast("long"))
      .withColumn(
        "n_snr_ok",
        size(filter(col("snrss"), _ > minSnr)).cast("long")
      )
      .withColumn(
        "n_ac_ok",
        size(filter(col("acss"), p => speech.speechScore(p) > minSpeechScore)).cast("long")
      )
  }
}
