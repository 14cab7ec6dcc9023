package graft.schema

import org.apache.spark.sql.types._

/** Explicit schemas for every reference data surface (SURVEY §1.5):
  * the reference is schema-on-read / stringly-typed; we declare types
  * once and let permissive mode + a corrupt-record column absorb dirty
  * rows instead of per-line try/except.
  */
object Schemas {

  /** Channel catalog CSV (yt_channel_list_result_merge.ipynb c3 column
    * order; "N/A" sentinels become real nulls via nullValue).
    */
  val channels: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("id", StringType, nullable = false),
    StructField("n_videos", LongType),
    StructField("n_views", LongType),
    StructField("n_subs", LongType),
    StructField("custom_url", StringType),
    StructField("email", StringType),
    StructField("url", StringType)
  ))

  /** Per-channel probe quality JSONL (filter_channel.py:49-54): nested
    * per-segment SNR array and per-segment top-k classifier labels.
    */
  val channelQuality: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("snrss", ArrayType(DoubleType)),
    StructField(
      "acss",
      ArrayType(ArrayType(StructType(Seq(
        StructField("label", StringType),
        StructField("score", DoubleType)
      ))))
    )
  ))

  /** Error side-channel (filter_channel.py:59-63). */
  val errorRecord: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("error", StringType)
  ))

  /** Channel search results (test2.py:25-33). */
  val channelSearch: StructType = StructType(Seq(
    StructField("channel_id", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("language", StringType),
    StructField("published_at", TimestampType)
  ))

  /** Exploded playlist row (FIXTURES.md §3). */
  val videos: StructType = StructType(Seq(
    StructField("channel_id", StringType),
    StructField("video_id", StringType),
    StructField("playlist_pos", IntegerType),
    StructField("duration_s", LongType),
    StructField("status", StringType) // OK | PREMIERE_VIDEO | OFFLINE_VIDEO | NO_OUTPUT_FILE
  ))

  /** Post-VAD scored segment row (FIXTURES.md §4); vad start/end in
    * 16 kHz sample units as in the reference.
    */
  val segments: StructType = StructType(Seq(
    StructField("channel_id", StringType),
    StructField("video_id", StringType),
    StructField("seg_idx", IntegerType),
    StructField(
      "vad",
      StructType(Seq(StructField("start", LongType), StructField("end", LongType)))
    ),
    StructField("samples", ArrayType(DoubleType)),
    StructField("snr", DoubleType),
    StructField("speech_score", DoubleType),
    StructField("selected", BooleanType)
  ))
}

// Typed views for Dataset[T] paths (encoders derive from these).
final case class Channel(
    title: String, id: String, n_videos: Option[Long], n_views: Option[Long],
    n_subs: Option[Long], custom_url: Option[String], email: Option[String],
    url: String)

final case class LabelScore(label: String, score: Double)

final case class ChannelQuality(
    url: String, snrss: Seq[Double], acss: Seq[Seq[LabelScore]])

final case class VideoRow(
    channel_id: String, video_id: String, playlist_pos: Int,
    duration_s: Long, status: String)

final case class VadSpan(start: Long, end: Long)

final case class SegmentRow(
    channel_id: String, video_id: String, seg_idx: Int, vad: VadSpan,
    samples: Seq[Double], snr: Double, speech_score: Double, selected: Boolean)
