package graft.meta

import graft.functions.Scalars
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A5/K4 — nested channel-meta assembly (data_pipeline.py:661-676):
  * scored segments → per-video ordered list → per-channel
  * map<video_id, array<segment>>, plus the "selected" projection
  * {idx, url, start, end}. Two keyed aggregations, both partitioned by
  * channel — matching the pipeline's natural partitioning so the second
  * groupBy reuses the first shuffle's layout.
  */
object ChannelMeta {

  /** Segment struct carried in the "all" meta (idx zero-padded as in
    * audio_vad.py:60; embed url as in data_pipeline.py:660).
    */
  private def segStruct: Column = struct(
    format_string("%08d", col("seg_idx")).as("idx"),
    Scalars.embedUrl(col("video_id"), col("vad.start"), col("vad.end")).as("url"),
    col("selected"),
    col("vad"),
    col("snr"),
    col("speech_score")
  )

  /** channels ⨝-free meta build: returns one row per channel_id with
    * `videos: map<video_id, array<struct>>` and duration rollups (A3,
    * with the reference's end−start sign bug fixed — SURVEY §2.6 A3).
    */
  def build(segments: DataFrame, selectedOnly: Boolean): DataFrame = {
    val base = if (selectedOnly) segments.filter(col("selected")) else segments
    val perVideo = base
      .groupBy("channel_id", "video_id")
      .agg(
        sort_array(collect_list(struct(col("seg_idx"), segStruct.as("seg"))))
          .as("ordered"),
        sum(col("vad.end") - col("vad.start")).as("video_samples")
      )
      .select(
        col("channel_id"),
        col("video_id"),
        transform(col("ordered"), _.getField("seg")).as("segs"),
        col("video_samples")
      )
    perVideo
      .groupBy("channel_id")
      .agg(
        map_from_entries(
          sort_array(collect_list(struct(col("video_id"), col("segs"))))
        ).as("videos"),
        Scalars.samplesToHours(sum(col("video_samples"))).as("total_duration_h"),
        count(lit(1)).as("n_videos_with_segments")
      )
  }

  /** The selected-variant projection (data_pipeline.py:671-676):
    * {idx, url, start, end} only.
    */
  def buildSelected(segments: DataFrame): DataFrame = {
    val slim = segments
      .filter(col("selected"))
      .select(
        col("channel_id"),
        col("video_id"),
        col("seg_idx"),
        struct(
          format_string("%08d", col("seg_idx")).as("idx"),
          Scalars.embedUrl(col("video_id"), col("vad.start"), col("vad.end")).as("url"),
          col("vad.start").as("start"),
          col("vad.end").as("end")
        ).as("seg")
      )
    slim
      .groupBy("channel_id", "video_id")
      .agg(
        sort_array(collect_list(struct(col("seg_idx"), col("seg")))).as("ordered")
      )
      .select(
        col("channel_id"),
        col("video_id"),
        transform(col("ordered"), _.getField("seg")).as("segs")
      )
      .groupBy("channel_id")
      .agg(
        map_from_entries(
          sort_array(collect_list(struct(col("video_id"), col("segs"))))
        ).as("videos")
      )
  }

  /** Meta as one JSON document per channel (K4). */
  def toJsonDocs(meta: DataFrame): DataFrame =
    meta.select(
      col("channel_id"),
      to_json(struct(meta.columns.filter(_ != "channel_id").map(col): _*)).as("meta_json")
    )
}
