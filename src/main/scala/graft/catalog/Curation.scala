package graft.catalog

import graft.io.{ChannelApi, Connectors}
import graft.functions.Scalars
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The three notebook analytics chains (SURVEY §3.3) as library
  * compositions over the channel schemas — the catalog-curation
  * workflows a reference user runs today.
  */
object Curation {

  /** §3.3a — merge/dedup/filter (`yt_channel_list_result_merge.ipynb`):
    * multi-CSV union (the multi-path S1 scan already unions) →
    * full-row dedup → subscriber admission → fixed 8-column projection.
    */
  val catalogColumns: Seq[String] =
    Seq("title", "id", "n_videos", "n_views", "n_subs", "custom_url", "email", "url")

  def mergeDedupFilter(channels: DataFrame, minSubs: Long = 10000L): DataFrame =
    channels
      .dropDuplicates()
      .filter(col("n_subs") > minSubs)
      .select(catalogColumns.map(col): _*)

  /** §3.3b — quality join (`yt_channel_list_quality_merge.ipynb`):
    * per-row array stats over the probe relation → global-max min-max
    * score → inner join on url (quality side is aggregated → broadcast)
    * → catalog projection + score → sort desc. The registered
    * q_flagship_quality_join is this chain over the testdata analogs.
    */
  def qualityJoin(
      catalog: DataFrame,
      quality: DataFrame,
      minSnr: Double = 20.0,
      minSpeechScore: Double = 0.9
  ): DataFrame = {
    val stats = graft.pipeline.Probe.qualityStats(quality, minSnr, minSpeechScore)
      .select("url", "n_total", "n_snr_ok", "n_ac_ok")
    val maxes = stats.agg(
      max(col("n_snr_ok")).as("mx_snr"),
      max(col("n_ac_ok")).as("mx_ac")
    )
    val scored = stats
      .crossJoin(broadcast(maxes))
      .withColumn(
        "score",
        col("n_snr_ok").cast("double") / greatest(col("mx_snr"), lit(1L)).cast("double") +
          col("n_ac_ok").cast("double") / greatest(col("mx_ac"), lit(1L)).cast("double")
      )
      .drop("mx_snr", "mx_ac")
    catalog
      .join(broadcast(scored), Seq("url"), "inner")
      .orderBy(col("score").desc, col("id").asc)
  }

  /** §3.3c — crawler enrich (`starngage_crawler.ipynb`): handle list →
    * strip '@' → split raw channel ids (24 chars) from handles →
    * batched channels.list lookup (50/request, executor-side) →
    * not-found set difference → email extraction → catalog projection.
    */
  def crawlerEnrich(spark: SparkSession, handles: DataFrame, api: ChannelApi)
      : (DataFrame, DataFrame) = {
    val cleaned = handles
      .select(Scalars.stripHandle(trim(col("handle"))).as("id_or_handle"))
      .filter(length(col("id_or_handle")) > 0)
      .dropDuplicates()
    val found = Connectors
      .lookupChannels(cleaned.withColumnRenamed("id_or_handle", "id"), "id", api)
      .withColumn("email", Scalars.extractEmail(col("description")))
      .withColumn("url", concat(lit("https://www.youtube.com/channel/"), col("id")))
      .withColumn("title", coalesce(col("title"), col("id")))
      .select(catalogColumns.map(col): _*)
    val notFound = cleaned.join(
      found.select(col("id").as("id_or_handle")),
      Seq("id_or_handle"),
      "left_anti"
    )
    (found, notFound)
  }
}
