package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Connector-side operators for the API sources (S5/S6/O5): the
  * batching that `starngage_crawler.ipynb` c4 does with a driver-side
  * `range(0, n, 50)` loop runs here as partition-local `grouped(50)` —
  * each executor batches its own ids, no collect, no driver loop.
  */
object Connectors {

  private val infoSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("n_videos", LongType),
    StructField("n_views", LongType),
    StructField("n_subs", LongType),
    StructField("custom_url", StringType)
  ))

  /** S6 — channels.list by id, 50 per request, executor-side. Ids not
    * returned by the API are simply absent (the J3 set-difference
    * `handles − found` is then a left_anti downstream).
    */
  def lookupChannels(ids: DataFrame, idCol: String, api: ChannelApi): DataFrame = {
    val spark = ids.sparkSession
    val rdd = ids
      .select(idCol)
      .rdd
      .mapPartitions { rows =>
        rows.map(_.getString(0)).grouped(50).flatMap { batch =>
          api.lookup(batch).map { c =>
            Row(c.id, c.title, c.description, c.n_videos.orNull,
              c.n_views.orNull, c.n_subs.orNull, c.custom_url.orNull)
          }
        }
      }
    spark.createDataFrame(rdd, infoSchema)
  }

  /** S5 — keyword search (≤50 results per call, test2.py:11-18): a
    * driver-side fetch is correct here — one keyword, one request —
    * landing as a DataFrame for everything downstream.
    */
  def searchChannels(spark: SparkSession, api: ChannelApi, keyword: String,
      maxResults: Int = 50): DataFrame = {
    val rows = api.search(keyword, maxResults).map { c =>
      Row(c.id, c.title, c.description, c.n_videos.orNull,
        c.n_views.orNull, c.n_subs.orNull, c.custom_url.orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), infoSchema)
  }

  /** F6 — 48 kHz format gate (yt_download.py:31-71): parse a
    * yt-dlp `-F`-style format table; true iff an `audio only` line
    * mentions 48000Hz/48k. The reference retries the probe once when
    * no audio lines appear — model that as `coalesce(try1, try2)`:
    * pass both probe outputs, the first with audio lines wins.
    */
  def has48kAudio(formatTable: String): Option[Boolean] = {
    if (formatTable == null) return None
    val audioLines = formatTable.linesIterator
      .filter(_.contains("audio only"))
      .toSeq
    if (audioLines.isEmpty) None // no audio lines → inconclusive, retry
    else Some(audioLines.exists(l => l.contains("48000Hz") || l.contains("48k")))
  }

  def has48kAudioWithRetry(probe1: String, probe2: => String): Boolean =
    has48kAudio(probe1).orElse(has48kAudio(probe2)).getOrElse(false)
}
