package graft.streaming

import graft.io.{Publisher, Retry}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured-Streaming face of the reference's hand-rolled
  * incrementality (SURVEY §2.9): the every-30-videos checkpoint-publish
  * loop becomes foreachBatch with an idempotent publisher; the
  * hardcoded done-set becomes streaming dedup state; the per-channel
  * early-abort counters become flatMapGroupsWithState.
  */
object Incremental {

  /** Event-time tumbling rollup with watermark — works on a streaming
    * or batch DataFrame alike (same plan shape as q_t1_windowed_rollup).
    */
  def windowedRollup(
      events: DataFrame,
      eventTimeCol: String,
      watermarkDelay: String = "10 minutes",
      windowDur: String = "5 minutes"
  ): DataFrame =
    events
      .withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(window(col(eventTimeCol), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  /** T1/T3/K6 — incremental publish: every micro-batch goes through the
    * Publisher with bounded retry (hf.py:35-48's 10×60 s, parameterized);
    * exhausted retries raise so the batch is retried by the engine
    * rather than silently dropped.
    */
  def publishStream(
      stream: DataFrame,
      publisher: Publisher,
      branch: String,
      checkpointDir: String,
      tries: Int = 10,
      sleepMs: Long = 0L
  ): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Retry.withRetry(tries, sleepMs)(publisher.publish(batchId, branch, batch)) match {
          case Right(_) => ()
          case Left(err) =>
            throw new RuntimeException(s"publish failed after $tries tries: $err")
        }
      }
      .start()

  /** T2 — the ingested-id set as streaming state: exact dedup by key
    * with watermark-bounded state instead of a hardcoded 370-entry
    * Python set (data_pipeline.py:27-439).
    */
  def dedupByKey(stream: DataFrame, eventTimeCol: String, keyCols: Seq[String],
      watermarkDelay: String = "1 hour"): DataFrame =
    stream
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** T1+K6+A5 composed: a stream of scored segment rows → selection
    * filter (F3) → per-micro-batch nested channel meta (A5) → retried,
    * idempotent publish. This is the reference's every-30-videos
    * write-meta-and-upload loop (data_pipeline.py:682-696) with the
    * batch boundary supplied by the engine instead of a counter.
    */
  def publishSelectedSegments(
      segments: DataFrame, // streaming, SegmentRow shape
      publisher: Publisher,
      branch: String,
      checkpointDir: String,
      tries: Int = 10,
      sleepMs: Long = 0L
  ): StreamingQuery =
    segments
      .filter(col("selected"))
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val meta = graft.meta.ChannelMeta.buildSelected(batch)
        Retry.withRetry(tries, sleepMs)(
          publisher.publish(batchId, branch, graft.meta.ChannelMeta.toJsonDocs(meta))
        ) match {
          case Right(_) => ()
          case Left(err) =>
            throw new RuntimeException(s"meta publish failed after $tries tries: $err")
        }
      }
      .start()

  /** Streaming face of the text-curation funnel: the per-row stages
    * (language/quality/token gates, PII redaction, chunking) are
    * stateless Column transforms that run identically on a stream or a
    * batch; exact dedup becomes watermark-bounded state keyed by the
    * content digest. Near-dup clustering and sequence packing are
    * corpus-global and stay batch (run them on the accumulated sink —
    * the standard lambda split for curation at scale).
    */
  def curationStream(
      docs: DataFrame, // streaming; (idCol, textCol, eventTimeCol)
      idCol: String,
      textCol: String,
      eventTimeCol: String,
      cfg: graft.text.CurationPipeline.Config = graft.text.CurationPipeline.Config(),
      watermarkDelay: String = "1 hour"
  ): DataFrame = {
    import graft.text.TextAnalysis
    TextAnalysis
      .withGateSignals(docs, textCol)
      .filter(
        col("lang_pred").isin(cfg.allowedLangs: _*) &&
          col("quality") >= cfg.minQuality &&
          col("n_tok") >= cfg.minTokens &&
          graft.text.CurationPipeline.gopherPredicate(col(textCol), cfg)
      )
      .withColumn("content_key", md5(col(textCol)))
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_key")
      .withColumn("clean_text", TextAnalysis.redactPii(col(textCol)))
  }

  /** T4 — per-channel early-abort counters as explicit streaming state:
    * counts premiere/offline statuses per channel; once the budget is
    * exceeded the channel emits an abort record and drops every later
    * video. Batch formulation is Pipeline.run's flatMapGroups; this is
    * the unbounded-stream formulation.
    */
  final case class VideoStatus(channel_id: String, video_id: String, status: String)
  final case class AbortState(premieres: Int, aborted: Boolean)
  final case class Decision(channel_id: String, video_id: String, keep: Boolean, reason: String)

  def earlyAbort(
      videos: Dataset[VideoStatus],
      maxPremieres: Int = 3
  ): Dataset[Decision] = {
    import videos.sparkSession.implicits._
    videos
      .groupByKey(_.channel_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (cid: String, it: Iterator[VideoStatus], state: GroupState[AbortState]) =>
          var st = state.getOption.getOrElse(AbortState(0, aborted = false))
          val out = it.map { v =>
            if (st.aborted) Decision(cid, v.video_id, keep = false, "CHANNEL_ABORTED")
            else if (v.status == "PREMIERE_VIDEO" || v.status == "OFFLINE_VIDEO") {
              st = st.copy(premieres = st.premieres + 1)
              if (st.premieres > maxPremieres) {
                st = st.copy(aborted = true)
                Decision(cid, v.video_id, keep = false, "TOO_MANY_PREMIERES")
              } else Decision(cid, v.video_id, keep = false, v.status)
            } else Decision(cid, v.video_id, keep = true, "OK")
          }.toVector
          state.update(st)
          out.iterator
      }
  }
}
