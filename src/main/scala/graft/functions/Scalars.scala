package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure scalar column builders re-expressing the reference's row-level
  * semantics (SURVEY.md §2.3). All are Catalyst built-in compositions —
  * codegen'd, no UDFs — so they stay inside WholeStageCodegen at scale.
  */
object Scalars {

  /** Subscriber-count → per-channel download quota step function.
    * Semantics of `data_pipeline.py:520-531` (10/20/30/40/50/60 at
    * 10k/30k/50k/100k/200k subscriber tier edges).
    */
  def quotaForSubs(nSubs: Column): Column =
    when(nSubs < 10000L, 10)
      .when(nSubs < 30000L, 20)
      .when(nSubs < 50000L, 30)
      .when(nSubs < 100000L, 40)
      .when(nSubs < 200000L, 50)
      .otherwise(60)
      .cast("long")

  /** Duration-trim rule of `data_pipeline.py:609-620`: keep whole clip
    * under 3 min; above 30min+4min+2s keep [120, dur−120]; otherwise
    * strip one minute from each end. Returns struct<ss, to> (seconds).
    */
  def trimBounds(durS: Column): Column =
    when(durS < 180L, struct(lit(0L).as("ss"), durS.cast("long").as("to")))
      .when(
        durS > 2042L,
        struct(lit(120L).as("ss"), (durS - 120L).cast("long").as("to"))
      )
      .otherwise(struct(lit(60L).as("ss"), (durS - 60L).cast("long").as("to")))

  /** Embed-URL construction of `data_pipeline.py:660`: sample offsets at
    * 16 kHz floor/ceil to whole seconds inside a watch-embed URL.
    */
  def embedUrl(videoId: Column, startSamp: Column, endSamp: Column): Column =
    concat(
      lit("https://www.youtube.com/embed/"),
      videoId.cast("string"),
      lit("?start="),
      floor(startSamp / 16000.0d).cast("long").cast("string"),
      lit("&end="),
      ceil(endSamp / 16000.0d).cast("long").cast("string")
    )

  /** Video watch URL from id (`data_pipeline.py:602`). */
  def watchUrl(videoId: Column): Column =
    concat(lit("https://www.youtube.com/watch?v="), videoId.cast("string"))

  /** First email-looking token in free text, else "N/A" — the inferred
    * behavior of the snapshot-missing `yt_channel_list.get_emails_from_
    * description` (SURVEY.md §0; called from `starngage_crawler.ipynb`
    * c15). regexp_extract returns "" on no-match in both Spark and
    * DuckDB, so the N/A defaulting goes through nullif+coalesce.
    */
  def extractEmail(text: Column): Column = {
    val rx = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    coalesce(nullif(regexp_extract(text, rx, 0), lit("")), lit("N/A"))
  }

  /** Handle normalization: strip a leading '@' (`starngage_crawler.ipynb`
    * c4/c8).
    */
  def stripHandle(handle: Column): Column =
    regexp_replace(handle, "^@", "")

  /** Error-string flattening before JSONL write (`filter_channel.py:62`):
    * newlines and tabs become spaces so one record stays one line.
    */
  def flattenError(err: Column): Column =
    regexp_replace(err, "[\\n\\t]", " ")

  /** Speech-score label weights of `audio_ac.py:53-79`: positive for the
    * four speech labels, negative for the three noise labels, 0 else.
    * The reference calls it a probability; it is a signed score and can
    * go negative (SURVEY §7.4 divergence note) — we name it a score.
    */
  val positiveLabels: Seq[String] = Seq(
    "Narration, monologue",
    "Female speech, woman speaking",
    "Male speech, man speaking",
    "Speech"
  )
  val negativeLabels: Seq[String] = Seq("Conversation", "Music", "Sound effect")

  def labelWeight(label: Column): Column =
    when(label.isin(positiveLabels: _*), 1.0d)
      .when(label.isin(negativeLabels: _*), -1.0d)
      .otherwise(0.0d)

  /** Signed speech score over one segment's classifier output
    * `array<struct<label:string, score:double>>` — a pure array
    * reduction (A7/G5), no shuffle.
    */
  def speechScore(preds: Column): Column =
    aggregate(
      preds,
      lit(0.0d),
      (acc, p) => acc + labelWeight(p.getField("label")) * p.getField("score")
    )

  /** 16 kHz sample-unit conversions (`data_pipeline.py:660,677-678`). */
  def samplesToSeconds(samples: Column): Column = samples / 16000.0d
  def samplesToHours(samples: Column): Column = samples / 16000.0d / 3600.0d
}
