package graft

import graft.streaming.Incremental
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}

/** The T1 rollup must produce identical results whether the event log
  * arrives as a batch table or as a file stream — Structured
  * Streaming's core guarantee, exercised on the real testdata.
  */
class StreamBatchParitySpec extends SparkTestBase {

  test("windowed rollup: stream face equals batch face on sf0.001 events") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = "/root/testdata/sf0.001/events.parquet"
    val dir = Files.createTempDirectory("graftevents")
    Files.copy(Paths.get(src), dir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val batch = spark.read.parquet(src)
    val schema = batch.schema
    def prep(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ets", timestamp_micros((col("ts") / 1000L).cast("long")))

    val batchResult = prep(batch)
      .groupBy(window(col("ets"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"),
        round(col("total"), 6).as("total"))
      .orderBy("ws", "event_type")
      .collect()
      .toSeq

    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val agg = Incremental.windowedRollup(prep(stream), "ets", "10 minutes", "5 minutes")
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("parity_rollup")
      .start()
    q.processAllAvailable()
    val streamResult = spark
      .sql("""SELECT window.start AS ws, event_type, n, round(total, 6) AS total
              FROM parity_rollup ORDER BY ws, event_type""")
      .collect()
      .toSeq
    q.stop()

    assert(streamResult.size == batchResult.size)
    assert(streamResult == batchResult)
  }
}
