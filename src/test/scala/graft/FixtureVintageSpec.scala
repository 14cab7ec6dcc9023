package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Pins the fixture-vintage adapter in Graft.table: the driver has
  * shipped `events.ts` as parquet TIMESTAMP(NANOS) (readable only as
  * long nanos under `nanosAsLong`) and as TIMESTAMP(MICROS) NTZ
  * (2026-08-13 regen). Whatever the vintage, downstream code must see
  * the SAME long epoch nanos — this spec feeds all four post-read
  * shapes (long nanos, TIMESTAMP_NTZ micros, instant TIMESTAMP
  * micros, instant TIMESTAMP(MILLIS)) through Graft.table and asserts
  * identical values, so the next driver regeneration is a no-op
  * whichever physical type it picks.
  */
class FixtureVintageSpec extends SparkTestBase {

  test("Graft.table yields identical epoch nanos for every events.ts vintage") {
    import spark.implicits._
    val micros = Seq(1700000000000000L, 1700000123456789L, 1699999999999999L)
    val root = Files.createTempDirectory("graftvintage")

    // vintage A: long nanos — the shape TIMESTAMP(NANOS) + nanosAsLong
    // produces at read time (parquet cannot round-trip NANOS from Spark,
    // so the post-read long IS the faithful stand-in)
    micros.zipWithIndex.map { case (m, i) => (i.toLong, m * 1000L) }
      .toDF("event_id", "ts")
      .write.parquet(root.resolve("a/events.parquet").toString)
    // vintage B: TIMESTAMP_NTZ micros — the current driver fixtures
    micros.zipWithIndex.map { case (m, i) => (i.toLong, m) }
      .toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.parquet(root.resolve("b/events.parquet").toString)
    // vintage C: instant TIMESTAMP micros (isAdjustedToUTC=true)
    micros.zipWithIndex.map { case (m, i) => (i.toLong, m) }
      .toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.parquet(root.resolve("c/events.parquet").toString)
    // vintage D: TIMESTAMP(MILLIS) isAdjustedToUTC=true — the third
    // plausible regeneration target (physical INT64 millis). Values
    // must be millis-representable, so D gets its own truncated set
    // and its own expectation below.
    val millis = micros.map(m => m / 1000L)
    val prevOutType = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try
      millis.zipWithIndex.map { case (ms, i) => (i.toLong, ms) }
        .toDF("event_id", "ms")
        .select(col("event_id"), timestamp_millis(col("ms")).as("ts"))
        .write.parquet(root.resolve("d/events.parquet").toString)
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevOutType)

    def read(sub: String): Seq[(Long, Long)] = {
      val df = graft.core.Graft.table(spark, root.resolve(sub).toString, "events")
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.LongType, s"$sub: ts not normalized to long")
      df.select(col("event_id"), col("ts")).as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
    }
    val a = read("a")
    assert(a == read("b"), "NTZ vintage diverged from long-nanos vintage")
    assert(a == read("c"), "instant vintage diverged from long-nanos vintage")
    assert(a.map(_._2) == micros.map(_ * 1000L),
      "normalized nanos do not equal the source micros x1000")
    assert(read("d").map(_._2) == millis.map(_ * 1000000L),
      "MILLIS vintage: normalized nanos do not equal the source millis x1e6")

    // and tsCol round-trips the normalized nanos back to micros exactly
    val rt = graft.core.Graft
      .table(spark, root.resolve("b").toString, "events")
      .select(unix_micros(graft.core.Graft.tsCol(col("ts"))).as("us"))
      .as[Long].collect().sorted.toSeq
    assert(rt == micros.sorted)
  }
}
