package graft

import graft.multimodal._
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def payloads = Seq(
    (1L, "abcdefghij"),   // 10 chars → 3 frames of 3 chars
    (2L, "xy")            // shorter than n → one whole frame
  ).toDF("id", "text")
    .withColumn("payload", encode($"text", "UTF-8").cast("binary"))

  test("sampleFrames: 1→N generator with whole-payload fallback") {
    val got = Multimodal
      .sampleFrames(payloads, "id", "payload", StubFrameSampler, n = 3)
      .withColumn("s", decode($"frame", "UTF-8"))
      .select("id", "frame_idx", "ts_ms", "s")
      .orderBy("id", "frame_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, "abc"), (1L, 1L, 1000L, "def"), (1L, 2L, 2000L, "ghi"),
      (2L, 0L, 0L, "xy")
    ))
  }

  test("transformPayloads: resize stub bounds output length, passthrough when small") {
    val got = Multimodal
      .transformPayloads(payloads, "id", "payload", StubResize(4))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("out_len")))
    assert(got.toSeq == Seq((1L, 4L), (2L, 2L)))
    // deterministic: same bytes in → same bytes out
    val again = Multimodal
      .transformPayloads(payloads, "id", "payload", StubResize(4))
      .orderBy("id").select("payload_out").collect().map(_.getAs[Array[Byte]](0).toSeq)
    val first = Multimodal
      .transformPayloads(payloads, "id", "payload", StubResize(4))
      .orderBy("id").select("payload_out").collect().map(_.getAs[Array[Byte]](0).toSeq)
    assert(again.toSeq == first.toSeq)
  }
}
