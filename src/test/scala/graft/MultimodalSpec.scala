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

  // ---------------- REAL javax.imageio codec ----------------

  test("fixturePng round-trips: decoded dims and channel sums match the recipe") {
    for (id <- Seq(0L, 7L, 123L, 9999L)) {
      val w = (8 + id % 25).toInt; val h = (8 + id % 17).toInt
      val left = w / 2; val right = w - left
      def c(m: Long) = ((id * m) % 256).toInt
      val f = ImageIoDecoder.decodeBatch(Seq(ImageCodec.fixturePng(id))).head
      assert(f(0) == w.toFloat && f(1) == h.toFloat && f(2) == (w * h).toFloat)
      assert(f(3) == (h * (left * c(3) + right * c(11))).toFloat, s"sum_r id=$id")
      assert(f(4) == (h * (left * c(5) + right * c(13))).toFloat, s"sum_g id=$id")
      assert(f(5) == (h * (left * c(7) + right * c(17))).toFloat, s"sum_b id=$id")
      // histogram bins are fractions of n_px and sum to ~1
      val histSum = (8 until 16).map(f(_).toDouble).sum
      assert(math.abs(histSum - 1.0) < 1e-5)
    }
  }

  test("ImageIoDecoder falls back to the stub for bytes the JDK cannot decode") {
    val garbage = Array[Byte](1, 2, 3, 4, 5)
    val got = ImageIoDecoder.decodeBatch(Seq(garbage)).head
    val stub = StubImageDecoder.decodeBatch(Seq(garbage)).head.take(ImageIoDecoder.featureDim)
    assert(got.toSeq == stub.toSeq)
  }

  test("ImageIoHalveResize halves real images and stub-strides garbage") {
    val png = ImageCodec.fixturePng(42L) // 24x16
    val out = ImageIoHalveResize().transformBatch(Seq(png)).head
    val img = ImageCodec.decode(out).get
    assert(img.getWidth == 12 && img.getHeight == 8)
    val garbage = Array.tabulate[Byte](200)(_.toByte)
    val fb = ImageIoHalveResize(fallbackLen = 64).transformBatch(Seq(garbage)).head
    assert(fb.length == 64)
  }

  test("real decode path works distributed through extractFeatures") {
    val df = Seq(1L, 2L, 3L).toDF("id")
      .withColumn("payload", udf((i: Long) => ImageCodec.fixturePng(i)).apply($"id"))
    val rows = Multimodal
      .extractFeatures(df, "id", "payload", ImageIoDecoder, batchSize = 2)
      .orderBy("id")
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val id = r.getLong(0)
      val f = r.getSeq[Float](1)
      assert(f(0) == (8 + id % 25).toFloat && f(1) == (8 + id % 17).toFloat)
    }
  }
}
