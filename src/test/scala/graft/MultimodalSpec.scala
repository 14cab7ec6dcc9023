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

  test("GIF fixture round-trips: frame count, dims, per-frame pixel colors exact") {
    for (id <- Seq(0L, 3L, 7L, 11L)) {
      val k = (2 + id % 5).toInt
      val w = (8 + id % 13).toInt
      val h = (8 + id % 11).toInt
      val gif = ImageCodec.fixtureGif(id)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(gif))
      val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
      reader.setInput(iis)
      assert(reader.getNumImages(true) == k, s"id=$id")
      for (f <- 0 until k) {
        val img = reader.read(f)
        assert(img.getWidth == w && img.getHeight == h)
        def c(m: Long, a: Long) = Math.floorMod(id * m + a * f, 256L).toInt
        val px = img.getRGB(w / 2, h / 2)
        assert(((px >> 16) & 0xff) == c(7, 29), s"id=$id f=$f r")
        assert(((px >> 8) & 0xff) == c(11, 31), s"id=$id f=$f g")
        assert((px & 0xff) == c(13, 37), s"id=$id f=$f b")
      }
      reader.dispose(); iis.close()
    }
  }

  test("GifFrameSampler samples the even schedule with 100ms timestamps") {
    val id = 13L // k = 2 + 13%5 = 5 frames
    val got = GifFrameSampler.sampleBatch(Seq(ImageCodec.fixtureGif(id)), 3).head
    assert(got.map(_._1) == Seq(0, 1, 3)) // floor(i*5/3)
    assert(got.map(_._2) == Seq(0L, 100L, 300L))
    got.foreach { case (f, _, png) =>
      val img = ImageCodec.decode(png).get
      assert(img.getWidth == (8 + id % 13).toInt)
      def c(m: Long, a: Long) = Math.floorMod(id * m + a * f, 256L).toInt
      val px = img.getRGB(0, 0)
      assert(((px >> 16) & 0xff) == c(7, 29) &&
        ((px >> 8) & 0xff) == c(11, 31) && (px & 0xff) == c(13, 37))
    }
    // k=2 case: fewer than n distinct frames
    val short = GifFrameSampler.sampleBatch(Seq(ImageCodec.fixtureGif(5L)), 3).head
    assert(short.map(_._1) == Seq(0, 1)) // k = 2+5%5 = 2
    // non-GIF payload falls back to one whole-payload frame
    val junk = Array[Byte](9, 9, 9)
    assert(GifFrameSampler.sampleBatch(Seq(junk), 3).head.map(_._1) == Seq(0))
  }

  test("GifFrameSampler timestamps are cumulative for variable-delay GIFs") {
    // id=13 → k=5 frames; delays 5,20,10,40,30 cs = 50,200,100,400,300 ms
    // frame start times: 0, 50, 250, 350, 750 ms
    val gif = ImageCodec.fixtureGif(13L, delaysCs = Seq(5, 20, 10, 40, 30))
    val got = GifFrameSampler.sampleBatch(Seq(gif), 5).head
    assert(got.map(_._1) == Seq(0, 1, 2, 3, 4))
    assert(got.map(_._2) == Seq(0L, 50L, 250L, 350L, 750L))
    // sampled subset keeps absolute start times, not index×own-delay
    val sub = GifFrameSampler.sampleBatch(Seq(gif), 3).head
    assert(sub.map(_._1) == Seq(0, 1, 3))
    assert(sub.map(_._2) == Seq(0L, 50L, 350L))
  }

  test("MP4 box walker parses fixtures, v1 mvhd, largesize, and rejects junk") {
    for (id <- Seq(0L, 7L, 123L)) {
      val info = VideoMeta.parseMp4(VideoMeta.fixtureMp4(id)).get
      val ts = 600L * (1 + id % 5)
      val dur = ts * (1 + id % 120) + id % ts
      assert(info.brand == "isom")
      assert(info.timescale == ts && info.duration == dur)
      assert(info.durationMs == dur * 1000L / ts)
    }
    // hand-built v1 mvhd (64-bit duration) after a largesize ftyp
    val v1 = {
      val b = new Array[Byte](16 + 8 + 8 + 120)
      def u32(o: Int, v: Long): Unit = {
        b(o) = (v >>> 24).toByte; b(o + 1) = (v >>> 16).toByte
        b(o + 2) = (v >>> 8).toByte; b(o + 3) = v.toByte
      }
      def t(o: Int, s: String): Unit =
        System.arraycopy(s.getBytes("ISO-8859-1"), 0, b, o, 4)
      u32(0, 1L); t(4, "ftyp"); u32(8, 0L); u32(12, 24L) // largesize=24
      t(16, "isom"); u32(20, 0L)
      val m = 24
      u32(m, (8 + 120).toLong); t(m + 4, "moov")
      u32(m + 8, 120L); t(m + 12, "mvhd")
      b(m + 16) = 1 // version 1
      u32(m + 36, 90000L)           // timescale at 8 hdr + 4 + 16
      u32(m + 40, 1L); u32(m + 44, 500L) // duration u64 = 2^32 + 500
      b
    }
    val i1 = VideoMeta.parseMp4(v1).get
    assert(i1.timescale == 90000L && i1.duration == (1L << 32) + 500L)
    assert(VideoMeta.parseMp4(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)).isEmpty)
    assert(VideoMeta.parseMp4("not a container at all".getBytes).isEmpty)
    // the fixture's leading bytes satisfy the mp4 sniff heuristic
    val fx = VideoMeta.fixtureMp4(3L)
    assert(fx(3) == 0x18.toByte && fx(0) == 0 && fx(1) == 0 && fx(2) == 0)
  }

  test("videoTrack expands stts/stsc/stsz/stco into exact frame refs") {
    for (id <- Seq(0L, 5L, 11L, 42L)) {
      val bytes = VideoMeta.fixtureMp4Track(id)
      val t = VideoMeta.videoTrack(bytes).get
      val mts = 1000L * (1 + id % 3)
      val k = (5 + id % 4).toInt
      val r1 = (k + 1) / 2
      assert(t.timescale == mts)
      assert(t.frames.length == k)
      t.frames.zipWithIndex.foreach { case (f, j) =>
        assert(f.idx == j)
        assert(f.size == 16 + (id + j) % 8)
        val expectDts = math.min(j, r1) * (mts / 10) +
          math.max(0, j - r1) * (mts / 5)
        assert(f.dts == expectDts, s"id=$id j=$j dts=${f.dts} want=$expectDts")
        // content at the chunk-addressed range matches the recipe —
        // proves the stsc/stco walk lands on the written bytes, across
        // the 3:(k-3) two-chunk split
        (0 until f.size.toInt).foreach { i =>
          val want = (65 + Math.floorMod(id * 31 + j * 7 + i, 26L)).toByte
          assert(bytes((f.offset + i).toInt) == want)
        }
      }
      // frames are contiguous within each chunk, split 3 : k-3
      assert(t.frames(1).offset == t.frames(0).offset + t.frames(0).size)
      assert(t.frames(3).offset > t.frames(2).offset + t.frames(2).size - 1)
    }
    // the plain mvhd-only fixture has no track → None, and the parseMp4
    // walker still reads the track-bearing fixture's movie header
    assert(VideoMeta.videoTrack(VideoMeta.fixtureMp4(9L)).isEmpty)
    assert(VideoMeta.parseMp4(VideoMeta.fixtureMp4Track(9L)).get.timescale == 600L)
  }

  test("videoTrack rejects corrupted sample tables instead of allocating") {
    // a valid track fixture whose stsz sample_count is vandalized to
    // 2^31-ish: the box-bounds guard must yield None, not a multi-GB
    // Array.tabulate from one scan task
    val bytes = VideoMeta.fixtureMp4Track(3L)
    // locate the stsz box: scan for the 4cc and poke its sample_count
    var i = 0
    var stsz = -1
    while (i < bytes.length - 4 && stsz < 0) {
      if (bytes(i) == 's' && bytes(i + 1) == 't' && bytes(i + 2) == 's' &&
        bytes(i + 3) == 'z') stsz = i - 4
      i += 1
    }
    assert(stsz > 0)
    val bad = bytes.clone()
    val countOff = stsz + 16 // 8 hdr + 4 verflags + 4 sample_size
    bad(countOff) = 0x7f.toByte; bad(countOff + 1) = 0xff.toByte
    bad(countOff + 2) = 0xff.toByte; bad(countOff + 3) = 0xff.toByte
    assert(VideoMeta.videoTrack(bad).isEmpty)
    // and the sampler degrades to the whole-payload fallback
    val out = Mp4FrameSampler.sampleBatch(Seq(bad), 3)
    assert(out.head.length == 1 && out.head.head._3.sameElements(bad))
    // uniform-stsz variant: sample_size != 0 declares NO entry table,
    // so the box-bounds guard can't catch a vandalized count — the
    // file-derived bound (k frames of >=1 byte can't exceed the
    // payload) must reject it instead of allocating ~2^31 longs
    val badU = bytes.clone()
    val sizeOff = stsz + 12 // 8 hdr + 4 verflags
    badU(sizeOff + 3) = 1   // uniform sample_size = 1
    badU(countOff) = 0x7f.toByte; badU(countOff + 1) = 0xff.toByte
    badU(countOff + 2) = 0xff.toByte; badU(countOff + 3) = 0xff.toByte
    assert(VideoMeta.videoTrack(badU).isEmpty)
    // the pristine fixture still parses
    assert(VideoMeta.videoTrack(bytes).isDefined)
  }

  test("Mp4FrameSampler slices coded frames; non-MP4 falls back whole") {
    val id = 7L
    val bytes = VideoMeta.fixtureMp4Track(id)
    val k = (5 + id % 4).toInt
    val out = Mp4FrameSampler.sampleBatch(Seq(bytes, "plain text".getBytes), 3)
    val frames = out.head
    assert(frames.map(_._1) == (0 until 3).map(i => i * k / 3).distinct)
    frames.foreach { case (j, ts, fb) =>
      assert(fb.length == (16 + (id + j) % 8).toInt)
      fb.zipWithIndex.foreach { case (b, i) =>
        assert(b == (65 + Math.floorMod(id * 31 + j * 7 + i, 26L)).toByte)
      }
      val r1 = (k + 1) / 2
      assert(ts == math.min(j, r1) * 100L + math.max(0, j - r1) * 200L)
    }
    // fallback: whole payload as one frame
    assert(out(1) == Seq((0, 0L, "plain text".getBytes.toSeq)) ||
      (out(1).length == 1 && out(1).head._3.sameElements("plain text".getBytes)))
  }
}
