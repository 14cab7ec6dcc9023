package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image codec on the JDK's javax.imageio — no external
  * dependencies. PNG/JPEG/BMP/GIF decode to pixels; formats the JDK
  * lacks (video containers, webp, ...) fall back to the clearly-marked
  * stub behind the same [[MediaDecoder]] trait.
  *
  * Reference analog: the pipeline's audio classifier consumes REAL
  * decoded waveforms (audio_ac.py:43-50); this gives the image path
  * the same property — decode errors, dimension bugs, or channel-order
  * mistakes surface in the DuckDB-checked q_mm_features oracle, which
  * predicts width/height/channel sums arithmetically from the fixture
  * recipe.
  */
object ImageCodec {

  // Executors must never touch a display or scratch temp files:
  // BufferedImage/Graphics2D are headless-safe, and ImageIO's default
  // disk cache would do a tmp-file round-trip per decode.
  private lazy val init: Unit = {
    System.setProperty("java.awt.headless", "true")
    ImageIO.setUseCache(false)
  }

  def decode(bytes: Array[Byte]): Option[BufferedImage] = {
    init
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    init
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic two-band PNG fixture: dimensions and the two fill
    * colors are pure functions of `id`, so an oracle can predict the
    * decoded width/height/per-channel sums without decoding anything.
    * Layout: the left floor(w/2) pixel columns are color A, the rest
    * color B.
    *
    *   w  = 8 + id % 25          h  = 8 + id % 17
    *   A  = (3id, 5id, 7id)   % 256
    *   B  = (11id, 13id, 17id) % 256
    */
  def fixturePng(id: Long): Array[Byte] = {
    val w = (8 + Math.floorMod(id, 25L)).toInt
    val h = (8 + Math.floorMod(id, 17L)).toInt
    def c(m: Long) = Math.floorMod(id * m, 256L).toInt
    val a = (c(3), c(5), c(7))
    val b = (c(11), c(13), c(17))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val left = w / 2
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, bl) = if (x < left) a else b
        img.setRGB(x, y, (r << 16) | (g << 8) | bl)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** Deterministic ANIMATED GIF fixture: frame count, dimensions, and
    * each frame's solid fill color are pure functions of `id`, so an
    * oracle predicts the sampled-frame schedule and dimensions without
    * decoding. Every frame carries a GraphicControlExtension with
    * delayTime = 10 cs (100 ms).
    *
    *   k = 2 + id % 5 frames,  w = 8 + id % 13,  h = 8 + id % 11,
    *   frame f color = ((7id+29f) % 256, (11id+31f) % 256, (13id+37f) % 256)
    *
    * Frames are TYPE_BYTE_INDEXED with an explicit palette holding the
    * exact fill color, so the GIF round-trip is lossless (no writer
    * quantization).
    *
    * `delaysCs` overrides the per-frame delay (centiseconds, frame f
    * gets delaysCs(f % delaysCs.length)) to build VARIABLE-delay GIFs
    * for timestamp tests; empty = the constant 10 cs default.
    */
  def fixtureGif(
      id: Long,
      delaysCs: Seq[Int] = Nil,
      /** frame-count override (default: the id-derived 2..6) — for
        * adversarial many-frame payloads in DegenerateInputSpec
        */
      nFrames: Option[Int] = None): Array[Byte] = {
    init
    val k = nFrames.getOrElse((2 + Math.floorMod(id, 5L)).toInt)
    val w = (8 + Math.floorMod(id, 13L)).toInt
    val h = (8 + Math.floorMod(id, 11L)).toInt
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < k) {
      def c(m: Long, a: Long) = Math.floorMod(id * m + a * f, 256L).toInt
      val (r, g, b) = (c(7, 29), c(11, 31), c(13, 37))
      val cm = new java.awt.image.IndexColorModel(
        8, 2,
        Array(r.toByte, 0.toByte),
        Array(g.toByte, 0.toByte),
        Array(b.toByte, 0.toByte))
      val img =
        new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
      // raster defaults to index 0 = the fill color; nothing to draw
      val meta = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img), null)
      val fmt = meta.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
      val root = meta.getAsTree(fmt)
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      val gce = {
        var n = root.getFirstChild
        while (n != null && n.getNodeName != "GraphicControlExtension")
          n = n.getNextSibling
        if (n != null) n.asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        else {
          val created =
            new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
          root.appendChild(created)
          created
        }
      }
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime",
        if (delaysCs.isEmpty) "10"
        else delaysCs(f % delaysCs.length).toString)
      gce.setAttribute("transparentColorIndex", "0")
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
      f += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }
}

/** REAL frame sampler for animated GIFs via javax.imageio: decodes the
  * frame sequence, evenly samples up to n distinct frame indices
  * (floor(i·k/n) for i < n), and re-encodes each sampled frame as PNG.
  * ts_ms = the cumulative sum of the PRECEDING frames'
  * GraphicControlExtension delays (default 100 ms when absent) — the
  * instant frame fi appears on screen, correct for variable-delay
  * GIFs, and equal to fi × delay for constant-delay ones (which is
  * what the arithmetic oracle predicts). Frames are read as stored — no
  * inter-frame composition, which matches the keyframe-sampling
  * use-case (and the fixture writes full frames). Non-GIF payloads
  * fall back to [[StubFrameSampler]]'s whole-payload frame so a mixed
  * column keeps flowing.
  */
object GifFrameSampler extends FrameSampler {
  def sampleBatch(
      payloads: Seq[Array[Byte]], n: Int): Seq[Seq[(Int, Long, Array[Byte])]] =
    CappedGifFrameSampler().sampleBatch(payloads, n)
}

/** [[GifFrameSampler]] with the production skew guards — the
  * maxPerBucket pattern applied to payload decode: an adversarial or
  * corrupt payload must not be able to buy unbounded work inside a
  * task.
  *
  *  - `maxBytes`: payloads larger than the cap are never handed to the
  *    codec at all — they come back as the whole-payload stub frame
  *    (0, 0 ms, original bytes), the same degraded-but-flowing row a
  *    non-GIF payload gets.
  *  - `maxFrames`: the frame COUNT pass and the delay-metadata pass
  *    are bounded to the first cap frames (probed incrementally — the
  *    unguarded `getNumImages(true)` walks the entire stream, which is
  *    exactly the cost a million-frame GIF would weaponize); sampling
  *    then schedules inside those first cap frames.
  *
  * Both default None (exact behavior) — the oracle face
  * (q_mm_gif_frames) runs unguarded so its arithmetic frame schedule
  * stays exact; production pipelines set both.
  */
final case class CappedGifFrameSampler(
    maxFrames: Option[Int] = None,
    maxBytes: Option[Int] = None) extends FrameSampler {
  private def gifDelayMs(reader: javax.imageio.ImageReader, fi: Int): Long =
    try {
      val meta = reader.getImageMetadata(fi)
      val root = meta.getAsTree("javax_imageio_gif_image_1.0")
        .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      var n = root.getFirstChild
      var d = 10L
      while (n != null) {
        if (n.getNodeName == "GraphicControlExtension")
          d = n.asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            .getAttribute("delayTime").toLong
        n = n.getNextSibling
      }
      d * 10L // centiseconds → ms
    } catch { case _: Exception => 100L }

  /** Frame count to operate on: the full (whole-stream) count when
    * unguarded, else an incremental probe that touches at most
    * `cap` frames of the stream.
    */
  private def frameCount(reader: javax.imageio.ImageReader): Int =
    maxFrames match {
      case None => reader.getNumImages(true)
      case Some(cap) =>
        var c = 0
        var more = true
        while (more && c < cap) {
          try { reader.getImageMetadata(c); c += 1 }
          catch { case _: IndexOutOfBoundsException => more = false }
        }
        c
    }

  def sampleBatch(
      payloads: Seq[Array[Byte]], n: Int): Seq[Seq[(Int, Long, Array[Byte])]] =
    payloads.map { bytes =>
      if (maxBytes.exists(bytes.length > _)) Seq((0, 0L, bytes))
      else {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) Seq((0, 0L, bytes))
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val k = frameCount(reader)
              if (k <= 0) Seq((0, 0L, bytes))
              else {
                // display time of frame fi = sum of delays of frames
                // 0..fi-1 (one metadata pass; payload decode only for
                // the sampled frames)
                val startMs = new Array[Long](k)
                var fi = 1
                while (fi < k) {
                  startMs(fi) = startMs(fi - 1) + gifDelayMs(reader, fi - 1)
                  fi += 1
                }
                (0 until n).map(i => i * k / n).distinct.map { s =>
                  val img = reader.read(s)
                  (s, startMs(s), ImageCodec.encodePng(img))
                }
              }
            } finally reader.dispose()
          }
        } catch {
          case _: Exception => Seq((0, 0L, bytes))
        } finally iis.close()
      }
    }
}

/** REAL image features via javax.imageio. Layout (featureDim = 16):
  *   0 width, 1 height, 2 n_px, 3 sum_r, 4 sum_g, 5 sum_b   (integers,
  *     exact in float32 up to 2^24 — oracle-checkable),
  *   6 mean integer luminance ((299r+587g+114b)/1000 per px),
  *   7 fraction of dark pixels (luma < 32),
  *   8-15 luminance histogram (8 bins of 32), normalized by n_px.
  * Payloads the JDK cannot decode fall back to [[StubImageDecoder]]
  * (same dim, deterministic) so one column can carry mixed media.
  */
object ImageIoDecoder extends MediaDecoder {
  val featureDim = 16
  def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
    payloads.map { bytes =>
      ImageCodec.decode(bytes) match {
        case None => StubImageDecoder.decodeBatch(Seq(bytes)).head.take(featureDim)
        case Some(img) =>
          val w = img.getWidth; val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L; var sluma = 0L
          val hist = new Array[Long](8)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val px = img.getRGB(x, y)
              val r = (px >> 16) & 0xff; val g = (px >> 8) & 0xff; val b = px & 0xff
              sr += r; sg += g; sb += b
              val luma = (299 * r + 587 * g + 114 * b) / 1000
              sluma += luma
              hist(math.min(7, luma >> 5)) += 1
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toDouble
          val out = new Array[Float](featureDim)
          out(0) = w.toFloat; out(1) = h.toFloat; out(2) = n.toFloat
          out(3) = sr.toFloat; out(4) = sg.toFloat; out(5) = sb.toFloat
          out(6) = (sluma / n).toFloat
          out(7) = (hist(0) / n).toFloat
          var i = 0
          while (i < 8) { out(8 + i) = (hist(i) / n).toFloat; i += 1 }
          out
      }
    }
}

/** REAL resize: bilinear interpolation through Graphics2D, re-encoded
  * as PNG. Target dims are a pure function of the source dims
  * (halving, floor, min 1) so a re-decode of the output is
  * oracle-predictable. Non-decodable payloads fall back to
  * [[StubResize]] byte striding.
  */
final case class ImageIoHalveResize(fallbackLen: Int = 64) extends PayloadTransform {
  def transformBatch(payloads: Seq[Array[Byte]]): Seq[Array[Byte]] =
    payloads.map { bytes =>
      ImageCodec.decode(bytes) match {
        case None => StubResize(fallbackLen).transformBatch(Seq(bytes)).head
        case Some(img) =>
          val ow = math.max(1, img.getWidth / 2)
          val oh = math.max(1, img.getHeight / 2)
          val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, ow, oh, null)
          } finally g.dispose()
          ImageCodec.encodePng(out)
      }
    }
}
