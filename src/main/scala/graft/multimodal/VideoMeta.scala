package graft.multimodal

/** REAL video-container metadata: an ISO-BMFF (MP4) top-level box
  * walker in pure byte arithmetic (ISO/IEC 14496-12 box grammar —
  * [size u32][type 4cc], size==1 → u64 largesize, size==0 → to EOF;
  * `ftyp` major brand, `moov`→`mvhd` timescale/duration in both v0
  * and v1 layouts). Extracting duration without decoding any frame is
  * the standard first pass over a 100 TB video corpus — the payload
  * never leaves the scan, and the parsed metadata is the only thing
  * that shuffles.
  *
  * Reference analog: the pipeline probes media metadata before any
  * download/decode decision (format gate F6); this is the same
  * probe-before-work shape for video payload columns.
  */
object VideoMeta {

  final case class Mp4Info(brand: String, timescale: Long, duration: Long) {
    def durationMs: Long =
      if (timescale <= 0) -1L else duration * 1000L / timescale
  }

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "ISO-8859-1")

  /** Walk top-level boxes; None when the bytes are not ISO-BMFF. */
  def parseMp4(bytes: Array[Byte]): Option[Mp4Info] = {
    var off = 0L
    var brand: String = null
    var ts = -1L
    var dur = -1L
    val n = bytes.length.toLong
    var sane = true
    while (sane && off + 8 <= n) {
      val o = off.toInt
      var size = u32(bytes, o)
      var hdr = 8
      if (size == 1L && off + 16 <= n) { size = u64(bytes, o + 8); hdr = 16 }
      else if (size == 0L) size = n - off
      if (size < hdr || off + size > n) sane = false
      else {
        fourcc(bytes, o + 4) match {
          case "ftyp" if size >= hdr + 4 =>
            brand = fourcc(bytes, o + hdr)
          case "moov" =>
            var c = off + hdr
            val end = off + size
            while (c + 8 <= end) {
              val ci = c.toInt
              val cs = u32(bytes, ci)
              if (fourcc(bytes, ci + 4) == "mvhd" && c + 12 <= end) {
                val ver = bytes(ci + 8) & 0xff
                if (ver == 1 && c + 40 <= end) {
                  ts = u32(bytes, ci + 28)   // 8 hdr + 4 verflags + 8 + 8
                  dur = u64(bytes, ci + 32)
                } else if (ver == 0 && c + 28 <= end) {
                  ts = u32(bytes, ci + 20)   // 8 hdr + 4 verflags + 4 + 4
                  dur = u32(bytes, ci + 24)
                }
              }
              if (cs < 8) c = end else c += cs
            }
          case _ =>
        }
        off += size
      }
    }
    if (brand != null && ts > 0) Some(Mp4Info(brand, ts, dur)) else None
  }

  // ---- sample tables: REAL per-frame addressing ---------------------

  /** One addressable video sample (frame) from the track's sample
    * tables: decode timestamp in media-timescale ticks, absolute byte
    * offset and size in the file.
    */
  final case class FrameRef(idx: Int, dts: Long, offset: Long, size: Long)
  final case class VideoTrack(timescale: Long, frames: Array[FrameRef])

  private def children(
      bytes: Array[Byte], start: Long, end: Long): Seq[(String, Long, Long)] = {
    // (type, payloadStart, payloadEnd) of each child box in the range
    val out = Seq.newBuilder[(String, Long, Long)]
    var off = start
    val n = bytes.length.toLong
    var sane = true
    while (sane && off + 8 <= end) {
      val o = off.toInt
      var size = u32(bytes, o)
      var hdr = 8
      if (size == 1L && off + 16 <= end) { size = u64(bytes, o + 8); hdr = 16 }
      else if (size == 0L) size = end - off
      if (size < hdr || off + size > end || off + size > n) sane = false
      else {
        out += ((fourcc(bytes, o + 4), off + hdr, off + size))
        off += size
      }
    }
    out.result()
  }

  private def child(
      bytes: Array[Byte], start: Long, end: Long, t: String): Option[(Long, Long)] =
    children(bytes, start, end).collectFirst { case (`t`, s, e) => (s, e) }

  /** Walk moov→trak→mdia→{mdhd,hdlr,minf→stbl} of the FIRST video
    * ('vide' handler) track and expand its sample tables — stts
    * (decode times), stsz (sizes), stsc (sample→chunk), stco/co64
    * (chunk offsets) — into per-frame (dts, offset, size) refs, the
    * container-level frame addressing every keyframe sampler starts
    * from (ISO/IEC 14496-12 §8.6-8.7). Byte arithmetic only; no codec.
    */
  def videoTrack(bytes: Array[Byte]): Option[VideoTrack] = {
    val n = bytes.length.toLong
    val moov = child(bytes, 0L, n, "moov").toSeq
    val tracks = for {
      (ms, me) <- moov
      ("trak", ts, te) <- children(bytes, ms, me)
      (ds, de) <- child(bytes, ts, te, "mdia").toSeq
    } yield (ds, de)
    tracks.flatMap { case (ds, de) =>
      val isVideo = child(bytes, ds, de, "hdlr").exists { case (hs, he) =>
        hs + 12 <= he && fourcc(bytes, (hs + 8).toInt) == "vide"
      }
      if (!isVideo) None
      else (for {
        (mh, _) <- child(bytes, ds, de, "mdhd")
        mts = {
          val ver = bytes(mh.toInt) & 0xff
          if (ver == 1) u32(bytes, (mh + 20).toInt) else u32(bytes, (mh + 12).toInt)
        }
        (fs, fe) <- child(bytes, ds, de, "minf")
        (ss, se) <- child(bytes, fs, fe, "stbl")
        (sttsS, sttsE) <- child(bytes, ss, se, "stts")
        (stszS, stszE) <- child(bytes, ss, se, "stsz")
        (stscS, stscE) <- child(bytes, ss, se, "stsc")
        co <- child(bytes, ss, se, "stco")
          .map(c => (c, 4)).orElse(child(bytes, ss, se, "co64").map(c => (c, 8)))
        // malformed-payload guard: every declared entry count must fit
        // inside its own box, or a corrupted file could demand a
        // multi-GB allocation from one scan task
        uniform = u32(bytes, (stszS + 4).toInt)
        k0 = u32(bytes, (stszS + 8).toInt)
        // guard layout: box content is version+flags (4) then
        // entry_count (4), so entries start at +8 and the bound is
        // 8 + entrySize*n. The uniform-stsz branch declares no entry
        // table, so bound k0 by the file itself: k frames of >=1 byte
        // each can never exceed the payload length.
        if k0 >= 0 && k0 <= Int.MaxValue &&
          (if (uniform != 0L) k0 <= n else 12 + 4L * k0 <= stszE - stszS) &&
          8 + 8L * u32(bytes, (sttsS + 4).toInt) <= sttsE - sttsS &&
          8 + 12L * u32(bytes, (stscS + 4).toInt) <= stscE - stscS &&
          8 + co._2.toLong * u32(bytes, (co._1._1 + 4).toInt) <= co._1._2 - co._1._1
      } yield {
        val ((coS, _), coW) = co
        // sizes
        val k = k0.toInt
        val sizes = Array.tabulate(k)(j =>
          if (uniform != 0L) uniform else u32(bytes, (stszS + 12 + 4L * j).toInt))
        // decode times from stts runs
        val nRuns = u32(bytes, (sttsS + 4).toInt).toInt
        val dts = new Array[Long](k)
        var j = 0; var t = 0L
        var run = 0
        var left = if (nRuns > 0) u32(bytes, (sttsS + 8).toInt) else 0L
        var delta = if (nRuns > 0) u32(bytes, (sttsS + 12).toInt) else 0L
        while (j < k) {
          while (left == 0L && run + 1 < nRuns) {
            run += 1
            left = u32(bytes, (sttsS + 8 + 8L * run).toInt)
            delta = u32(bytes, (sttsS + 12 + 8L * run).toInt)
          }
          dts(j) = t; t += delta
          if (left > 0) left -= 1
          j += 1
        }
        // sample→chunk expansion against the chunk-offset table
        val nChunks = u32(bytes, (coS + 4).toInt).toInt
        val chunkOff = Array.tabulate(nChunks)(c =>
          if (coW == 4) u32(bytes, (coS + 8 + 4L * c).toInt)
          else u64(bytes, (coS + 8 + 8L * c).toInt))
        val nStsc = u32(bytes, (stscS + 4).toInt).toInt
        val stsc = Array.tabulate(nStsc) { e =>
          (u32(bytes, (stscS + 8 + 12L * e).toInt),  // first_chunk (1-based)
            u32(bytes, (stscS + 12 + 12L * e).toInt)) // samples_per_chunk
        }
        val offsets = new Array[Long](k)
        var s = 0
        var c = 0
        while (c < nChunks && s < k) {
          val spc = {
            var e = nStsc - 1
            while (e > 0 && stsc(e)._1 > c + 1) e -= 1
            stsc(e)._2.toInt
          }
          var within = 0L
          var i2 = 0
          while (i2 < spc && s < k) {
            offsets(s) = chunkOff(c) + within
            within += sizes(s)
            s += 1; i2 += 1
          }
          c += 1
        }
        VideoTrack(mts,
          Array.tabulate(k)(j2 => FrameRef(j2, dts(j2), offsets(j2), sizes(j2))))
      })
    }.headOption
  }

  // ---- deterministic fixture ---------------------------------------

  private def putU32(b: Array[Byte], o: Int, v: Long): Unit = {
    b(o) = ((v >>> 24) & 0xff).toByte
    b(o + 1) = ((v >>> 16) & 0xff).toByte
    b(o + 2) = ((v >>> 8) & 0xff).toByte
    b(o + 3) = (v & 0xff).toByte
  }

  private def putType(b: Array[Byte], o: Int, t: String): Unit = {
    val raw = t.getBytes("ISO-8859-1")
    System.arraycopy(raw, 0, b, o, 4)
  }

  /** Minimal valid ISO-BMFF fixture whose metadata is a pure function
    * of `id` — the oracle predicts it without parsing:
    *
    *   timescale = 600·(1 + id % 5)
    *   duration  = timescale·(1 + id % 120) + id % timescale
    *
    * Layout: ftyp(24 bytes: isom, 2 compatible brands) + moov(mvhd v0).
    * The leading ftyp size 0x00000018 also satisfies the sniffKind
    * video/mp4 magic heuristic.
    */
  def fixtureMp4(id: Long): Array[Byte] = {
    val ts = 600L * (1 + Math.floorMod(id, 5L))
    val dur = ts * (1 + Math.floorMod(id, 120L)) + Math.floorMod(id, ts)
    val ftypLen = 24
    val mvhdLen = 108 // 8 hdr + 4 verflags + 2·4 times + 4 ts + 4 dur + 80 tail
    val moovLen = 8 + mvhdLen
    val out = new Array[Byte](ftypLen + moovLen)
    // ftyp
    putU32(out, 0, ftypLen)
    putType(out, 4, "ftyp")
    putType(out, 8, "isom")
    putU32(out, 12, 0L) // minor version
    putType(out, 16, "isom")
    putType(out, 20, "mp42")
    // moov > mvhd (version 0; creation/modification/rate/matrix zeroed)
    val m = ftypLen
    putU32(out, m, moovLen)
    putType(out, m + 4, "moov")
    putU32(out, m + 8, mvhdLen)
    putType(out, m + 12, "mvhd")
    putU32(out, m + 28, ts)
    putU32(out, m + 32, dur)
    out
  }

  /** ISO-BMFF fixture WITH a real video track whose sample tables are
    * a pure function of `id` — the oracle predicts every sampled
    * frame's timestamp, size, and content without parsing:
    *
    *   media timescale  mts = 1000·(1 + id % 3)
    *   frame count      k   = 5 + id % 4
    *   stts             two runs: ceil(k/2) frames at mts/10 (100 ms),
    *                    the rest at mts/5 (200 ms)
    *   sizes            sz_j = 16 + (id + j) % 8
    *   content          byte i of frame j = 'A' + (id·31 + j·7 + i) % 26
    *   chunking         stsc/stco split samples 3 : k−3 across two
    *                    chunks (exercises the sample→chunk walk)
    */
  def fixtureMp4Track(id: Long): Array[Byte] = {
    val mts = 1000L * (1 + Math.floorMod(id, 3L))
    val k = (5 + Math.floorMod(id, 4L)).toInt
    val r1 = (k + 1) / 2
    val d1 = mts / 10
    val d2 = mts / 5
    val sizes = Array.tabulate(k)(j => 16 + Math.floorMod(id + j, 8L).toInt)
    val ftypLen = 24
    val mvhdLen = 108
    val sttsLen = 32
    val stscLen = 40
    val stszLen = 20 + 4 * k
    val stcoLen = 24
    val stblLen = 8 + sttsLen + stscLen + stszLen + stcoLen
    val minfLen = 8 + stblLen
    val mdhdLen = 32
    val hdlrLen = 33
    val mdiaLen = 8 + mdhdLen + hdlrLen + minfLen
    val trakLen = 8 + mdiaLen
    val moovLen = 8 + mvhdLen + trakLen
    val mdatPayload = sizes.sum
    val out = new Array[Byte](ftypLen + moovLen + 8 + mdatPayload)
    putU32(out, 0, ftypLen); putType(out, 4, "ftyp"); putType(out, 8, "isom")
    putU32(out, 12, 0L); putType(out, 16, "isom"); putType(out, 20, "mp42")
    var o = ftypLen
    putU32(out, o, moovLen); putType(out, o + 4, "moov")
    putU32(out, o + 8, mvhdLen); putType(out, o + 12, "mvhd")
    putU32(out, o + 28, 600L)
    putU32(out, o + 32, 600L * k)
    o = ftypLen + 8 + mvhdLen
    putU32(out, o, trakLen); putType(out, o + 4, "trak")
    putU32(out, o + 8, mdiaLen); putType(out, o + 12, "mdia")
    var p = o + 16
    putU32(out, p, mdhdLen); putType(out, p + 4, "mdhd")
    putU32(out, p + 20, mts)
    putU32(out, p + 24, r1 * d1 + (k - r1) * d2)
    p += mdhdLen
    putU32(out, p, hdlrLen); putType(out, p + 4, "hdlr")
    putType(out, p + 16, "vide")
    p += hdlrLen
    putU32(out, p, minfLen); putType(out, p + 4, "minf")
    putU32(out, p + 8, stblLen); putType(out, p + 12, "stbl")
    var q = p + 16
    putU32(out, q, sttsLen); putType(out, q + 4, "stts")
    putU32(out, q + 12, 2L)
    putU32(out, q + 16, r1); putU32(out, q + 20, d1)
    putU32(out, q + 24, k - r1); putU32(out, q + 28, d2)
    q += sttsLen
    putU32(out, q, stscLen); putType(out, q + 4, "stsc")
    putU32(out, q + 12, 2L)
    putU32(out, q + 16, 1L); putU32(out, q + 20, 3L); putU32(out, q + 24, 1L)
    putU32(out, q + 28, 2L); putU32(out, q + 32, (k - 3).toLong); putU32(out, q + 36, 1L)
    q += stscLen
    putU32(out, q, stszLen); putType(out, q + 4, "stsz")
    putU32(out, q + 12, 0L)
    putU32(out, q + 16, k.toLong)
    var j = 0
    while (j < k) { putU32(out, q + 20 + 4 * j, sizes(j).toLong); j += 1 }
    q += stszLen
    val mdatStart = ftypLen + moovLen
    val off1 = mdatStart + 8L
    val off2 = off1 + sizes(0) + sizes(1) + sizes(2)
    putU32(out, q, stcoLen); putType(out, q + 4, "stco")
    putU32(out, q + 12, 2L)
    putU32(out, q + 16, off1); putU32(out, q + 20, off2)
    putU32(out, mdatStart, (8 + mdatPayload).toLong)
    putType(out, mdatStart + 4, "mdat")
    var w = mdatStart + 8
    j = 0
    while (j < k) {
      var i = 0
      while (i < sizes(j)) {
        out(w) = (65 + Math.floorMod(id * 31 + j * 7 + i, 26L)).toInt.toByte
        w += 1; i += 1
      }
      j += 1
    }
    out
  }
}
