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
}
