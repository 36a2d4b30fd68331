package graft.ext

/**
 * Pure-Scala media container parsers — the REAL codecs in the
 * multimodal suite (no native libraries needed for header-level
 * decode): chunk-walking RIFF/WAV, BMP, JPEG SOF marker walk, PNG
 * IHDR, GIF logical-screen, and MP4/ISO-BMFF box walk
 * (moov/mvhd/tkhd). Payloads that don't carry a magic
 * fall back to the deterministic md5 stub in [[Multimodal]], so the
 * text-backed test corpus keeps replaying exactly in the DuckDB
 * oracle.
 *
 * The reference has no media handling at all (it generates text fakes,
 * src/main.py:977-1020) — this is part of the training-data-pipeline
 * extension surface, not reference parity.
 */
object MediaCodecs {

  /** Parsed WAV header facts. `durationS` is ceil(dataBytes/byteRate) —
    * integer arithmetic, so the Column-side parse in
    * [[Multimodal.decodeMeta]] computes the identical value.
    * `dataBytes` is the declared data-chunk size clamped to the bytes
    * actually present, so a truncated container reports the real byte
    * count (and a duration derived from it) instead of the header's
    * inflated claim — the Column parse clamps identically. */
  final case class WavMeta(channels: Int, sampleRate: Int, byteRate: Int,
      bitsPerSample: Int, dataBytes: Long, durationS: Int)

  private def leU16(b: Array[Byte], pos: Int): Int =
    (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8)

  private def leU32(b: Array[Byte], pos: Int): Long =
    (b(pos) & 0xffL) | ((b(pos + 1) & 0xffL) << 8) |
      ((b(pos + 2) & 0xffL) << 16) | ((b(pos + 3) & 0xffL) << 24)

  private def chunkId(b: Array[Byte], pos: Int): String =
    new String(b, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /**
   * Chunk-walking RIFF/WAV parse: verifies `RIFF….WAVE`, then walks
   * chunks from offset 12 (`id(4) size(4 LE) body[size]`, bodies padded
   * to even length per the RIFF spec) until both a `fmt ` and a `data`
   * chunk are seen. Handles non-canonical layouts — extra chunks (LIST,
   * fact, …) before `data`, extended fmt bodies — that the Column-side
   * canonical parse does not. Truncated or malformed containers return
   * None (callers fall back to the stub) rather than throwing: at 100 TB
   * a corrupt blob must degrade, not kill the stage.
   */
  def parseWav(payload: Array[Byte]): Option[WavMeta] = {
    if (payload == null || payload.length < 44) return None
    if (chunkId(payload, 0) != "RIFF" || chunkId(payload, 8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, byteRate, bits
    var dataBytes = -1L
    while (pos + 8 <= payload.length && (fmt.isEmpty || dataBytes < 0)) {
      val id = chunkId(payload, pos)
      val size = leU32(payload, pos + 4)
      if (id == "fmt " && fmt.isEmpty) {
        if (size < 16 || pos + 8 + 16 > payload.length) return None
        fmt = Some((leU16(payload, pos + 10), leU32(payload, pos + 12).toInt,
          leU32(payload, pos + 16).toInt, leU16(payload, pos + 22)))
      } else if (id == "data" && dataBytes < 0) {
        // clamp to the bytes actually present: a truncated container
        // degrades to the real byte count, not the header's claim
        dataBytes = math.min(size, (payload.length - (pos + 8)).toLong)
      }
      // chunk bodies are padded to even length; guard against size
      // overflowing Int on adversarial headers
      val step = 8L + size + (size & 1L)
      if (step <= 0 || pos + step > Int.MaxValue) pos = payload.length
      else pos += step.toInt
    }
    fmt match {
      case Some((ch, rate, byteRate, bits)) if dataBytes >= 0 =>
        val dur =
          if (byteRate > 0) ((dataBytes + byteRate - 1) / byteRate).toInt else 0
        Some(WavMeta(ch, rate, byteRate, bits, dataBytes, dur))
      case _ => None
    }
  }

  /** Parsed BMP header facts. Negative stored height means top-down row
    * order; `height` here is the absolute pixel height. */
  final case class BmpMeta(width: Int, height: Int, bitsPerPixel: Int)

  /** Legal BMP color depths — also the structural sanity check that
    * makes a text payload starting with "BM" unparseable as BMP (ASCII
    * bytes at the bpp offset decode to huge values). */
  private val BmpDepths = Set(1, 4, 8, 16, 24, 32)

  /**
   * BMP (BITMAPINFOHEADER and later) parse: `BM` magic, 14-byte file
   * header, DIB header size >= 40 at offset 14, signed little-endian
   * dimensions at 18/22, planes must be 1, bpp must be a legal depth.
   * Width/height of zero or beyond 1e9 are rejected as malformed.
   */
  def parseBmp(payload: Array[Byte]): Option[BmpMeta] = {
    if (payload == null || payload.length < 54) return None
    if (payload(0) != 'B' || payload(1) != 'M') return None
    if (leU32(payload, 14) < 40L) return None // core (12-byte) headers: skip
    val w = leU32(payload, 18).toInt // signed int32 by construction
    val h = leU32(payload, 22).toInt
    val planes = leU16(payload, 26)
    val bpp = leU16(payload, 28)
    if (planes != 1 || !BmpDepths.contains(bpp)) return None
    val ah = math.abs(h)
    if (w <= 0 || ah <= 0 || w > 1000000000 || ah > 1000000000) return None
    Some(BmpMeta(w, ah, bpp))
  }

  /** Parsed JPEG frame-header facts (from the first SOF marker). */
  final case class JpegMeta(width: Int, height: Int, components: Int,
      progressive: Boolean)

  private def beU16(b: Array[Byte], pos: Int): Int =
    ((b(pos) & 0xff) << 8) | (b(pos + 1) & 0xff)

  private def beU32(b: Array[Byte], pos: Int): Long =
    ((b(pos) & 0xffL) << 24) | ((b(pos + 1) & 0xffL) << 16) |
      ((b(pos + 2) & 0xffL) << 8) | (b(pos + 3) & 0xffL)

  /** Parsed PNG IHDR facts. */
  final case class PngMeta(width: Int, height: Int, bitDepth: Int,
      colorType: Int)

  private[graft] val PngMagic: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  private val PngDepths = Set(1, 2, 4, 8, 16)
  private val PngColorTypes = Set(0, 2, 3, 4, 6)

  /**
   * PNG IHDR parse: 8-byte signature, then the mandatory first chunk
   * must be a 13-byte IHDR — big-endian width/height at fixed offsets
   * 16/20, bit depth and color type validated against the spec's legal
   * values (which doubles as the structural guard; the \\x89 signature
   * byte already keeps any text payload out). Fixed-offset throughout,
   * so the codegen'd Column parse in [[Multimodal.decodeMeta]] applies
   * the identical predicate and reads.
   */
  def parsePng(payload: Array[Byte]): Option[PngMeta] = {
    if (payload == null || payload.length < 33) return None
    var i = 0
    while (i < 8) { if (payload(i) != PngMagic(i)) return None; i += 1 }
    if (beU32(payload, 8) != 13L || chunkId(payload, 12) != "IHDR") return None
    val w = beU32(payload, 16)
    val h = beU32(payload, 20)
    val depth = payload(24) & 0xff
    val colorType = payload(25) & 0xff
    if (!PngDepths.contains(depth) || !PngColorTypes.contains(colorType)) return None
    if (w <= 0 || h <= 0 || w > 1000000000L || h > 1000000000L) return None
    Some(PngMeta(w.toInt, h.toInt, depth, colorType))
  }

  /** Parsed GIF logical-screen facts. `version` is "87a" or "89a". */
  final case class GifMeta(width: Int, height: Int, version: String)

  /**
   * GIF header parse: "GIF87a"/"GIF89a" magic, then the logical screen
   * descriptor's little-endian u16 canvas dimensions at offsets 6/8,
   * rejected when zero. Fixed-offset, mirrored exactly by the Column
   * parse in [[Multimodal.decodeMeta]].
   */
  def parseGif(payload: Array[Byte]): Option[GifMeta] = {
    if (payload == null || payload.length < 13) return None
    val hdr = new String(payload, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    val w = leU16(payload, 6)
    val h = leU16(payload, 8)
    if (w <= 0 || h <= 0) return None
    Some(GifMeta(w, h, hdr.substring(3)))
  }

  /** Parsed MP4/ISO-BMFF facts: movie duration (ceil of
    * mvhd duration/timescale), number of `trak` boxes, dimensions of
    * the first track with a non-zero tkhd width/height (the video
    * track; audio tracks store 0×0), and the ftyp major brand. */
  final case class Mp4Meta(durationS: Int, trackCount: Int, width: Int,
      height: Int, brand: String)

  private def beU64(b: Array[Byte], pos: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(pos + i) & 0xffL); i += 1 }
    v
  }

  /** One ISO-BMFF box header at `pos`: (body start, box end) — size==1
    * means a 64-bit largesize follows the type, size==0 means "to end
    * of enclosing space". None on malformed/overrunning headers. */
  private def boxBounds(b: Array[Byte], pos: Int, limit: Int): Option[(Int, Int)] = {
    if (pos + 8 > limit) return None
    val size32 = beU32(b, pos)
    val (body, end) =
      if (size32 == 1L) {
        if (pos + 16 > limit) return None
        val large = beU64(b, pos + 8)
        if (large < 16 || large > Int.MaxValue) return None
        (pos + 16, pos + large.toInt)
      } else if (size32 == 0L) (pos + 8, limit)
      else {
        if (size32 < 8) return None
        (pos + 8, pos + size32.toInt)
      }
    if (end > limit || end <= pos) None else Some((body, end))
  }

  /**
   * MP4 / ISO-BMFF parse (box walk — variable offsets, so kernel-path
   * only, like JPEG): requires a leading `ftyp` box (the magic at the
   * fixed offset 4, which no text payload carries), then walks
   * top-level boxes for `moov`, whose children yield the `mvhd` movie
   * duration/timescale (version 0 and 1 layouts) and the `trak` count;
   * the first track whose `tkhd` carries non-zero 16.16 fixed-point
   * dimensions contributes width/height (audio tracks store 0×0).
   * Returns None unless a well-formed moov+mvhd is present; corrupt or
   * truncated boxes degrade to None, never throw (MediaCodecsSpec
   * fuzzes this like the other containers).
   *
   * Reference: ISO/IEC 14496-12 §8.2.2 (mvhd), §8.3.2 (tkhd).
   */
  def parseMp4(payload: Array[Byte]): Option[Mp4Meta] = {
    if (payload == null || payload.length < 16) return None
    if (chunkId(payload, 4) != "ftyp") return None
    val n = payload.length
    // the ftyp box itself must be well-formed, and its major brand
    // printable ASCII — the structural guard against binary noise
    val ftypEnd = boxBounds(payload, 0, n) match {
      case Some((body, end)) if end - body >= 8 => end
      case _ => return None
    }
    val brand = chunkId(payload, 8)
    if (!brand.forall(c => c >= 0x20 && c < 0x7f)) return None

    var durationS = -1
    var tracks = 0
    var width = 0
    var height = 0
    var pos = ftypEnd
    while (pos < n) {
      boxBounds(payload, pos, n) match {
        case None => pos = n // malformed tail: stop walking
        case Some((body, end)) =>
          if (chunkId(payload, pos + 4) == "moov") {
            var cp = body
            while (cp < end) {
              boxBounds(payload, cp, end) match {
                case None => cp = end
                case Some((cbody, cend)) =>
                  chunkId(payload, cp + 4) match {
                    case "mvhd" if durationS < 0 && cbody + 4 <= cend =>
                      val v = payload(cbody) & 0xff
                      val (tsOff, durLen) = if (v == 1) (20, 8) else (12, 4)
                      if (cbody + tsOff + 4 + durLen <= cend) {
                        val timescale = beU32(payload, cbody + tsOff)
                        val dur =
                          if (v == 1) beU64(payload, cbody + tsOff + 4)
                          else beU32(payload, cbody + tsOff + 4)
                        if (timescale > 0 && dur >= 0)
                          durationS = ((dur + timescale - 1) / timescale).toInt
                      }
                    case "trak" =>
                      tracks += 1
                      // find this track's tkhd for the video dimensions
                      var tp = cbody
                      while (tp < cend) {
                        boxBounds(payload, tp, cend) match {
                          case None => tp = cend
                          case Some((tbody, tend)) =>
                            if (chunkId(payload, tp + 4) == "tkhd" &&
                                width == 0 && height == 0) {
                              val tv = payload(tbody) & 0xff
                              val whOff = if (tv == 1) 88 else 76
                              if (tbody + whOff + 8 <= tend) {
                                // 16.16 fixed point: integer part only
                                val w = (beU32(payload, tbody + whOff) >>> 16).toInt
                                val h = (beU32(payload, tbody + whOff + 4) >>> 16).toInt
                                if (w > 0 && h > 0) { width = w; height = h }
                              }
                            }
                            tp = tend
                        }
                      }
                    case _ => ()
                  }
                  cp = cend
              }
            }
          }
          pos = end
      }
    }
    if (durationS >= 0) Some(Mp4Meta(durationS, tracks, width, height, brand))
    else None
  }

  /**
   * JPEG marker walk: verify the SOI magic (FFD8), then step segment by
   * segment (marker FF xx + big-endian length including itself) until a
   * start-of-frame marker (SOF0–SOF15, excluding DHT/JPG/DAC at C4/C8/CC)
   * yields height/width/components. Standalone markers (RST, TEM) and
   * fill bytes are skipped. Kernel-path only — SOF sits at a variable
   * offset, which a fixed-position Column parse can't express; this is
   * exactly the case [[Multimodal.decodeBatched]]'s mapPartitions shape
   * exists for.
   */
  def parseJpeg(payload: Array[Byte]): Option[JpegMeta] = {
    if (payload == null || payload.length < 4) return None
    if ((payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8) return None
    var pos = 2
    while (pos + 4 <= payload.length) {
      if ((payload(pos) & 0xff) != 0xff) return None // desync: not a marker
      // skip fill bytes (FF FF ... FF marker)
      var mpos = pos + 1
      while (mpos < payload.length && (payload(mpos) & 0xff) == 0xff) mpos += 1
      if (mpos + 1 > payload.length) return None
      val marker = payload(mpos) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
        pos = mpos + 1 // standalone marker, no length field
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI / start-of-scan before any SOF: no frame header
      } else {
        if (mpos + 3 > payload.length) return None
        val len = beU16(payload, mpos + 1)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          // fields read end at the component count byte, payload(mpos+8)
          if (mpos + 9 > payload.length || len < 8) return None
          val h = beU16(payload, mpos + 4)
          val w = beU16(payload, mpos + 6)
          val nc = payload(mpos + 8) & 0xff
          if (w <= 0 || h <= 0) return None
          return Some(JpegMeta(w, h, nc, progressive = marker == 0xc2))
        }
        pos = mpos + 1 + len
      }
    }
    None
  }
}
