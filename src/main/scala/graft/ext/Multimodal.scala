package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing (SURVEY §2.7): image/audio/video as opaque
 * `binary` payloads with a typed metadata struct, plus decode /
 * feature-extract / resize / frame-sample operators.
 *
 * Container-header decode is REAL for RIFF/WAV, BMP, JPEG, PNG, GIF
 * and MP4 (pure-Scala parses, no native libraries — [[MediaCodecs]];
 * JPEG and MP4 are kernel-path only, their frame/movie headers sit at
 * variable offsets);
 * pixel/sample codecs are NOT available in this environment, so the
 * remaining decode kernels are deterministic STUBS (clearly marked
 * below): they
 * derive plausible metadata/features from a hash of the payload bytes.
 * Everything around them — schema, partition behavior, explode shapes,
 * batch-friendly column signatures — is real and is what matters at
 * scale: a payload column is never shuffled unless the operator needs
 * it, and per-frame fan-out is an `explode` (rows scale with
 * frames, not with driver memory).
 */
object Multimodal {

  /** media row schema: (media_id, kind, payload BINARY, meta STRUCT). */
  val kinds = Seq("image", "audio", "video")

  /**
   * Wrap any (id, text) frame as a synthetic media frame — the test
   * harness's stand-in for real blobs. Payload = utf8 bytes; kind chosen
   * deterministically per id.
   */
  def asMediaFrame(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    df.select(
      col(idCol).as("media_id"),
      element_at(array(kinds.map(lit): _*),
        (pmod(col(idCol), lit(kinds.size)) + 1).cast("int")).as("kind"),
      col(textCol).cast("binary").as("payload"))

  /** 60-bit md5 hash of the payload bytes — the stub codec's entropy
    * source. md5 (not xxhash64) so the DuckDB oracle can reproduce the
    * stub's outputs exactly: `('0x' || substr(md5(payload), 1, 15))
    * ::BIGINT`. [[decodeBatched]]'s kernel computes the identical value
    * via MessageDigest, so the Column and mapPartitions paths agree. */
  private def payloadHash(payload: Column): Column =
    conv(substring(md5(payload), 1, 15), 16, 10).cast("long")

  /** Little-endian unsigned int read from a binary column at 1-based
    * byte position `pos` — per-byte hex/conv, all codegen'd functions. */
  private def leUint(payload: Column, pos: Int, nBytes: Int): Column =
    (0 until nBytes).map { i =>
      conv(hex(substring(payload, pos + i, 1)), 16, 10).cast("long") * (1L << (8 * i))
    }.reduce(_ + _)

  /** Big-endian unsigned int read — `hex` of the byte slice IS its
    * big-endian digit string, so one conv suffices (PNG's IHDR fields
    * are big-endian). */
  private def beUint(payload: Column, pos: Int, nBytes: Int): Column =
    conv(hex(substring(payload, pos, nBytes)), 16, 10).cast("long")

  private def ascii(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  /** Canonical 44-byte PCM WAV layout: RIFF/WAVE magic, a 16-byte
    * `fmt ` chunk at offset 12, `data` immediately after. The chunk-
    * walking general case lives in [[MediaCodecs.parseWav]] (kernel
    * path); the Column path recognizes the canonical layout only, which
    * is what wav writers emit in practice. */
  private def isCanonicalWav(payload: Column): Column =
    length(payload) >= 44 &&
      substring(payload, 1, 4) === lit(ascii("RIFF")) &&
      substring(payload, 9, 4) === lit(ascii("WAVE")) &&
      substring(payload, 13, 4) === lit(ascii("fmt ")) &&
      leUint(payload, 17, 4) === 16L &&
      substring(payload, 37, 4) === lit(ascii("data"))

  /** Signed int32 view of a 4-byte little-endian field. */
  private def leS32(payload: Column, pos: Int): Column = {
    val v = leUint(payload, pos, 4)
    when(v >= 2147483648L, v - 4294967296L).otherwise(v)
  }

  /** PNG: 8-byte signature then a mandatory 13-byte IHDR first chunk;
    * bit depth / color type validated against the spec's legal values —
    * mirrors [[MediaCodecs.parsePng]] exactly (same predicate, same
    * reads), so the Column and kernel paths agree on every payload. */
  private def isPng(payload: Column): Column = {
    val w = beUint(payload, 17, 4)
    val h = beUint(payload, 21, 4)
    length(payload) >= 33 &&
      substring(payload, 1, 8) === lit(MediaCodecs.PngMagic) &&
      beUint(payload, 9, 4) === 13L &&
      substring(payload, 13, 4) === lit(ascii("IHDR")) &&
      beUint(payload, 25, 1).isInCollection(Seq(1L, 2L, 4L, 8L, 16L)) &&
      beUint(payload, 26, 1).isInCollection(Seq(0L, 2L, 3L, 4L, 6L)) &&
      w > 0L && w <= 1000000000L && h > 0L && h <= 1000000000L
  }

  /** GIF: "GIF87a"/"GIF89a" magic + non-zero little-endian u16 canvas
    * dimensions in the logical screen descriptor — mirrors
    * [[MediaCodecs.parseGif]]. */
  private def isGif(payload: Column): Column =
    length(payload) >= 13 &&
      (substring(payload, 1, 6) === lit(ascii("GIF87a")) ||
        substring(payload, 1, 6) === lit(ascii("GIF89a"))) &&
      leUint(payload, 7, 2) > 0L && leUint(payload, 9, 2) > 0L

  /** BMP with a BITMAPINFOHEADER-or-later DIB header; planes==1 and a
    * legal color depth double as the structural guard that keeps text
    * payloads (even ones starting "BM") out of this branch — mirrors
    * [[MediaCodecs.parseBmp]]. */
  private def isBmp(payload: Column): Column = {
    val w = leS32(payload, 19)
    val h = leS32(payload, 23)
    length(payload) >= 54 &&
      substring(payload, 1, 2) === lit(ascii("BM")) &&
      leUint(payload, 15, 4) >= 40L &&
      leUint(payload, 27, 2) === 1L &&
      leUint(payload, 29, 2).isInCollection(Seq(1L, 4L, 8L, 16L, 24L, 32L)) &&
      w > 0L && w <= 1000000000L &&
      abs(h) > 0L && abs(h) <= 1000000000L
  }

  /**
   * Container-header decode. Payloads carrying the canonical RIFF/WAV
   * magic, a BMP header, a PNG IHDR, or a GIF header get a REAL parse
   * (sample rate / channels / duration from the WAV fmt and data
   * chunks; pixel dimensions from the BMP DIB header / PNG IHDR / GIF
   * logical screen — fixed-offset field reads, all codegen'd column
   * functions); everything else falls back to the deterministic md5
   * STUB (JPEG's SOF and MP4's moov/mvhd sit at variable offsets,
   * which only the kernel path can walk — see [[decodeBatched]]). The
   * column signature (binary -> struct) is the contract either way.
   */
  def decodeMeta(payload: Column, kind: Column): Column = {
    val h = payloadHash(payload)
    val byteRate = leUint(payload, 29, 4)
    // declared data size clamped to the bytes actually present (body
    // starts after the canonical 44-byte header) — a truncated
    // container degrades to the real byte count, matching the kernel
    // parser's clamp
    val dataBytes = least(leUint(payload, 41, 4),
      length(payload).cast("long") - 44L)
    // integer ceil-div, exact in double up to 2^53 — matches the kernel
    // parser's (dataBytes + byteRate - 1) / byteRate
    val durationS = when(byteRate > 0,
      floor((dataBytes + byteRate - lit(1L)) / byteRate)).otherwise(0L).cast("int")
    when(isCanonicalWav(payload),
      struct(
        lit(0).as("width"),
        lit(0).as("height"),
        durationS.as("duration_s"),
        length(payload).cast("long").as("n_bytes"),
        lit("wav").as("format"),
        leUint(payload, 25, 4).cast("int").as("sample_rate"),
        leUint(payload, 23, 2).cast("int").as("channels")))
    .when(isBmp(payload),
      struct(
        leS32(payload, 19).cast("int").as("width"),
        abs(leS32(payload, 23)).cast("int").as("height"),
        lit(0).as("duration_s"),
        length(payload).cast("long").as("n_bytes"),
        lit("bmp").as("format"),
        lit(0).as("sample_rate"),
        lit(0).as("channels")))
    .when(isPng(payload),
      struct(
        beUint(payload, 17, 4).cast("int").as("width"),
        beUint(payload, 21, 4).cast("int").as("height"),
        lit(0).as("duration_s"),
        length(payload).cast("long").as("n_bytes"),
        lit("png").as("format"),
        lit(0).as("sample_rate"),
        lit(0).as("channels")))
    .when(isGif(payload),
      struct(
        leUint(payload, 7, 2).cast("int").as("width"),
        leUint(payload, 9, 2).cast("int").as("height"),
        lit(0).as("duration_s"),
        length(payload).cast("long").as("n_bytes"),
        lit("gif").as("format"),
        lit(0).as("sample_rate"),
        lit(0).as("channels")))
    .otherwise(
      struct(
        (pmod(h, lit(1920L)) + 1L).cast("int").as("width"),
        (pmod(shiftrightunsigned(h, 16), lit(1080L)) + 1L).cast("int").as("height"),
        (pmod(shiftrightunsigned(h, 32), lit(600L)) + 1L).cast("int").as("duration_s"),
        length(payload).cast("long").as("n_bytes"),
        kind.as("format"),
        lit(0).as("sample_rate"),
        lit(0).as("channels")))
  }

  /**
   * Adds the `meta` struct via [[decodeMeta]] — the Column decode
   * surface. CAVEAT (API asymmetry, by construction): this path real-
   * parses canonical WAV, BMP, PNG and GIF only; [[decodeBatched]]
   * additionally real-parses non-canonical WAV chunk layouts and JPEG
   * (variable-offset structures a fixed-position Column read can't
   * express). A payload in that gap gets REAL metadata from
   * decodeBatched but STUB metadata here — callers switching surfaces
   * must expect different width/height/duration for such payloads.
   */
  def withMeta(media: DataFrame): DataFrame =
    media.withColumn("meta", decodeMeta(col("payload"), col("kind")))

  /**
   * STUB resize — real kernel would transcode pixels; the fake keeps the
   * payload and rewrites metadata, preserving aspect ratio. Shape of the
   * operation (narrow map, no shuffle) is the scale-relevant part.
   */
  def resize(media: DataFrame, maxDim: Int): DataFrame = {
    val m = col("meta")
    val scale = least(lit(1.0),
      lit(maxDim.toDouble) / greatest(m.getField("width"), m.getField("height")).cast("double"))
    media.withColumn("meta", struct(
      ceil(m.getField("width") * scale).cast("int").as("width"),
      ceil(m.getField("height") * scale).cast("int").as("height"),
      m.getField("duration_s").as("duration_s"),
      m.getField("n_bytes").as("n_bytes"),
      m.getField("format").as("format"),
      m.getField("sample_rate").as("sample_rate"),
      m.getField("channels").as("channels")))
  }

  /**
   * Frame sampling for video rows: one output row per sampled frame at
   * `everyNSeconds`. Row fan-out via explode — frames-per-row bounded by
   * duration, memory bounded by batch, no driver loops. Frame payload is
   * a STUB slice of the source payload.
   */
  def sampleFrames(media: DataFrame, everyNSeconds: Int): DataFrame = {
    val dur = col("meta").getField("duration_s")
    media
      .where(col("kind") === "video")
      .withColumn("frame_ts",
        explode(sequence(lit(0), dur - 1, lit(everyNSeconds))))
      .withColumn("frame_payload",
        substring(col("payload"), (pmod(col("frame_ts"), lit(16)) + 1).cast("int"), lit(16)))
      .select(col("media_id"), col("frame_ts"), col("frame_payload"))
  }

  /** Typed row for the batch-decode path. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  final case class DecodedRow(media_id: Long, kind: String, width: Int,
      height: Int, duration_s: Int, n_bytes: Long, sample_rate: Int,
      channels: Int)

  /**
   * Batch decode via `mapPartitions` — the shape a real codec needs:
   * heavyweight per-partition init (codec context, native lib handles)
   * amortized across the partition's rows, rows streamed through an
   * iterator (never materialized per partition), output typed.
   * RIFF/WAV, BMP, JPEG, PNG, GIF and MP4 payloads get the REAL
   * header parse ([[MediaCodecs.parseWav]] — unlike the Column path it
   * handles non-canonical chunk layouts — [[MediaCodecs.parseBmp]],
   * [[MediaCodecs.parseJpeg]] and [[MediaCodecs.parseMp4]] which are
   * kernel-only (variable-offset structures),
   * [[MediaCodecs.parsePng]] and [[MediaCodecs.parseGif]]); everything
   * else goes through the deterministic STUB (`stubDecode`). Add real
   * parsers for further formats here without touching the Spark
   * plumbing.
   */
  def decodeBatched(media: DataFrame): Dataset[DecodedRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init happens HERE (codec context in real life)
        rows.map { r =>
          MediaCodecs.parseWav(r.payload).map(w =>
            DecodedRow(r.media_id, r.kind, 0, 0, w.durationS,
              r.payload.length.toLong, w.sampleRate, w.channels))
          .orElse(MediaCodecs.parseBmp(r.payload).map(b =>
            DecodedRow(r.media_id, r.kind, b.width, b.height, 0,
              r.payload.length.toLong, 0, 0)))
          .orElse(MediaCodecs.parseJpeg(r.payload).map(j =>
            DecodedRow(r.media_id, r.kind, j.width, j.height, 0,
              r.payload.length.toLong, 0, 0)))
          .orElse(MediaCodecs.parsePng(r.payload).map(p =>
            DecodedRow(r.media_id, r.kind, p.width, p.height, 0,
              r.payload.length.toLong, 0, 0)))
          .orElse(MediaCodecs.parseGif(r.payload).map(g =>
            DecodedRow(r.media_id, r.kind, g.width, g.height, 0,
              r.payload.length.toLong, 0, 0)))
          // mp4: channels carries the container's trak count — the
          // closest "stream count" notion a video container has
          .orElse(MediaCodecs.parseMp4(r.payload).map(m =>
            DecodedRow(r.media_id, r.kind, m.width, m.height, m.durationS,
              r.payload.length.toLong, 0, m.trackCount)))
          .getOrElse {
            val (wd, h, d) = stubDecode(r.payload)
            DecodedRow(r.media_id, r.kind, wd, h, d,
              r.payload.length.toLong, 0, 0)
          }
        }
      }
  }

  /** STUB codec kernel for payloads no real parser claims:
    * dimensions/duration from the payload's md5 (the real parsers —
    * WAV fmt, BMP DIB, JPEG SOF, PNG IHDR, GIF LSD, MP4 moov — run
    * first in [[decodeBatched]]). Computes
    * the SAME 60-bit value as the Column-side [[payloadHash]], so both
    * decode paths — and the DuckDB oracle — agree exactly. */
  private def stubDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val digest = java.security.MessageDigest.getInstance("MD5").digest(payload)
    val hex = digest.take(8).map(b => f"$b%02x").mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    val w = (h % 1920L + 1L).toInt
    val hh = ((h >>> 16) % 1080L + 1L).toInt
    val d = ((h >>> 32) % 600L + 1L).toInt
    (w, hh, d)
  }

  /**
   * STUB feature extraction — real kernel would run an encoder; the fake
   * emits a deterministic 8-dim pseudo-embedding from per-dimension md5
   * hashes (oracle-replayable like [[payloadHash]]) so downstream
   * similarity plumbing ([[Similarity]]) is exercised end to end with
   * the true column shape (`array<double>`).
   */
  def features(media: DataFrame, dims: Int = 8): DataFrame = {
    val cols = (0 until dims).map { d =>
      val h = payloadHash(concat(col("payload"),
        lit(graft.functions.Rng.Sep + d.toString).cast("binary")))
      (pmod(h, lit(2000L)).cast("double") / 1000.0 - 1.0)
    }
    media.withColumn("feature", array(cols: _*))
  }
}
