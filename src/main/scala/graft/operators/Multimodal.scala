package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads ride along as opaque
  * `binary` columns; this operator derives typed metadata and features from
  * the BYTES with pure Column expressions (binary substring → hex →
  * base-16 conv), so everything stays inside whole-stage codegen and scales
  * with the scan — no UDFs, no driver round-trips.
  *
  * What is real vs stubbed:
  *  - container/format detection and header decode (PNG IHDR, GIF logical
  *    screen descriptor, JPEG SOF marker walk) are REAL byte decoding,
  *    oracle-checkable;
  *  - PIXEL decode is real for the formats the JDK ships codecs for
  *    (PNG/JPEG/GIF/BMP via `javax.imageio` — [[imageIoDecoder]] /
  *    [[decodeImages]]), spec-pinned against a hand-built PNG;
  *  - AUDIO decode is real for the PCM containers the JDK ships codecs
  *    for (WAV/AIFF/AU via `javax.sound.sampled` — [[audioDecoder]] /
  *    [[decodeAudio]]), spec-pinned against a hand-built WAV with exact
  *    windowed RMS;
  *  - LEARNED-encoder features are a clearly-marked deterministic stand-in
  *    ([[fakeEmbedding]]) with the production plumbing (schema, batching,
  *    partitioning) real — this container ships no inference runtime.
  */
object Multimodal {

  /** 8-byte PNG signature, then the 4-byte IHDR length + "IHDR" tag. */
  private val PngMagicHex = "89504E470D0A1A0A"
  private val IhdrHex = "0000000D49484452"

  /** Big-endian unsigned int from `len` bytes at 1-based `pos`. */
  private def beUint(payload: Column, pos: Int, len: Int): Column =
    conv(hex(substring(payload, pos, len)), 16, 10).cast("long")

  /** Little-endian unsigned short at 1-based `pos` (GIF dimensions). */
  private def leUshort(payload: Column, pos: Int): Column =
    (beUint(payload, pos + 1, 1) * 256 + beUint(payload, pos, 1)).cast("long")

  def isPng(payload: Column): Column =
    hex(substring(payload, 1, 8)) === lit(PngMagicHex)

  def isGif(payload: Column): Column =
    substring(payload, 1, 6).cast("string").isin("GIF87a", "GIF89a")

  def isJpeg(payload: Column): Column =
    hex(substring(payload, 1, 3)) === lit("FFD8FF")

  /** PNG IHDR dimensions: width/height are big-endian uint32 at byte
    * offsets 16/20 (after the 8-byte signature and 8-byte chunk header).
    */
  def pngWidth(payload: Column): Column = beUint(payload, 17, 4)
  def pngHeight(payload: Column): Column = beUint(payload, 21, 4)

  /** GIF logical-screen dimensions: little-endian uint16 at offsets 6/8. */
  def gifWidth(payload: Column): Column = leUshort(payload, 7)
  def gifHeight(payload: Column): Column = leUshort(payload, 9)

  /** Big-endian unsigned int from `len` bytes at DYNAMIC 1-based `pos`
    * (the JPEG walk's offsets are data-dependent). Reads past the payload
    * end produce a short/empty slice whose conv is null/0 — callers treat
    * non-positive as "not decodable".
    */
  private def beUintAt(payload: Column, pos: Column, len: Int): Column =
    conv(hex(payload.substr(pos.cast("int"), lit(len))), 16, 10).cast("long")

  /** JPEG markers whose segment is a frame header carrying dimensions:
    * SOF0–SOF15 (0xC0–0xCF) minus DHT (0xC4), JPG (0xC8), DAC (0xCC).
    */
  private val SofMarkers: Seq[Long] =
    (0xC0L to 0xCFL).filterNot(m => m == 0xC4L || m == 0xC8L || m == 0xCCL)

  /** Segments to walk before giving up: real JPEGs put SOF within the
    * first handful of segments (APPn/COM/DQT/DHT come first); EXIF-heavy
    * files still fit comfortably in 40.
    */
  private val MaxJpegSegments = 40

  /** JPEG frame dimensions via a bounded SOF marker walk, as a pure
    * expression: `aggregate` over up to [[MaxJpegSegments]] steps carrying
    * (offset, w, h) state. Each step at offset `off` (1-based position of
    * the segment's 0xFF byte):
    *
    *  - marker 0xFF          → fill byte, advance 1;
    *  - SOFn ([[SofMarkers]]) → record height/width (big-endian uint16 at
    *    off+5 / off+7: FF, marker, 2-byte length, precision byte precede
    *    them) and stop;
    *  - TEM/RSTn (standalone, no length field) → advance 2;
    *  - EOI/SOS              → no frame header before entropy data: fail;
    *  - anything else        → advance 2 + big-endian segment length;
    *  - a non-0xFF byte where a marker should be, a segment length < 2, or
    *    a read past the payload end → malformed: fail.
    *
    * Returns struct(off, w, h) with w = h = -1 when not found/decodable.
    */
  def jpegDims(payload: Column): Column = {
    val fail = struct(lit(-1L).as("off"), lit(-1L).as("w"), lit(-1L).as("h"))
    aggregate(
      sequence(lit(1), lit(MaxJpegSegments)),
      struct(lit(3L).as("off"), lit(-1L).as("w"), lit(-1L).as("h")),
      (acc, _) => {
        val off = acc.getField("off")
        val w = acc.getField("w")
        val h = acc.getField("h")
        val marker = beUintAt(payload, off + 1, 1)
        val segLen = beUintAt(payload, off + 2, 2)
        def advance(to: Column) = struct(to.as("off"), w.as("w"), h.as("h"))
        when(off < 0 || w >= 0, acc)
          .when(beUintAt(payload, off, 1) =!= 0xFFL, fail)
          .when(marker === 0xFFL, advance(off + 1))
          .when(marker.isin(SofMarkers: _*),
            struct(off.as("off"),
              coalesce(beUintAt(payload, off + 7, 2), lit(-1L)).as("w"),
              coalesce(beUintAt(payload, off + 5, 2), lit(-1L)).as("h")))
          .when(marker === 0x01L || (marker >= 0xD0L && marker <= 0xD7L),
            advance(off + 2))
          .when(marker === 0xD9L || marker === 0xDAL, fail)
          .when(segLen >= 2L, advance(off + 2L + segLen))
          .otherwise(fail)
      })
  }

  /** JPEG dimensions, null when the payload has no decodable SOF header.
    * Width/height 0 is not a legal frame size — treated as not decodable.
    */
  def jpegWidth(payload: Column): Column = {
    val w = jpegDims(payload).getField("w")
    when(w > 0, w)
  }
  def jpegHeight(payload: Column): Column = {
    val h = jpegDims(payload).getField("h")
    when(h > 0, h)
  }

  /** Detected container format, or "unknown". */
  def format(payload: Column): Column =
    when(isPng(payload), lit("png"))
      .when(isGif(payload), lit("gif"))
      .when(isJpeg(payload), lit("jpeg"))
      .when(isWav(payload), lit("wav"))
      .when(isMp4(payload), lit("mp4"))
      .otherwise(lit("unknown"))

  // ── MP4 / ISO-BMFF (video) ────────────────────────────────────────────

  /** ISO base-media file: the first box is `ftyp` (its 4-byte type tag at
    * offset 5, after the box's own 4-byte big-endian size).
    */
  def isMp4(payload: Column): Column =
    substring(payload, 5, 4).cast("string") === "ftyp"

  /** Top-level boxes to walk: real files put ftyp/moov/mdat (plus a few
    * free/skip/wide/meta boxes) at the top level.
    */
  private val MaxMp4Boxes = 16

  /** MP4/ISO-BMFF container metadata via a bounded top-level box walk, as
    * a pure expression (the video counterpart of [[wavMeta]]'s RIFF walk):
    * `aggregate` over up to [[MaxMp4Boxes]] steps carrying
    * (off, brand, minor, mdat, moov, n) state. Each step at 1-based box
    * offset `off` reads the big-endian uint32 size and the 4-byte ASCII
    * type:
    *
    *  - size == 1 → the real size is the 64-bit `largesize` following the
    *    type (header 16 bytes) — the large-`mdat` form every >4 GiB video
    *    file uses;
    *  - size == 0 → the box runs to end-of-file (legal only for the last
    *    box);
    *  - "ftyp" → record `major_brand` (ASCII at off+8) and `minor_version`
    *    (BE u32 at off+12); "moov" → flag presence; "mdat" → record the
    *    payload size (declared size minus header — the header is enough,
    *    the sample data itself may be truncated away);
    *  - any other type → skip; a declared size smaller than its own header
    *    or a read past the payload end → stop with whatever was found.
    *
    * Returns struct(major_brand, minor_version, n_boxes, mdat_bytes,
    * has_moov); brand null / -1 / 0 when absent. Non-MP4 payloads return
    * the empty struct.
    */
  def mp4Meta(payload: Column): Column = {
    val walked = aggregate(
      sequence(lit(1), lit(MaxMp4Boxes)),
      struct(lit(1L).as("off"), lit(null).cast("string").as("brand"),
        lit(-1L).as("minor"), lit(-1L).as("mdat"), lit(0L).as("moov"),
        lit(0L).as("n")),
      (acc, _) => {
        val off = acc.getField("off")
        val brand = acc.getField("brand")
        val minor = acc.getField("minor")
        val mdat = acc.getField("mdat")
        val moov = acc.getField("moov")
        val n = acc.getField("n")
        val size32 = beUintAt(payload, off, 4)
        val tag = payload.substr((off + 4).cast("int"), lit(4)).cast("string")
        val hdr = when(size32 === 1L, lit(16L)).otherwise(lit(8L))
        val size = when(size32 === 1L, beUintAt(payload, off + 8, 8))
          .when(size32 === 0L, length(payload) - off + 1L)
          .otherwise(size32)
        def step(b: Column, mi: Column, md: Column, mv: Column) =
          struct((off + size).as("off"), b.as("brand"), mi.as("minor"),
            md.as("mdat"), mv.as("moov"), (n + 1L).as("n"))
        def stop = struct(lit(-1L).as("off"), brand.as("brand"),
          minor.as("minor"), mdat.as("mdat"), moov.as("moov"), n.as("n"))
        when(off < 0 || off > length(payload), acc)
          .when(size.isNull || size < hdr, stop)
          .when(tag === "ftyp", step(
            payload.substr((off + 8).cast("int"), lit(4)).cast("string"),
            beUintAt(payload, off + 12, 4), mdat, moov))
          .when(tag === "mdat", step(brand, minor, size - hdr, moov))
          .when(tag === "moov", step(brand, minor, mdat, lit(1L)))
          .otherwise(step(brand, minor, mdat, moov))
      })
    when(isMp4(payload),
      struct(walked.getField("brand").as("major_brand"),
        walked.getField("minor").as("minor_version"),
        walked.getField("n").as("n_boxes"),
        walked.getField("mdat").as("mdat_bytes"),
        walked.getField("moov").as("has_moov")))
      .otherwise(struct(lit(null).cast("string").as("major_brand"),
        lit(-1L).as("minor_version"), lit(0L).as("n_boxes"),
        lit(-1L).as("mdat_bytes"), lit(0L).as("has_moov")))
  }

  /** Big-endian hex of `v` as `bytes` bytes. */
  private def beHex(v: Column, bytes: Int): Column =
    lpad(hex(v), bytes * 2, "0")

  /** Synthesize a minimal ISO-BMFF header (an `ftyp` box with the given
    * major brand / minor version and [brand, "isom"] compatible brands, an
    * optional 16-byte `free` box the walk must skip, a stub `moov`, and an
    * `mdat` box header DECLARING `mdatBytes` of truncated-away sample
    * data — via the 64-bit largesize form when `largeMdat`) as a binary
    * column. The video counterpart of [[wavHeaderPayload]].
    */
  def mp4HeaderPayload(brand: Column, minorVersion: Column,
                       mdatBytes: Column, withFree: Column,
                       largeMdat: Column): Column = {
    val brandHex = hex(brand.cast("binary"))
    val ftyp = concat(lit("0000001866747970"), brandHex,
      beHex(minorVersion, 4), brandHex, lit("69736F6D"))
    val free = lit("0000001066726565" + "00" * 8)
    val moov = lit("000000106D6F6F76" + "00" * 8)
    val mdatSmall = concat(beHex(mdatBytes + 8L, 4), lit("6D646174"))
    val mdatLarge = concat(lit("000000016D646174"), beHex(mdatBytes + 16L, 8))
    unhex(concat(ftyp, when(withFree, free).otherwise(lit("")), moov,
      when(largeMdat, mdatLarge).otherwise(mdatSmall)))
  }

  // ── WAV/RIFF (audio) ──────────────────────────────────────────────────

  /** RIFF container holding a WAVE form: "RIFF" at 1, "WAVE" at 9. */
  def isWav(payload: Column): Column =
    substring(payload, 1, 4).cast("string") === "RIFF" &&
      substring(payload, 9, 4).cast("string") === "WAVE"

  /** Little-endian unsigned short / int at DYNAMIC 1-based `pos` — the
    * RIFF walk's chunk offsets are data-dependent, like the JPEG walk's.
    */
  private def leUshortAt(payload: Column, pos: Column): Column =
    beUintAt(payload, pos, 1) + beUintAt(payload, pos + 1, 1) * 256L
  private def leUintAt(payload: Column, pos: Column): Column =
    beUintAt(payload, pos, 1) + beUintAt(payload, pos + 1, 1) * 256L +
      beUintAt(payload, pos + 2, 1) * 65536L +
      beUintAt(payload, pos + 3, 1) * 16777216L

  /** Chunks to walk before giving up: fmt sits first or behind a handful
    * of JUNK/LIST/bext metadata chunks in every real WAV.
    */
  private val MaxRiffChunks = 16

  /** WAV audio metadata via a bounded RIFF chunk walk, as a pure
    * expression (the audio counterpart of [[jpegDims]]): `aggregate` over
    * up to [[MaxRiffChunks]] steps carrying (off, channels, sample_rate,
    * bits_per_sample, data_bytes) state. Each step at 1-based chunk
    * offset `off` reads the 4-byte ASCII tag and little-endian uint32
    * size:
    *
    *  - "fmt " → record channels / sample_rate / bits_per_sample from the
    *    canonical PCM field offsets (LE u16 @ off+10, LE u32 @ off+12,
    *    LE u16 @ off+22);
    *  - "data" → record the payload size (duration = data_bytes /
    *    byte-rate, all fields the caller needs to derive it are here);
    *  - both found → stop; any other tag → skip 8 + size (+ pad byte:
    *    RIFF chunks are word-aligned);
    *  - a read past the payload end (null size) → stop with whatever was
    *    found — a truncated header fixture still yields its fmt fields.
    *
    * Returns struct(channels, sample_rate, bits_per_sample, data_bytes),
    * each -1 when not found. Non-WAV payloads return all -1.
    */
  def wavMeta(payload: Column): Column = {
    val walked = aggregate(
      sequence(lit(1), lit(MaxRiffChunks)),
      struct(lit(13L).as("off"), lit(-1L).as("ch"), lit(-1L).as("sr"),
        lit(-1L).as("bps"), lit(-1L).as("dsz")),
      (acc, _) => {
        val off = acc.getField("off")
        val ch = acc.getField("ch")
        val sr = acc.getField("sr")
        val bps = acc.getField("bps")
        val dsz = acc.getField("dsz")
        val tag = payload.substr(off.cast("int"), lit(4)).cast("string")
        val size = leUintAt(payload, off + 4)
        val next = off + 8L + size + size % 2L
        def rec(c: Column, s: Column, b: Column, d: Column) =
          struct(next.as("off"), c.as("ch"), s.as("sr"), b.as("bps"), d.as("dsz"))
        when(off < 0 || (sr >= 0 && dsz >= 0), acc)
          .when(size.isNull, struct(lit(-1L).as("off"), ch.as("ch"),
            sr.as("sr"), bps.as("bps"), dsz.as("dsz")))
          .when(tag === "fmt ", rec(
            leUshortAt(payload, off + 10), leUintAt(payload, off + 12),
            leUshortAt(payload, off + 22), dsz))
          .when(tag === "data", rec(ch, sr, bps, size))
          .otherwise(rec(ch, sr, bps, dsz))
      })
    when(isWav(payload),
      struct(walked.getField("ch").as("channels"),
        walked.getField("sr").as("sample_rate"),
        walked.getField("bps").as("bits_per_sample"),
        walked.getField("dsz").as("data_bytes")))
      .otherwise(struct(lit(-1L).as("channels"), lit(-1L).as("sample_rate"),
        lit(-1L).as("bits_per_sample"), lit(-1L).as("data_bytes")))
  }

  /** Hex of `v` as `bytes` little-endian bytes (byte-reversed big-endian
    * hex) — the fixture builders write RIFF's LE fields with it.
    */
  private def leHex(v: Column, bytes: Int): Column = {
    val be = lpad(hex(v), bytes * 2, "0")
    concat((bytes to 1 by -1).map(b => substring(be, b * 2 - 1, 2)): _*)
  }

  /** Synthesize a canonical PCM WAV header (RIFF/WAVE, an optional
    * 12-byte JUNK chunk so the walk has something to skip, the 16-byte
    * "fmt " chunk, and a "data" chunk header with no payload) as a binary
    * column — the audio counterpart of [[pngHeaderPayload]]. byte-rate
    * and block-align are derived (PCM: sr·ch·bps/8, ch·bps/8), so the
    * fixture is a valid header any tool would parse.
    */
  def wavHeaderPayload(sampleRate: Column, channels: Column,
                       bitsPerSample: Column, dataBytes: Column,
                       withJunk: Column): Column = {
    // bits_per_sample is a multiple of 8, so the division is exact; cast
    // back to long because Column `/` is double division and hex() of a
    // double would not render the field bytes
    val blockAlign = (channels * bitsPerSample / 8).cast("long")
    val byteRate = (sampleRate * blockAlign).cast("long")
    val junkHex = lit("4A554E4B0C000000" + "00" * 12) // "JUNK", len 12
    val fmtHex = concat(
      lit("666D742010000000" + "0100"), // "fmt ", len 16, PCM
      leHex(channels, 2), leHex(sampleRate, 4), leHex(byteRate, 4),
      leHex(blockAlign, 2), leHex(bitsPerSample, 2))
    val dataHex = concat(lit("64617461"), leHex(dataBytes, 4)) // "data"
    val body = concat(lit("57415645"), // "WAVE"
      when(withJunk, junkHex).otherwise(lit("")), fmtHex, dataHex)
    unhex(concat(lit("52494646"), // "RIFF"
      leHex((length(body) / 2).cast("long"), 4), body))
  }

  /** Typed image metadata struct (format, width, height) decoded from the
    * payload bytes; null dimensions when the header is not decodable.
    */
  def imageMeta(payload: Column): Column =
    struct(
      format(payload).as("format"),
      when(isPng(payload), pngWidth(payload))
        .when(isGif(payload), gifWidth(payload))
        .when(isJpeg(payload), jpegWidth(payload)).as("width"),
      when(isPng(payload), pngHeight(payload))
        .when(isGif(payload), gifHeight(payload))
        .when(isJpeg(payload), jpegHeight(payload)).as("height"))

  /** Synthesize a minimal PNG header (signature + IHDR length/tag + the
    * given dimensions + bit-depth/color-type/filter/interlace bytes) as a
    * binary column. Test/fixture vehicle: lets a query construct payloads
    * whose decode is oracle-checkable byte arithmetic.
    */
  def pngHeaderPayload(width: Column, height: Column): Column =
    unhex(concat(
      lit(PngMagicHex), lit(IhdrHex),
      lpad(hex(width), 8, "0"), lpad(hex(height), 8, "0"),
      lit("0806000000")))

  /** Rewrite the dimensions inside an image header — the metadata half of
    * a resize, as pure binary splicing (slice → new big-endian dimension
    * bytes → rest). PNG rewrites the IHDR width/height words at their
    * fixed offsets; JPEG locates the SOF frame header with the same
    * bounded marker walk the decoder uses and rewrites its height/width
    * shorts at the discovered offset. Payloads that are not decodable
    * images pass through unchanged. Pixel RESAMPLING requires a codec this
    * container doesn't ship — pair this with a real decoder via
    * [[decodeBatched]]'s per-partition plumbing; the header splice is the
    * part an ingest pipeline needs for consistent downstream metadata.
    */
  def withResizedHeader(payload: Column, width: Column, height: Column): Column = {
    val jd = jpegDims(payload)
    val off = jd.getField("off")
    when(isPng(payload), concat(
        payload.substr(lit(1), lit(16)),
        unhex(lpad(hex(width), 8, "0")), unhex(lpad(hex(height), 8, "0")),
        payload.substr(lit(25), length(payload))))
      .when(isJpeg(payload) && jd.getField("w") > 0, concat(
        // keep through the SOF precision byte (off = the marker's 0xFF)
        payload.substr(lit(1), off + 4),
        unhex(lpad(hex(height), 4, "0")), unhex(lpad(hex(width), 4, "0")),
        payload.substr(off + 9, length(payload))))
      .otherwise(payload)
  }

  /** Synthesize a minimal baseline-JPEG header (SOI + a 16-byte JFIF APP0
    * segment + the SOF0 frame header through the component count) as a
    * binary column — the JPEG counterpart of [[pngHeaderPayload]]. The SOF
    * walk must cross the APP0 segment to find the dimensions, so decoding
    * this fixture exercises the real variable-offset path.
    */
  def jpegHeaderPayload(width: Column, height: Column): Column =
    unhex(concat(
      lit("FFD8" +                                   // SOI
        "FFE000104A46494600010100000100010000" +     // APP0 "JFIF", len 16
        "FFC0001108"),                               // SOF0, len 17, 8-bit
      lpad(hex(height), 4, "0"), lpad(hex(width), 4, "0"),
      lit("03")))                                    // 3 components

  /** Deterministic stand-in for a learned image/audio encoder: `dim`
    * pseudo-random floats in [-1, 1) seeded by the payload bytes (seeded
    * xxhash64 per dimension). The REAL part is the plumbing — an
    * `array<double>` feature column derived per-row from binary inside
    * codegen, partition-parallel, ready for the Similarity operators.
    * Swap the body for a genuine encoder (mapPartitions over a batched
    * model) without touching any consumer.
    */
  def fakeEmbedding(payload: Column, dim: Int = 16): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (pmod(xxhash64(payload, i), lit(2000000L)).cast("double") -
        lit(1000000.0)) / lit(1000000.0))

  /** Fixed-size frame sampling over an opaque media payload: every
    * `stride`-th window of `frameSize` bytes, as an array of binary frames
    * (video frame-sample / audio clip plumbing; short final frames are
    * kept as-is by binary substring semantics).
    */
  def sampleFrames(payload: Column, frameSize: Int, stride: Int): Column =
    when(length(payload) === 0, array().cast("array<binary>"))
      .otherwise(transform(
        sequence(lit(0),
          ceil(length(payload).cast("double") / stride).cast("int") - 1),
        k => substring(payload, k * stride + 1, lit(frameSize))))

  /** Decode + project typed metadata for a (id, payload) frame — the shape
    * a multimodal ingest pipeline hangs off a scan.
    */
  def withImageMeta(df: DataFrame, payloadCol: String = "payload"): DataFrame =
    df.withColumn("media_meta", imageMeta(col(payloadCol)))
      .withColumn("n_bytes", length(col(payloadCol)).cast("long"))

  /** Partition-batched decoder plumbing: run an arbitrary per-partition
    * decoder (a real codec / model loaded ONCE per partition, amortized
    * over its rows — the Scala analog of `mapInPandas` batch shape) over
    * (doc_id, payload) and return (doc_id, feature). The default decoder
    * is a deterministic stub (this container ships no codecs); swap it for
    * a real one without touching the plumbing, schema, or partitioning.
    */
  def decodeBatched(df: DataFrame, payloadCol: String = "payload",
                    decoder: Array[Byte] => Array[Float] = stubDecoder(16))
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup happens HERE (model/codec init), once,
        // then streams the partition through it
        it.map { case (id, bytes) => (id, decoder(bytes)) }
      }
      .toDF("doc_id", "feature")
  }

  /** Deterministic stand-in decoder: `dim` floats in [-1, 1) from a
    * rolling hash of the payload bytes. Clearly a stub — it reads the
    * bytes, not the image. Kept as [[decodeBatched]]'s default because it
    * accepts ANY payload; [[imageIoDecoder]] is the real-pixel path for
    * the formats the JDK ships codecs for.
    */
  def stubDecoder(dim: Int): Array[Byte] => Array[Float] = { bytes =>
    var h = 1125899906842597L
    bytes.foreach(b => h = h * 31 + b)
    Array.tabulate(dim) { i =>
      val x = h * 6364136223846793005L + i * 1442695040888963407L
      ((x >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
    }
  }

  /** REAL pixel decode via `javax.imageio` — the PNG/JPEG/GIF/BMP codecs
    * every headless JRE ships, so "this container has no image libs" does
    * not apply to these formats. Returns a fixed-layout feature vector:
    *
    * `[width, height, then grid×grid cells × (meanR, meanG, meanB)]`,
    *
    * channel means in [0, 1], cells row-major, each pixel binned to cell
    * `(y*grid/h, x*grid/w)` — i.e. average-pooled RGB at `grid`×`grid`
    * resolution (with `grid` ≥ image dims, the cells ARE the pixels, which
    * is what the spec pins against a hand-deflated PNG). Non-decodable
    * payloads return null, so callers can route them to the metadata-only
    * path ([[imageMeta]]) with a plain null filter.
    *
    * Scale shape: pass it to [[decodeBatched]] — decode runs
    * partition-parallel over the scan, one in-memory image at a time
    * (`ImageIO.setUseCache(false)` keeps the JDK from spilling each decode
    * to a temp file). Feature size is O(grid²), independent of image size.
    */
  def imageIoDecoder(grid: Int = 4): Array[Byte] => Array[Float] = {
    bytes => {
      // inside the lambda, not at construction: the decoder is BUILT on
      // the driver but RUNS on executors, and setUseCache is a JVM-static
      // flag — setting it here (an idempotent boolean store) keeps every
      // executor from spilling each decode to a disk cache file
      javax.imageio.ImageIO.setUseCache(false)
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) null
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Double](grid * grid * 3)
        val counts = new Array[Long](grid * grid)
        var y = 0
        while (y < h) {
          val cy = y.toLong * grid / h
          var x = 0
          while (x < w) {
            val cell = (cy * grid + x.toLong * grid / w).toInt
            val rgb = img.getRGB(x, y)
            sums(cell * 3) += (rgb >> 16) & 0xFF
            sums(cell * 3 + 1) += (rgb >> 8) & 0xFF
            sums(cell * 3 + 2) += rgb & 0xFF
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        val out = new Array[Float](2 + grid * grid * 3)
        out(0) = w.toFloat
        out(1) = h.toFloat
        var c = 0
        while (c < grid * grid) {
          if (counts(c) > 0) {
            var ch = 0
            while (ch < 3) {
              out(2 + c * 3 + ch) =
                (sums(c * 3 + ch) / counts(c) / 255.0).toFloat
              ch += 1
            }
          }
          c += 1
        }
        out
      }
    }
  }

  /** [[decodeBatched]] wired to the real JDK codec path: (doc_id, feature)
    * with [[imageIoDecoder]]'s pooled-RGB layout, null feature for
    * payloads no installed reader decodes.
    */
  def decodeImages(df: DataFrame, payloadCol: String = "payload",
                   grid: Int = 4): DataFrame =
    decodeBatched(df, payloadCol, imageIoDecoder(grid))

  /** Perceptual difference hash (dHash, the standard 64-bit variant —
    * e.g. Krawetz 2013, "Kind of Like That"): decode, area-average down
    * to a 9×8 grayscale grid, emit bit (y·8+x) = 1 iff cell (y, x) is
    * brighter than its right neighbor. Gradient DIRECTION survives
    * re-encoding, resizing, and brightness/contrast scaling — the
    * transformations that defeat byte-level dedup of images — so
    * near-identical images land within a few Hamming bits.
    *
    * Exactness: grayscale sums use integer ITU-R 601 weights
    * (299r + 587g + 114b) accumulated as longs, and the brighter-than
    * comparison CROSS-MULTIPLIES sums by counts (`sumL·cntR > sumR·cntL`)
    * so no division ever rounds — the hash is a pure integer function of
    * the decoded pixels. Images smaller than 9×8 (no meaningful
    * gradient grid) and undecodable payloads return null.
    */
  def dhash64: Array[Byte] => java.lang.Long = { bytes =>
    javax.imageio.ImageIO.setUseCache(false)
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null || img.getWidth < 9 || img.getHeight < 8) null
    else {
      val w = img.getWidth
      val h = img.getHeight
      val sums = new Array[Long](8 * 9)
      val counts = new Array[Long](8 * 9)
      var y = 0
      while (y < h) {
        val cy = (y.toLong * 8 / h).toInt
        var x = 0
        while (x < w) {
          val cell = cy * 9 + (x.toLong * 9 / w).toInt
          val rgb = img.getRGB(x, y)
          sums(cell) += 299L * ((rgb >> 16) & 0xFF) +
            587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)
          counts(cell) += 1
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          val l = cy * 9 + cx
          val r = l + 1
          if (sums(l) * counts(r) > sums(r) * counts(l))
            hash |= 1L << (cy * 8 + cx)
          cx += 1
        }
        cy += 1
      }
      java.lang.Long.valueOf(hash)
    }
  }

  /** [[decodeBatched]]'s plumbing for LONG-valued per-payload hashes:
    * (doc_id, phash nullable) with the hasher initialized per partition.
    */
  def hashBatched(df: DataFrame, payloadCol: String,
                  hasher: Array[Byte] => java.lang.Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, bytes) =>
        (id, Option(hasher(bytes)).map(_.longValue))
      })
      .toDF("doc_id", "phash")
  }

  /** Image near-duplicate pairs: [[dhash64]] per payload, then the
    * chunk-bucketed Hamming join ([[Dedup.hammingNearDups]] — the q24
    * machinery over precomputed signatures, never all-pairs). Payloads
    * that do not decode simply produce no pairs. Output (i, j, hamming).
    */
  def imageNearDups(df: DataFrame, payloadCol: String = "payload",
                    maxHamming: Int = 3): DataFrame =
    Dedup.hammingNearDups(
      hashBatched(df, payloadCol, dhash64).filter(col("phash").isNotNull),
      maxHamming, bits = 64, sigCol = "phash")

  /** REAL audio decode via `javax.sound.sampled` — the WAV/AIFF/AU PCM
    * codecs every headless JRE ships (compressed formats — MP3, AAC —
    * have no JDK codec and still route to header decode + the declared
    * stand-in). Returns a fixed-layout feature vector:
    *
    * `[sampleRate, channels, nFrames, rms_0..rms_{pool-1}, peak]`,
    *
    * where the PCM stream (8-bit signed/unsigned or 16-bit signed,
    * either endianness; channels averaged to mono) is normalized to
    * [-1, 1], split into `pool` equal windows each contributing its RMS,
    * and `peak` is the absolute maximum. Non-decodable payloads (or PCM
    * shapes outside the supported set) return null.
    *
    * Scale shape: pass to [[decodeBatched]] — partition-parallel, one
    * in-memory clip at a time, feature size O(pool) independent of clip
    * length. Whole-clip decode per row is the batch contract (clips,
    * not hour-long masters — window unbounded payloads upstream with
    * [[sampleFrames]]).
    */
  def audioDecoder(pool: Int = 8): Array[Byte] => Array[Float] = {
    require(pool >= 1, s"pool must be >= 1, got $pool")
    bytes => {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val in =
        try AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (in == null) null
      else try {
        val f = in.getFormat
        val bits = f.getSampleSizeInBits
        val ch = f.getChannels
        val enc = f.getEncoding
        val supported = ch >= 1 && (
          (bits == 16 && enc == AudioFormat.Encoding.PCM_SIGNED) ||
          (bits == 8 && (enc == AudioFormat.Encoding.PCM_SIGNED ||
            enc == AudioFormat.Encoding.PCM_UNSIGNED)))
        if (!supported) null
        else {
          val raw = in.readAllBytes()
          val bps = bits / 8
          val frameBytes = bps * ch
          val n = raw.length / frameBytes
          if (n == 0) null
          else {
            val mono = new Array[Double](n)
            var i = 0
            while (i < n) {
              var s = 0.0
              var c = 0
              while (c < ch) {
                val off = i * frameBytes + c * bps
                s += (if (bits == 8) {
                  (if (enc == AudioFormat.Encoding.PCM_SIGNED)
                    raw(off).toDouble
                  else ((raw(off) & 0xFF) - 128).toDouble) / 128.0
                } else {
                  // high byte sign-extends through the shift, so the OR
                  // yields the signed 16-bit value directly
                  val v =
                    if (f.isBigEndian)
                      (raw(off).toInt << 8) | (raw(off + 1) & 0xFF)
                    else (raw(off + 1).toInt << 8) | (raw(off) & 0xFF)
                  v / 32768.0
                })
                c += 1
              }
              mono(i) = s / ch
              i += 1
            }
            val out = new Array[Float](3 + pool + 1)
            out(0) = f.getSampleRate
            out(1) = ch.toFloat
            out(2) = n.toFloat
            var peak = 0.0
            var w = 0
            while (w < pool) {
              val a = (w.toLong * n / pool).toInt
              val b = ((w + 1).toLong * n / pool).toInt
              var ss = 0.0
              var j = a
              while (j < b) {
                ss += mono(j) * mono(j)
                peak = math.max(peak, math.abs(mono(j)))
                j += 1
              }
              out(3 + w) = if (b > a) math.sqrt(ss / (b - a)).toFloat else 0f
              w += 1
            }
            out(3 + pool) = peak.toFloat
            out
          }
        }
      } catch { case _: Exception => null }
      finally in.close()
    }
  }

  /** [[decodeBatched]] wired to [[audioDecoder]]: (doc_id, feature) with
    * the pooled-RMS layout, null for payloads no JDK reader decodes.
    */
  def decodeAudio(df: DataFrame, payloadCol: String = "payload",
                  pool: Int = 8): DataFrame =
    decodeBatched(df, payloadCol, audioDecoder(pool))
}
