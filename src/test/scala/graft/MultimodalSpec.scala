package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Byte-level contracts for the multimodal operator: header decode must
  * read the actual bytes (big-endian PNG, little-endian GIF), fall back
  * cleanly on unknown payloads, and the feature/frame plumbing must be
  * deterministic with the declared shapes.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("PNG header round-trip: synthesized payload decodes to its dimensions") {
    val df = Seq((1L, 640L, 480L), (2L, 1L, 1L), (3L, 65535L, 3L))
      .toDF("id", "w", "h")
      .select(col("id"), Multimodal.pngHeaderPayload(col("w"), col("h")).as("payload"))
    val meta = Multimodal.withImageMeta(df)
      .select(col("id"), col("media_meta.format"), col("media_meta.width"),
        col("media_meta.height"), col("n_bytes"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(meta.toSet === Set((1L, "png", 640L, 480L, 29L),
      (2L, "png", 1L, 1L, 29L), (3L, "png", 65535L, 3L, 29L)))
  }

  test("GIF logical-screen dimensions decode little-endian") {
    // "GIF89a" + width 320 (0x0140 → LE 40 01) + height 200 (0x00C8 → LE C8 00)
    val df = Seq(Tuple1(1L)).toDF("id")
      .select(col("id"), unhex(lit("4749463839614001C80000")).as("payload"))
    val r = df.select(Multimodal.format(col("payload")),
      Multimodal.gifWidth(col("payload")), Multimodal.gifHeight(col("payload"))).head()
    assert((r.getString(0), r.getLong(1), r.getLong(2)) === ("gif", 320L, 200L))
  }

  test("JPEG magic detected; truncated header dims null; unknown falls through") {
    val df = Seq(("jpeg", "FFD8FFE000104A464946"), ("junk", "DEADBEEF"))
      .toDF("tag", "hex").select(col("tag"), unhex(col("hex")).as("payload"))
    val rows = df.select(col("tag"), Multimodal.imageMeta(col("payload")).as("m"))
      .select(col("tag"), col("m.format"), col("m.width")).collect()
      .map(r => (r.getString(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(rows.toSet === Set(("jpeg", "jpeg", -1L), ("junk", "unknown", -1L)))
  }

  test("JPEG header round-trip: synthesized SOI+APP0+SOF0 decodes its dims") {
    val df = Seq((1L, 640L, 480L), (2L, 1L, 1L), (3L, 65535L, 3L))
      .toDF("id", "w", "h")
      .select(col("id"), Multimodal.jpegHeaderPayload(col("w"), col("h")).as("payload"))
    val meta = Multimodal.withImageMeta(df)
      .select(col("id"), col("media_meta.format"), col("media_meta.width"),
        col("media_meta.height"), col("n_bytes"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(meta.toSet === Set((1L, "jpeg", 640L, 480L, 30L),
      (2L, "jpeg", 1L, 1L, 30L), (3L, "jpeg", 65535L, 3L, 30L)))
  }

  test("JPEG SOF walk: variable segments, fill bytes, SOF2, TEM, malformed") {
    // hand-built headers; expected (width, height), -1L = null
    val vectors = Seq(
      // APP1 "Exif\0\0" then DQT then progressive SOF2: h=256, w=512
      ("exif_sof2", "FFD8" + "FFE10008457869660000" + "FFDB0005000102" +
        "FFC2001108" + "0100" + "0200" + "03", 512L, 256L),
      // fill byte (extra FF) before SOF0: h=200, w=100
      ("fill_bytes", "FFD8" + "FF" + "FFC0001108" + "00C8" + "0064" + "03", 100L, 200L),
      // standalone TEM marker (no length field) before SOF0: h=30, w=40
      ("tem_marker", "FFD8" + "FF01" + "FFC0001108" + "001E" + "0028" + "03", 40L, 30L),
      // SOS before any SOF: entropy data follows, walk must stop
      ("sos_first", "FFD8" + "FFDA0002", -1L, -1L),
      // DHT (C4) is NOT a frame header: its bytes must not parse as dims
      ("dht_only", "FFD8" + "FFC400050001020304", -1L, -1L),
      // garbage where a marker should be
      ("bad_marker", "FFD8" + "00C0001108001E002803", -1L, -1L))
    val df = vectors.map { case (tag, h, _, _) => (tag, h) }
      .toDF("tag", "hex").select(col("tag"), unhex(col("hex")).as("payload"))
    val got = df.select(col("tag"),
        Multimodal.jpegWidth(col("payload")).as("w"),
        Multimodal.jpegHeight(col("payload")).as("h"))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    assert(got === vectors.map(v => (v._1, v._3, v._4)).toSet)
  }

  test("JPEG SOF walk decodes 200 randomized segment layouts (seeded)") {
    val rnd = new scala.util.Random(42)
    // markers whose segments the walk must SKIP (length-delimited)
    val skippable = Seq(0xE0, 0xE1, 0xE7, 0xEC, 0xED, 0xEE, 0xFE, 0xDB, 0xC4)
    val sofs = Seq(0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC9, 0xCA, 0xCF)
    def hx(b: Int): String = f"$b%02X"
    val cases = (1 to 200).map { i =>
      val sb = new StringBuilder("FFD8")
      // 0–8 skippable segments with random payloads (may contain 0xFF)
      (0 until rnd.nextInt(9)).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 => sb.append("FF01")                       // standalone TEM
          case 1 => sb.append("FF").append(hx(0xD0 + rnd.nextInt(8))) // RSTn
          case 2 => sb.append("FF")                         // fill byte
          case _ =>
            val payload = Array.fill(rnd.nextInt(40))(rnd.nextInt(256))
            sb.append("FF").append(hx(skippable(rnd.nextInt(skippable.length))))
              .append(f"${payload.length + 2}%04X")
              .append(payload.map(hx).mkString)
        }
      }
      val (w, h) = (1 + rnd.nextInt(65535), 1 + rnd.nextInt(65535))
      sb.append("FF").append(hx(sofs(rnd.nextInt(sofs.length))))
        .append("001108").append(f"$h%04X").append(f"$w%04X").append("03")
      (i.toLong, sb.toString, w.toLong, h.toLong)
    }
    val df = cases.map(c => (c._1, c._2)).toDF("id", "hex")
      .select(col("id"), unhex(col("hex")).as("payload"))
    val got = df.select(col("id"), Multimodal.jpegWidth(col("payload")).as("w"),
        Multimodal.jpegHeight(col("payload")).as("h"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    cases.foreach { case (id, _, w, h) =>
      assert(got(id) === (w, h), s"case $id decoded ${got(id)}, expected ($w, $h)")
    }
  }

  test("withResizedHeader rewrites PNG/JPEG dims in place; pass-through else") {
    val df = Seq(
      ("png", 1L), ("jpeg", 2L), ("junk", 3L))
      .toDF("kind", "id")
      .select(col("kind"),
        when(col("kind") === "png",
            Multimodal.pngHeaderPayload(lit(640L), lit(480L)))
          .when(col("kind") === "jpeg",
            // EXIF-style layout: the SOF offset is NOT fixed — the splice
            // must land where the walk finds it
            unhex(lit("FFD8" + "FFE10008457869660000" + "FFC2001108" +
              "01E0" + "0280" + "03")))
          .otherwise(unhex(lit("DEADBEEF"))).as("payload"))
    val resized = df.select(col("kind"),
      Multimodal.withResizedHeader(col("payload"), lit(100L), lit(200L)).as("payload"))
    val meta = Multimodal.withImageMeta(resized)
      .select(col("kind"), col("media_meta.format"),
        col("media_meta.width"), col("media_meta.height"))
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(meta === Set(
      ("png", "png", 100L, 200L),
      ("jpeg", "jpeg", 100L, 200L),
      ("junk", "unknown", -1L, -1L)))
    // only the dimension bytes changed: payload length is preserved
    val lens = df.select(length(col("payload"))).collect().map(_.getInt(0)).toSeq
    val lens2 = resized.select(length(col("payload"))).collect().map(_.getInt(0)).toSeq
    assert(lens === lens2)
  }

  test("fakeEmbedding is deterministic, bounded, and has the declared dim") {
    val df = Seq(("a", "payload-bytes-1"), ("b", "payload-bytes-2"))
      .toDF("id", "s").select(col("id"), col("s").cast("binary").as("payload"))
    val e1 = df.select(col("id"), Multimodal.fakeEmbedding(col("payload"), 16).as("e"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val e2 = df.select(col("id"), Multimodal.fakeEmbedding(col("payload"), 16).as("e"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(e1 === e2, "same bytes must embed identically")
    assert(e1("a").size === 16)
    assert(e1("a") !== e1("b"))
    assert(e1.values.flatten.forall(v => v >= -1.0 && v < 1.0))
  }

  test("decodeBatched runs the partition-batched decoder with stable output") {
    val df = Seq((1L, "payload-one"), (2L, "payload-two"))
      .toDF("doc_id", "s")
      .select(col("doc_id"), col("s").cast("binary").as("payload"))
      .repartition(2)
    val out = Multimodal.decodeBatched(df)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L).size === 16)
    assert(out(1L) !== out(2L))
    // deterministic: same bytes → same features, independent of partitioning
    val again = Multimodal.decodeBatched(df.coalesce(1))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(again === out)
  }

  test("sampleFrames windows the payload with stride and keeps the tail") {
    val df = Seq(Tuple1("abcdefghij")).toDF("s")
      .select(col("s").cast("binary").as("payload"))
    val frames = df.select(Multimodal.sampleFrames(col("payload"), 4, 3).as("f"))
      .head().getSeq[Array[Byte]](0).map(b => new String(b))
    assert(frames === Seq("abcd", "defg", "ghij", "j"))
  }

  test("sampleFrames yields zero frames for an empty payload") {
    val df = Seq(Tuple1("")).toDF("s")
      .select(col("s").cast("binary").as("payload"))
    val frames = df.select(Multimodal.sampleFrames(col("payload"), 4, 3).as("f"))
      .head().getSeq[Array[Byte]](0)
    assert(frames.isEmpty, "no phantom zero-byte frame for empty media")
  }

  test("WAV header round-trip: RIFF chunk walk decodes fmt + data fields, " +
       "with and without a JUNK chunk in the way") {
    val df = Seq(
      (1L, 44100L, 2L, 16L, 1000000L, false),
      (2L, 8000L, 1L, 8L, 123L, true),   // walk must skip JUNK to reach fmt
      (3L, 48000L, 2L, 24L, 7L, true))
      .toDF("id", "sr", "ch", "bps", "dsz", "junk")
      .select(col("id"), Multimodal.wavHeaderPayload(col("sr"), col("ch"),
        col("bps"), col("dsz"), col("junk")).as("payload"))
    val rows = df.select(col("id"), Multimodal.format(col("payload")).as("f"),
        Multimodal.wavMeta(col("payload")).as("m"))
      .select(col("id"), col("f"), col("m.channels"), col("m.sample_rate"),
        col("m.bits_per_sample"), col("m.data_bytes"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(rows === Set(
      (1L, "wav", 2L, 44100L, 16L, 1000000L),
      (2L, "wav", 1L, 8000L, 8L, 123L),
      (3L, "wav", 2L, 48000L, 24L, 7L)))
  }

  test("WAV walk: truncated payload keeps the fields found before the end; " +
       "non-RIFF and RIFF-non-WAVE payloads yield -1s") {
    val full = Multimodal.wavHeaderPayload(lit(16000L), lit(1L), lit(16L),
      lit(999L), lit(false))
    val df = Seq(Tuple1(1L)).toDF("id").select(
      // cut inside the data chunk header: fmt decoded, data size lost
      Multimodal.wavMeta(full.substr(lit(1), lit(40))).as("trunc"),
      Multimodal.wavMeta(lit("not media at all").cast("binary")).as("junk"),
      // "RIFF" + size + "AVI " — a RIFF container that is not WAVE
      Multimodal.wavMeta(unhex(lit("524946460400000041564920"))).as("avi"))
    val r = df.head()
    val trunc = r.getStruct(0)
    assert((trunc.getLong(0), trunc.getLong(1), trunc.getLong(2), trunc.getLong(3))
      === ((1L, 16000L, 16L, -1L)), "fmt fields survive a truncated data chunk")
    assert(r.getStruct(1).getLong(1) === -1L)
    assert(r.getStruct(2).getLong(1) === -1L)
  }

  test("MP4 header round-trip: box walk decodes ftyp/moov/mdat, skips free, " +
       "and follows the 64-bit largesize form") {
    val df = Seq(
      (1L, "isom", 77L, 5000L, false, false),
      (2L, "mp42", 0L, 123L, true, false),   // walk must skip `free`
      (3L, "M4A ", 511L, 7L, true, true))    // largesize mdat
      .toDF("id", "brand", "minor", "msz", "free", "lg")
      .select(col("id"), Multimodal.mp4HeaderPayload(col("brand"), col("minor"),
        col("msz"), col("free"), col("lg")).as("payload"))
    val rows = df.select(col("id"), Multimodal.format(col("payload")).as("f"),
        Multimodal.mp4Meta(col("payload")).as("m"))
      .select(col("id"), col("f"), col("m.major_brand"), col("m.minor_version"),
        col("m.n_boxes"), col("m.mdat_bytes"), col("m.has_moov"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(rows === Set(
      (1L, "mp4", "isom", 77L, 3L, 5000L, 1L),
      (2L, "mp4", "mp42", 0L, 4L, 123L, 1L),
      (3L, "mp4", "M4A ", 511L, 4L, 7L, 1L)))
  }

  test("MP4 walk: EOF-sized box, truncation, undersized box, and foreign " +
       "payloads stop cleanly with whatever was found") {
    val ftypHex = "0000001866747970" + "69736F6D" + "00000000" +
      "69736F6D" + "69736F6D"                       // ftyp isom, minor 0
    val df = Seq(Tuple1(1L)).toDF("id").select(
      // mdat with size32=0: runs to end-of-payload (8 header + 4 data)
      Multimodal.mp4Meta(unhex(lit(ftypHex + "000000006D646174" + "AABBCCDD")))
        .as("eof"),
      // declared size 4 < header 8: malformed → stop, ftyp fields kept
      Multimodal.mp4Meta(unhex(lit(ftypHex + "000000046D646174"))).as("bad"),
      Multimodal.mp4Meta(lit("not media at all").cast("binary")).as("junk"))
    val r = df.head()
    val eof = r.getStruct(0)
    assert((eof.getString(0), eof.getLong(2), eof.getLong(3)) === (("isom", 2L, 4L)),
      "size-0 mdat box spans to EOF")
    val bad = r.getStruct(1)
    assert((bad.getString(0), bad.getLong(2), bad.getLong(3)) === (("isom", 1L, -1L)),
      "undersized box stops the walk after ftyp")
    assert(r.getStruct(2).isNullAt(0) && r.getStruct(2).getLong(2) === 0L)
  }

  test("MP4 fixture is a byte-faithful canonical header (pinned hex)") {
    // isom minor 1, 4-byte mdat, free box, small-size form: hand-computed
    val hx = Seq(Tuple1(1L)).toDF("id")
      .select(hex(Multimodal.mp4HeaderPayload(lit("isom"), lit(1L), lit(4L),
        lit(true), lit(false))).as("h")).head().getString(0)
    assert(hx ===
      "00000018" + "66747970" + "69736F6D" + "00000001" +  // ftyp, 24, isom, 1
        "69736F6D" + "69736F6D" +                          // compat isom, isom
      "00000010" + "66726565" + "00" * 8 +                 // free, 16
      "00000010" + "6D6F6F76" + "00" * 8 +                 // moov stub, 16
      "0000000C" + "6D646174")                             // mdat, 8+4
  }

  test("WAV fixture is a byte-faithful canonical header (pinned hex)") {
    // 8000 Hz mono 8-bit, 4 data bytes, no JUNK: every field hand-computed
    // (byte-rate 8000 = 0x1F40 → LE 401F0000, block align 1)
    val hx = Seq(Tuple1(1L)).toDF("id")
      .select(hex(Multimodal.wavHeaderPayload(lit(8000L), lit(1L), lit(8L),
        lit(4L), lit(false))).as("h")).head().getString(0)
    assert(hx ===
      "52494646" + "24000000" + "57415645" +          // RIFF, size 36, WAVE
      "666D7420" + "10000000" + "0100" + "0100" +     // fmt , 16, PCM, 1 ch
      "401F0000" + "401F0000" + "0100" + "0800" +     // 8000, 8000 B/s, 1, 8
      "64617461" + "04000000")                        // data, 4
  }

  /** A REAL 2×2 truecolor PNG built by hand — signature, IHDR, an IDAT
    * whose zlib stream comes from `java.util.zip.Deflater`, CRC32s from
    * `java.util.zip.CRC32` — so decoding it exercises the JDK codec on
    * bytes no JDK ENCODER produced. Pixels row-major:
    * (255,0,0) (0,255,0) / (0,0,255) (255,255,255).
    */
  private def handBuiltPng(): Array[Byte] = {
    import java.util.zip.{CRC32, Deflater}
    def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
      val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
      val crc = new CRC32
      crc.update(tag.getBytes("US-ASCII"))
      crc.update(data)
      val crcB = java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
      len ++ tag.getBytes("US-ASCII") ++ data ++ crcB
    }
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)
      .map(_.toByte)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(2).putInt(2)                  // width 2, height 2
      .put(8.toByte).put(2.toByte)          // 8-bit, truecolor RGB
      .put(0.toByte).put(0.toByte).put(0.toByte)  // deflate/adaptive/none
      .array()
    // raw scanlines: filter byte 0 + RGB per pixel
    val raw = Array[Int](
      0, 255, 0, 0, 0, 255, 0,              // row 0: red, green
      0, 0, 0, 255, 255, 255, 255           // row 1: blue, white
    ).map(_.toByte)
    val d = new Deflater
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](256)
    val n = d.deflate(buf)
    d.end()
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", buf.take(n)) ++
      chunk("IEND", Array.empty[Byte])
  }

  test("imageIoDecoder decodes ACTUAL pixels from a hand-deflated PNG") {
    // grid = 2 over a 2×2 image: each pooled cell IS one pixel, so the
    // feature vector pins exact pixel values, not just statistics
    val feats = Multimodal.imageIoDecoder(grid = 2)(handBuiltPng())
    assert(feats !== null)
    assert(feats.length === 2 + 2 * 2 * 3)
    assert(feats(0) === 2.0f && feats(1) === 2.0f, "decoded dimensions")
    val px = feats.drop(2).grouped(3).map(_.toSeq).toSeq
    assert(px(0) === Seq(1.0f, 0.0f, 0.0f), "top-left red")
    assert(px(1) === Seq(0.0f, 1.0f, 0.0f), "top-right green")
    assert(px(2) === Seq(0.0f, 0.0f, 1.0f), "bottom-left blue")
    assert(px(3) === Seq(1.0f, 1.0f, 1.0f), "bottom-right white")
  }

  /** A REAL 16-bit mono PCM WAV built by hand (RIFF/fmt/data with exact
    * sizes): 400 frames of silence then 400 frames of a ±16384 square
    * wave — amplitude exactly 0.5 in [-1, 1], so windowed RMS values are
    * EXACT, not approximate.
    */
  private def handBuiltWav(rate: Int = 8000): Array[Byte] = {
    val frames = 800
    val dataLen = frames * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                    // PCM, mono
      .putInt(rate).putInt(rate * 2)              // byte rate
      .putShort(2).putShort(16)                   // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    for (i <- 0 until frames)
      bb.putShort(
        if (i < 400) 0
        else if (i % 2 == 0) 16384 else -16384)
    bb.array()
  }

  test("audioDecoder decodes ACTUAL PCM from a hand-built WAV: exact " +
    "windowed RMS, peak, rate, frame count; non-audio yields null") {
    val feats = Multimodal.audioDecoder(pool = 2)(handBuiltWav())
    assert(feats !== null)
    assert(feats.length === 3 + 2 + 1)
    assert(feats(0) === 8000.0f && feats(1) === 1.0f && feats(2) === 800.0f)
    assert(feats(3) === 0.0f, "first window is silence")
    assert(feats(4) === 0.5f, "square wave at half scale has RMS exactly 0.5")
    assert(feats(5) === 0.5f, "peak")
    // through the partition-batched plumbing, mixed with undecodables
    val rows = Seq((1L, handBuiltWav()), (2L, handBuiltPng()),
      (3L, "definitely not audio".getBytes("UTF-8")))
    import spark.implicits._
    val out = Multimodal.decodeAudio(
        rows.toDF("doc_id", "payload").repartition(2), pool = 2)
      .collect().map(r => r.getLong(0) ->
        Option(r.getSeq[Float](1)).map(_.toSeq)).toMap
    assert(out(1L) === Some(Seq(8000.0f, 1.0f, 800.0f, 0.0f, 0.5f, 0.5f)))
    assert(out(2L) === None, "a PNG is not audio")
    assert(out(3L) === None)
    intercept[IllegalArgumentException](Multimodal.audioDecoder(pool = 0))
  }

  test("decodeImages: real decode through the partition-batched plumbing, " +
    "JPEG decodes approximately, non-images yield null features") {
    // a JPEG from the JDK's own encoder: lossy, so assert tolerance
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x808080)
    val bos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val rows = Seq(
      (1L, handBuiltPng()),
      (2L, bos.toByteArray),
      (3L, "not an image at all".getBytes("UTF-8")))
    val df = rows.toDF("doc_id", "payload").repartition(2)
    val out = Multimodal.decodeImages(df, grid = 1)
      .collect().map(r => r.getLong(0) ->
        Option(r.getSeq[Float](1)).map(_.toSeq)).toMap
    // PNG: mean of red+green+blue+white = (0.5, 0.5, 0.5) exactly
    assert(out(1L) === Some(Seq(2.0f, 2.0f, 0.5f, 0.5f, 0.5f)))
    // JPEG: flat 0x808080 survives DCT within 2/255
    val Some(Seq(jw, jh, jr, jg, jb)) = out(2L)
    assert(jw === 8.0f && jh === 8.0f)
    Seq(jr, jg, jb).foreach(v =>
      assert(math.abs(v - 128f / 255f) < 2f / 255f, s"jpeg gray drifted: $v"))
    assert(out(3L) === None, "undecodable payload must yield null")
  }

  /** Encode an image from a per-pixel RGB function through the JDK PNG
    * ENCODER (the decode spec above pins the decoder against bytes no JDK
    * encoder produced; here encoder+decoder round-trip is fine — dHash
    * tests SEMANTICS of the decoded pixels).
    */
  private def makePng(w: Int, h: Int,
                      f: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dhash64: invariant to resolution and brightness scaling, flips on " +
    "different content, null on tiny/undecodable payloads") {
    // base pattern on the 9×8 grid itself: brightness = a mix of x and y
    // ramps with a diagonal flip, even values so exact halving exists
    def pat(x: Int, y: Int): (Int, Int, Int) = {
      val v = ((x * 24 + y * 10 + (if ((x + y) % 3 == 0) 60 else 0)) % 250) & 0xFE
      (v, v, v)
    }
    val base = Multimodal.dhash64(makePng(9, 8, pat))
    assert(base !== null)
    // pixel-doubling: every cell's sums and counts scale ×4 — same hash
    val doubled = Multimodal.dhash64(
      makePng(18, 16, (x, y) => pat(x / 2, y / 2)))
    assert(doubled === base, "2x resolution must not change the hash")
    // exact brightness halving preserves every brighter-than ordering
    val dimmed = Multimodal.dhash64(makePng(9, 8, (x, y) => {
      val (r, g, b) = pat(x, y); (r / 2, g / 2, b / 2)
    }))
    assert(dimmed === base, "brightness scaling must not change the hash")
    // different content (transposed ramps) is far away in Hamming space
    val other = Multimodal.dhash64(
      makePng(9, 8, (x, y) => pat(y, x min 7)))
    assert(other !== null)
    assert(java.lang.Long.bitCount(base.longValue ^ other.longValue) > 3,
      "different content must exceed the near-dup radius")
    assert(Multimodal.dhash64(makePng(8, 7, pat)) === null,
      "below the 9x8 grid there is no gradient to hash")
    assert(Multimodal.dhash64("not an image".getBytes("UTF-8")) === null)
  }

  test("imageNearDups: re-encoded/resized copies pair up, distinct " +
    "content does not, undecodables drop out silently") {
    import spark.implicits._
    def pat(x: Int, y: Int): (Int, Int, Int) = {
      val v = ((x * 24 + y * 10 + (if ((x + y) % 3 == 0) 60 else 0)) % 250) & 0xFE
      (v, v, v)
    }
    val rows = Seq(
      (1L, makePng(9, 8, pat)),
      (2L, makePng(18, 16, (x, y) => pat(x / 2, y / 2))),   // resized copy
      (3L, makePng(9, 8, (x, y) => pat(y, x min 7))),       // different
      (4L, "garbage".getBytes("UTF-8")))
    val pairs = Multimodal.imageNearDups(
        rows.toDF("doc_id", "payload").repartition(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((1L, 2L, 0L)),
      s"only the resized copy pairs with the original, got $pairs")
  }
}
