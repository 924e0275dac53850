package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((0L, "hello world"), (1L, "jpeg payload"), (2L, "raw bytes"),
    (3L, "的是不了在")) // multibyte: byte length != char length
    .toDF("id", "payload")
    .withColumn("bin", Multimodal.fakeMedia($"payload", $"id"))

  test("sniffFormat reads the magic bytes, not the id") {
    val got = rows(docs.select($"id", Multimodal.sniffFormat($"bin")).orderBy("id"))
    assert(got == Seq(Seq(0L, "png"), Seq(1L, "jpeg"), Seq(2L, "unknown"), Seq(3L, "png")))
  }

  test("nBytes counts bytes (UTF-8), not characters") {
    val got = rows(docs.filter($"id" === 3).select(Multimodal.nBytes($"bin"))).head.head
    assert(got == 5 * 3 + 33L) // 5 CJK chars x 3 bytes + 33-byte PNG header
  }

  test("frameWindows slices fixed windows at stride; short tail truncates") {
    val w = rows(docs.filter($"id" === 2)
      .select(Multimodal.frameWindows($"bin", 3, 4, 4))).head.head
      .asInstanceOf[scala.collection.Seq[String]]
    // "raw bytes" = 9 bytes -> windows at offsets 0,4,8: 4+4+1 bytes
    assert(w.map(_.length) == Seq(8, 8, 2))
    assert(w.head == "72617720") // "raw "
  }

  test("decodeDims recovers the embedded PNG/JPEG dims from the bytes; unknown -> null") {
    val got = rows(docs.select($"id",
      Multimodal.decodeDims($"bin").getField("width"),
      Multimodal.decodeDims($"bin").getField("height")).orderBy("id"))
    // width = id % 640 + 1, height = id % 480 + 1 — but read back from
    // the IHDR / SOF0 bytes, not recomputed from the id.
    assert(got == Seq(
      Seq(0L, 1L, 1L),      // png
      Seq(1L, 2L, 2L),      // jpeg (APP0 padded by 1 byte)
      Seq(2L, null, null),  // no header
      Seq(3L, 4L, 4L)))     // png
  }

  test("decodeDims is robust to corrupt/markerless binaries (no crash, null dims)") {
    val weird = Seq(
      (0L, Array[Byte](0xFF.toByte, 0xD8.toByte)), // bare SOI, truncated
      (1L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xD9.toByte)), // SOI+EOI
      (2L, Array.fill[Byte](64)(0x00))) // not media at all
      .toDF("id", "bin")
    val got = rows(weird.select(Multimodal.decodeDims($"bin").getField("width")))
    assert(got.flatten.forall(_ == null))
  }

  import graft.functions.{ImageOps, MediaUtil}

  test("decodeResize: real ImageIO decode of a real PNG, aspect-fit downsample") {
    val d = Seq(
      (0L, ImageOps.solidPng(64, 32, 200, 100, 50)),  // landscape, needs resize
      (1L, ImageOps.solidPng(8, 6, 1, 2, 3)),         // already fits: no-op
      (2L, ImageOps.solidPng(3, 48, 255, 0, 128)))    // extreme aspect: floor >= 1
      .toDF("id", "img")
    val st = Multimodal.decodeResize($"img", 16)
    val got = rows(d.select($"id", st.getField("width"), st.getField("height"),
      st.getField("out_w"), st.getField("out_h"),
      st.getField("avg_r"), st.getField("avg_g"), st.getField("avg_b")).orderBy("id"))
    assert(got == Seq(
      Seq(0L, 64L, 32L, 16L, 8L, 200L, 100L, 50L),
      Seq(1L, 8L, 6L, 8L, 6L, 1L, 2L, 3L),
      Seq(2L, 3L, 48L, 1L, 16L, 255L, 0L, 128L)))
  }

  test("decodeResize: structured-header fakes and junk bytes decode to null") {
    // fakeMedia bytes have valid PNG/JPEG HEADERS but garbage payloads —
    // a real codec must reject them, not hallucinate pixels.
    val got = rows(docs.select(Multimodal.decodeResize($"bin", 16)))
    assert(got.flatten.forall(_ == null))
    val junk = Seq((0L, Array.fill[Byte](32)(0x55))).toDF("id", "img")
    assert(rows(junk.select(Multimodal.decodeResize($"img", 16))).flatten
      .forall(_ == null))
  }

  test("decodeResize handles REAL JPEGs too (lossy: dims exact, color near)") {
    // The JDK JPEG codec round trip: dimensions must decode exactly;
    // solid-color channel means land within JPEG quantization error
    // (not oracle-able, hence unit-level).
    val img = new java.awt.image.BufferedImage(40, 30,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 40; y <- 0 until 30) img.setRGB(x, y, (120 << 16) | (80 << 8) | 200)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val d = Seq((1L, bos.toByteArray)).toDF("id", "img")
    val st = Multimodal.decodeResize($"img", 16)
    val r = d.select(st.getField("width"), st.getField("height"),
      st.getField("out_w"), st.getField("out_h"),
      st.getField("avg_r"), st.getField("avg_g"), st.getField("avg_b"))
      .collect().head
    assert(r.getLong(0) == 40L && r.getLong(1) == 30L)
    assert(r.getLong(2) == 16L && r.getLong(3) == 12L)
    assert(math.abs(r.getLong(4) - 120L) <= 8 && math.abs(r.getLong(5) - 80L) <= 8 &&
      math.abs(r.getLong(6) - 200L) <= 8, s"jpeg color drifted: $r")
  }

  test("fitDims integer arithmetic matches the oracle's // semantics") {
    assert(ImageOps.fitDims(64, 48, 16) == (16, 12))
    assert(ImageOps.fitDims(48, 64, 16) == (12, 16))
    assert(ImageOps.fitDims(16, 16, 16) == (16, 16))
    assert(ImageOps.fitDims(17, 1, 16) == (16, 1)) // 1*16/17 floors to 0 -> clamped 1
    assert(ImageOps.fitDims(1, 1, 16) == (1, 1))
  }

  import graft.functions.{Mp4Util, WavUtil}

  private def hexBytes(h: String): Array[Byte] = {
    val s = h.replaceAll("\\s+", "")
    Array.tabulate(s.length / 2)(i =>
      Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  test("mp4Meta: hand-written box tree decodes byte-exactly; walks skip free") {
    // Minimal hand-laid-out MP4: ftyp(16) + free(11: 3 pad bytes) +
    // moov( mvhd(timescale 600, duration 1200 -> 2000 ms) +
    // video trak(tkhd 320x240) ). Offsets written by hand, NOT by the
    // fakeMp4 generator — pins the walker against the spec itself.
    val matrix = "00010000" + "00000000" * 3 + "00010000" + "00000000" * 3 + "40000000"
    val mvhd = "0000006c 6d766864 00000000 00000000 00000000" +
      "00000258" + // timescale 600
      "000004b0" + // duration 1200 ticks
      "00010000 0100 0000" + "00" * 8 + matrix + "00" * 24 + "00000002"
    val tkhd = "0000005c 746b6864 00000007 00000000 00000000" +
      "00000001 00000000 000004b0" + "00" * 8 + "0000 0000 0000 0000" +
      matrix + "01400000" + "00f00000" // 320.0 x 240.0 in 16.16
    val mp4 = hexBytes(
      "00000010 66747970 69736f6d 00000200" + // ftyp
        "0000000b 66726565 000000" +          // free with 3 pad bytes
        "000000d8 6d6f6f76" + mvhd +          // moov (8 + 108 + 100)
        "00000064 7472616b" + tkhd)           // trak
    assert(Mp4Util.mp4Meta(mp4).toSeq == Seq(320L, 240L, 2000L, 1L))
    // Corrupt zero-size box: refuses instead of looping.
    val corrupt = mp4.clone(); corrupt(16) = 0; corrupt(17) = 0; corrupt(18) = 0; corrupt(19) = 0
    assert(Mp4Util.mp4Meta(corrupt) == null)
    // 32-bit size wrap (0xFFFFFFF8: .toInt would walk BACKWARDS): null,
    // never a hang or negative index.
    val wrap = mp4.clone()
    wrap(16) = 0xFF.toByte; wrap(17) = 0xFF.toByte
    wrap(18) = 0xFF.toByte; wrap(19) = 0xF8.toByte
    assert(Mp4Util.mp4Meta(wrap) == null)
    // Box size overshooting the buffer: corrupt metadata, null.
    val overshoot = mp4.clone(); overshoot(16) = 0x7F.toByte
    assert(Mp4Util.mp4Meta(overshoot) == null)
    // Non-MP4 bytes.
    assert(Mp4Util.mp4Meta("RIFFxxxxWAVE".getBytes("UTF-8")) == null)
  }

  test("wavMeta: hand-written RIFF chunks decode byte-exactly; walks skip junk") {
    // 2ch, 22050 Hz, 16-bit PCM; a 5-byte odd-sized junk chunk (word
    // padding exercised) then 88200 data bytes declared -> 1000 ms.
    val wav = hexBytes(
      "52494646 ba580100 57415645" +                     // RIFF size WAVE
        "666d7420 10000000 0100 0200 22560000 88580100 0400 1000" + // fmt
        "6a756e6b 05000000 1122334455 00" +              // junk(5) + pad
        "64617461 88580100")                             // data size 88200
    assert(WavUtil.wavMeta(wav).toSeq == Seq(2L, 22050L, 16L, 1000L))
    assert(WavUtil.wavMeta("not a wav at all".getBytes("UTF-8")) == null)
    // fmt chunk declaring size < 16: its fields would be read from the
    // NEXT chunk's bytes — must be treated as corrupt (skipped, -> null
    // when no other fmt exists), never parsed as garbage.
    val shortFmt = hexBytes(
      "52494646 24000000 57415645" +
        "666d7420 08000000 0100 0200 22560000" + // fmt declares 8 bytes
        "64617461 04000000 01020304")
    assert(WavUtil.wavMeta(shortFmt) == null)
  }

  test("wavPcmStats: hand-written PCM decodes byte-exactly per width and channel") {
    import graft.functions.WavPcmUtil
    // 16-bit stereo, 2 frames: L = [1, -2], R = [256, -32768].
    val wav16 = hexBytes(
      "52494646 24000000 57415645" +
        "666d7420 10000000 0100 0200 22560000 88580100 0400 1000" +
        "64617461 08000000" +
        "0100" + "0001" +      // frame 0: L=1, R=256
        "feff" + "0080")       // frame 1: L=-2, R=-32768
    val s16 = WavPcmUtil.pcmStats(wav16)
    assert(s16.map(_.toSeq).toSeq == Seq(
      Seq(0L, 2L, -1L, 2L),           // L: sum 1+(-2), peak 2
      Seq(1L, 2L, 256L - 32768L, 32768L)))
    // 24-bit mono: samples [0x000001, 0x800000(min=-8388608)], plus a
    // TRUNCATED third frame (2 of 3 bytes) that must be ignored.
    val wav24 = hexBytes(
      "52494646 20000000 57415645" +
        "666d7420 10000000 0100 0100 22560000 88580100 0300 1800" +
        "64617461 08000000" +
        "010000" + "000080" + "ffff")
    val s24 = WavPcmUtil.pcmStats(wav24)
    assert(s24.map(_.toSeq).toSeq == Seq(Seq(0L, 2L, 1L - 8388608L, 8388608L)))
    // 8-bit mono: unsigned bytes centered at 128 -> [0, 127, -128].
    val wav8 = hexBytes(
      "52494646 1f000000 57415645" +
        "666d7420 10000000 0100 0100 22560000 88580100 0100 0800" +
        "64617461 03000000" + "80" + "ff" + "00")
    assert(WavPcmUtil.pcmStats(wav8).map(_.toSeq).toSeq ==
      Seq(Seq(0L, 3L, -1L, 128L)))
    // Non-PCM format tag (0x0003 = IEEE float): null, not garbage.
    val wavF = hexBytes(
      "52494646 14000000 57415645" +
        "666d7420 10000000 0300 0100 22560000 88580100 0400 2000" +
        "64617461 04000000 00000000")
    assert(WavPcmUtil.pcmStats(wavF) == null)
    // Data chunk declaring MORE bytes than the buffer holds: bounded by
    // the physical tail, not the lying header.
    val wavLie = hexBytes(
      "52494646 18000000 57415645" +
        "666d7420 10000000 0100 0100 22560000 88580100 0200 1000" +
        "64617461 ffff0000" + "0500" + "0700")
    assert(WavPcmUtil.pcmStats(wavLie).map(_.toSeq).toSeq ==
      Seq(Seq(0L, 2L, 12L, 7L)))
    assert(WavPcmUtil.pcmStats("not a wav".getBytes("UTF-8")) == null)
  }

  test("wavPcmStats expression matches the util through codegen and explode") {
    val d = Seq((1L, "stereo payload text!"), (4L, "mono 24-bit sample payload"))
      .toDF("id", "payload")
      .withColumn("bin", Multimodal.fakeAv($"payload", $"id"))
    val got = d.select($"id", explode(Multimodal.wavPcmStats($"bin")).as("c"))
      .select($"id", $"c.channel", $"c.n_frames", $"c.sum_raw", $"c.peak_raw")
      .orderBy("id", "channel").collect()
    got.foreach { r =>
      val payload = if (r.getLong(0) == 1L) "stereo payload text!"
        else "mono 24-bit sample payload"
      val b = payload.getBytes("UTF-8")
      val id = r.getLong(0)
      val ch = (id % 2 + 1).toInt; val bp = (id % 2 + 2).toInt
      val nf = b.length / (ch * bp)
      val c = r.getLong(1).toInt
      val vals = (0 until nf).map { f =>
        val o = f * ch * bp + c * bp
        if (bp == 2) (((b(o) & 0xFF) | (b(o + 1) << 8)).toShort).toLong
        else {
          val u = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) | ((b(o + 2) & 0xFF) << 16)
          if (u >= 0x800000) u - 0x1000000 else u.toLong
        }
      }
      assert(r.getLong(2) == nf.toLong)
      assert(r.getLong(3) == vals.sum)
      assert(r.getLong(4) == vals.map(math.abs).max)
    }
    assert(got.length == 3) // id 1: 2 channels, id 4: 1 channel
  }

  test("fakeAv -> mp4Meta/wavMeta round trip recovers the embedded values") {
    val d = Seq((0L, "video payload"), (1L, "audio payload bytes"),
      (2L, "plain"), (3L, "more video"), (4L, "more audio"))
      .toDF("id", "payload")
      .withColumn("bin", Multimodal.fakeAv($"payload", $"id"))
    val v = Multimodal.mp4Meta($"bin")
    val a = Multimodal.wavMeta($"bin")
    val got = rows(d.select($"id", v.getField("width"), v.getField("duration_ms"),
      v.getField("n_tracks"), a.getField("channels"), a.getField("sample_rate"),
      a.getField("duration_ms")).orderBy("id"))
    // id 0: mp4 w=1 dur=40 tracks=1; id 3: mp4 w=4 dur=43 tracks=2
    assert(got(0) == Seq(0L, 1L, 40L, 1L, null, null, null))
    assert(got(3) == Seq(3L, 4L, 43L, 2L, null, null, null))
    // id 1: wav ch=2 rate=16000 bits=24: byteRate=96000, 19 bytes -> 0 ms
    assert(got(1) == Seq(1L, null, null, null, 2L, 16000L, 0L))
    // id 4: wav ch=1 rate=8000 bits=16: byteRate=16000, 10 bytes -> 0 ms
    assert(got(4) == Seq(4L, null, null, null, 1L, 8000L, 0L))
    // id 2: neither
    assert(got(2) == Seq(2L, null, null, null, null, null, null))
  }

  private def jpeg(segments: Array[Byte]*): Array[Byte] =
    Array[Byte](0xFF.toByte, 0xD8.toByte) ++ segments.flatten

  private def seg(marker: Int, body: Array[Byte]): Array[Byte] = {
    val len = body.length + 2
    Array[Byte](0xFF.toByte, marker.toByte, (len >> 8).toByte, (len & 0xFF).toByte) ++ body
  }

  private def sof(marker: Int, h: Int, w: Int): Array[Byte] =
    seg(marker, Array[Byte](8, (h >> 8).toByte, (h & 0xFF).toByte,
      (w >> 8).toByte, (w & 0xFF).toByte, 0))

  test("jpegDimsPacked walks multi-segment chains to any SOFn, stops at SOS/EOI") {
    // Two APPn segments, a comment, then progressive SOF2 at a deep offset.
    val deep = jpeg(seg(0xE0, Array.fill[Byte](14)(0)), seg(0xE1, Array.fill[Byte](100)(7)),
      seg(0xFE, "a comment".getBytes("UTF-8")), sof(0xC2, 1080, 1920))
    assert(MediaUtil.jpegDimsPacked(deep) == (1080L << 16 | 1920L))
    // SOS before any SOF: dims unrecoverable, not an infinite walk.
    val sosFirst = jpeg(seg(0xDA, Array[Byte](1, 1)), sof(0xC0, 4, 4))
    assert(MediaUtil.jpegDimsPacked(sosFirst) == -1L)
    // Zero-length segment (corrupt) must not loop.
    val corrupt = jpeg(Array[Byte](0xFF.toByte, 0xE0.toByte, 0, 0), sof(0xC0, 4, 4))
    assert(MediaUtil.jpegDimsPacked(corrupt) == -1L)
    // DHT (C4) is a table, not a frame header — walked over, not parsed as SOF.
    val dht = jpeg(seg(0xC4, Array.fill[Byte](16)(1)), sof(0xC0, 33, 44))
    assert(MediaUtil.jpegDimsPacked(dht) == (33L << 16 | 44L))
    assert(MediaUtil.jpegDimsPacked("PNG?".getBytes("UTF-8")) == -1L)
  }
}
