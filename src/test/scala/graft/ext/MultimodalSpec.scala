package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Kernels

/** The real image-header decoder (Kernels.imageDims / graft_image_dims
  * / Multimodal.decodeImageDimsBatched): dimension extraction from
  * hand-built PNG / JPEG / GIF byte layouts, every malformed-input
  * class decoding to null (never throwing), and two-path parity across
  * batch boundaries — the contract x_image_dims gates in production.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // A minimal-but-valid PNG head: signature, IHDR length/type, w, h,
  // then bit depth / color type / compression / filter / interlace.
  private def png(w: Int, h: Int): Array[Byte] =
    bytes(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      w >>> 24, (w >> 16) & 0xff, (w >> 8) & 0xff, w & 0xff,
      h >>> 24, (h >> 16) & 0xff, (h >> 8) & 0xff, h & 0xff,
      8, 6, 0, 0, 0)

  // JPEG: SOI, APP0 (JFIF), a COM segment, a fill byte, then SOFn.
  private def jpeg(w: Int, h: Int, sof: Int = 0xc0): Array[Byte] =
    bytes(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 1, 0,
      0, 1, 0, 1, 0, 0,
      0xff, 0xfe, 0x00, 0x04, 'h', 'i', // COM, len 4
      0xff, // fill byte padding the next marker
      0xff, sof, 0x00, 0x11, 8,
      (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff,
      3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)

  private def gif(w: Int, h: Int, ver: Char = '9'): Array[Byte] =
    bytes('G', 'I', 'F', '8', ver, 'a',
      w & 0xff, (w >> 8) & 0xff, h & 0xff, (h >> 8) & 0xff,
      0xf7, 0, 0)

  private def dims(b: Array[Byte]): Option[(String, Int, Int)] =
    Kernels.imageDims(b) match {
      case null => None
      case r => Some((r.getUTF8String(0).toString, r.getInt(1), r.getInt(2)))
    }

  test("kernel parses PNG / JPEG (baseline + progressive) / GIF header dims") {
    assert(dims(png(640, 480)) == Some(("png", 640, 480)))
    assert(dims(png(70000, 3)) == Some(("png", 70000, 3))) // >u16 dims
    assert(dims(jpeg(1024, 768)) == Some(("jpeg", 1024, 768)))
    // Progressive (SOF2) carries dims in the same frame-header layout.
    assert(dims(jpeg(31, 17, sof = 0xc2)) == Some(("jpeg", 31, 17)))
    assert(dims(gif(320, 200)) == Some(("gif", 320, 200)))
    assert(dims(gif(65535, 1, ver = '7')) == Some(("gif", 65535, 1)))
  }

  private def bmp(w: Int, h: Int): Array[Byte] =
    bytes('B', 'M', 0, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0,
      40, 0, 0, 0,
      w & 0xff, (w >> 8) & 0xff, (w >> 16) & 0xff, (w >>> 24) & 0xff,
      h & 0xff, (h >> 8) & 0xff, (h >> 16) & 0xff, (h >>> 24) & 0xff,
      1, 0, 24, 0)

  private def wav(ch: Int, rate: Int, bits: Int): Array[Byte] =
    bytes('R', 'I', 'F', 'F', 0x24, 0, 0, 0, 'W', 'A', 'V', 'E',
      'J', 'U', 'N', 'K', 4, 0, 0, 0, 1, 2, 3, 4, // scanned past
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0, ch & 0xff, (ch >> 8) & 0xff,
      rate & 0xff, (rate >> 8) & 0xff, (rate >> 16) & 0xff,
      (rate >>> 24) & 0xff,
      0, 0, 0, 0, 4, 0, bits & 0xff, (bits >> 8) & 0xff)

  test("BMP dims incl. top-down negative height; WAV fmt scan past junk chunks") {
    assert(dims(bmp(800, 600)) == Some(("bmp", 800, 600)))
    // Top-down BMP: negative height, magnitude is the dimension.
    assert(dims(bmp(31, -17)) == Some(("bmp", 31, 17)))
    assert(dims(bmp(0, 10)) == None) // zero width out of spec
    assert(dims(bmp(8, 8).take(25)) == None) // cut inside height
    def meta(b: Array[Byte]): Option[(String, Int, Int, Int)] =
      graft.functions.Kernels.wavMeta(b) match {
        case null => None
        case r => Some((r.getUTF8String(0).toString, r.getInt(1),
          r.getInt(2), r.getInt(3)))
      }
    assert(meta(wav(2, 44100, 16)) == Some(("wav", 2, 44100, 16)))
    assert(meta(wav(1, 8000, 8)) == Some(("wav", 1, 8000, 8)))
    assert(meta(null) == None)
    assert(meta("RIFFxxxxWAVE".getBytes("UTF-8")) == None) // no fmt
    assert(meta(wav(2, 44100, 16).take(40)) == None) // cut inside fmt
    assert(meta(wav(0, 44100, 16)) == None) // zero channels
    assert(meta("not audio at all, just words".getBytes("UTF-8")) == None)
    // A crafted chunk size near 2^31 must not overflow the cursor into
    // a negative index (the fuzz-found Int-cursor crash): both the
    // max-positive and the max-u32 size walk safely off the end.
    assert(meta(bytes('R', 'I', 'F', 'F', 0x24, 0, 0, 0, 'W', 'A', 'V', 'E',
      'J', 'U', 'N', 'K', 0xff, 0xff, 0xff, 0x7f,
      1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)) == None)
    assert(meta(bytes('R', 'I', 'F', 'F', 0x24, 0, 0, 0, 'W', 'A', 'V', 'E',
      'J', 'U', 'N', 'K', 0xff, 0xff, 0xff, 0xff,
      1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)) == None)
    // Expression + batched twin agree (the x_wav_meta contract).
    val docs = Seq(1L -> wav(2, 48000, 24), 2L -> wav(6, 16000, 8),
      3L -> "junk".getBytes("UTF-8"), 4L -> (null: Array[Byte]))
      .toDF("doc_id", "payload")
    val e = docs.select(col("doc_id"),
        Multimodal.wavMeta(col("payload")).as("m"))
      .select(col("doc_id"), col("m.format"), col("m.channels"),
        col("m.sample_rate"), col("m.bits_per_sample"))
      .orderBy("doc_id").collect()
    val b = Multimodal.decodeWavMetaBatched(docs, "doc_id", "payload",
      batchSize = 2).orderBy("doc_id").collect()
    e.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
    assert(e(0).getInt(3) == 48000 && e(1).getInt(2) == 6)
    assert(e(2).isNullAt(1) && e(3).isNullAt(1))
  }

  test("malformed byte soup decodes to null, never throws") {
    assert(dims(null) == None)
    assert(dims(Array.emptyByteArray) == None)
    assert(dims("plain text, not an image".getBytes("UTF-8")) == None)
    // Truncations at every interesting boundary.
    assert(dims(png(8, 8).take(23)) == None) // PNG cut before height end
    assert(dims(png(8, 8).take(12)) == None) // PNG cut before IHDR type
    assert(dims(jpeg(8, 8).take(30)) == None) // JPEG cut inside SOF
    assert(dims(gif(8, 8).take(9)) == None) // GIF cut inside height
    assert(dims(bytes(0xff, 0xd8)) == None) // bare SOI
    // Wrong chunk where IHDR must be.
    val notIhdr = png(8, 8); notIhdr(12) = 'X'.toByte
    assert(dims(notIhdr) == None)
    // Zero dims are out of spec for all three formats.
    assert(dims(png(0, 8)) == None)
    assert(dims(gif(0, 5)) == None)
    assert(dims(jpeg(0, 9)) == None)
    // SOS before any SOF: a frame-less scan is malformed.
    assert(dims(bytes(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02)) == None)
    // EOI with no frame header.
    assert(dims(bytes(0xff, 0xd8, 0xff, 0xd9)) == None)
    // Desynced marker stream (length points past a non-FF byte).
    assert(dims(bytes(0xff, 0xd8, 0x00, 0xc0, 0x00, 0x11)) == None)
    // Segment length < 2 would loop forever if trusted.
    assert(dims(bytes(0xff, 0xd8, 0xff, 0xfe, 0x00, 0x01, 0xff, 0xc0)) == None)
    // DHT (C4) must NOT be read as a frame header.
    assert(dims(bytes(0xff, 0xd8, 0xff, 0xc4, 0x00, 0x05, 0, 1, 2,
      0xff, 0xd9)) == None)
  }

  test("expression and batched paths agree row-wise, across batch boundaries") {
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> png(100, 200), 2L -> jpeg(300, 400), 3L -> gif(500, 600),
      4L -> "garbage".getBytes("UTF-8"), 5L -> null,
      6L -> png(8, 8).take(20), 7L -> jpeg(12, 34, sof = 0xc2))
    val df = rows.toDF("doc_id", "payload")
    val viaExpr = df.select(col("doc_id"),
        Multimodal.imageDims(col("payload")).as("d"))
      .select(col("doc_id"), col("d.format").as("format"),
        col("d.width").as("width"), col("d.height").as("height"))
    // batchSize 2 forces mid-partition batch boundaries.
    val viaBatch = Multimodal.decodeImageDimsBatched(df, "doc_id",
      "payload", batchSize = 2)
    val e = viaExpr.orderBy("doc_id").collect()
    val b = viaBatch.orderBy("doc_id").collect()
    assert(e.length == rows.length && b.length == rows.length)
    e.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
    // Spot-pin the decoded values themselves.
    val byId = e.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(1) == "png" && byId(1L).getInt(2) == 100 &&
      byId(1L).getInt(3) == 200)
    assert(byId(7L).getString(1) == "jpeg" && byId(7L).getInt(2) == 12)
    Seq(4L, 5L, 6L).foreach(id => assert(byId(id).isNullAt(1) &&
      byId(id).isNullAt(2) && byId(id).isNullAt(3), s"id $id must be null"))
  }

  test("the expression stays codegen'd and null-safe under whole-stage codegen") {
    // A larger frame through the whole-stage path: constructed payloads
    // for even ids, nulls for odd — dims must match the construction.
    val df = spark.range(0, 256).toDF("id")
      .select(col("id"), when(col("id") % 2 === 0,
        // PNG with dims derived from id.
        concat(unhex(lit("89504E470D0A1A0A0000000D49484452")),
          unhex(lpad(hex(col("id") + 1), 8, "0")),
          unhex(lpad(hex(col("id") * 3 + 1), 8, "0")),
          unhex(lit("0806000000")))).as("payload"))
    val got = df.select(col("id"),
        Multimodal.imageDims(col("payload")).as("d"))
      .select(col("id"), col("d.width").as("w"), col("d.height").as("h"))
      .collect()
    got.foreach { r =>
      val id = r.getLong(0)
      if (id % 2 == 0) {
        assert(r.getInt(1) == id + 1 && r.getInt(2) == id * 3 + 1, r.toString)
      } else assert(r.isNullAt(1) && r.isNullAt(2), r.toString)
    }
  }
}
