package graft

import graft.operators.PngCodec
import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

class PngCodecSpec extends SparkSuite {

  // -- reference encoder: real DEFLATE via java.util.zip, real CRCs --
  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    be32(data.length.toLong)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb); out.write(data)
    val crc = new CRC32(); crc.update(tb); crc.update(data)
    be32(crc.getValue)
    out.toByteArray
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length * 2 + 64)
    val n = d.deflate(buf)
    assert(d.finished()); d.end()
    java.util.Arrays.copyOf(buf, n)
  }

  /** Assemble a PNG from pre-filtered scanlines (filter byte included). */
  private def png(w: Int, h: Int, colorType: Int,
                  raw: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >> 24).toByte; ihdr(1) = (w >> 16).toByte
    ihdr(2) = (w >> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >> 24).toByte; ihdr(5) = (h >> 16).toByte
    ihdr(6) = (h >> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = colorType.toByte // depth 8
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", deflate(raw)))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  test("RGB8, filter None: bytes decode verbatim") {
    // 2x2: distinct channel values
    val raw = Array[Byte](
      0, 10, 20, 30, 40, 50, 60,
      0, 70, 80, 90, 100, 110, 120)
    val f = PngCodec.decode(png(2, 2, 2, raw)).get
    assert(f.w == 2 && f.h == 2)
    assert(f.rgb.toSeq == Seq[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120))
  }

  test("all five filter types reconstruct exactly") {
    // 3 wide, 5 rows, RGB: one row per filter type. Compute expected via
    // an independent straightforward defilter here.
    val w = 3; val ch = 3; val stride = w * ch
    val rows = Array(
      (0, Array(1, 2, 3, 4, 5, 6, 7, 8, 9)),
      (1, Array(10, 20, 30, 40, 50, 60, 70, 80, 90)),
      (2, Array(5, 15, 25, 35, 45, 55, 65, 75, 85)),
      (3, Array(100, 110, 120, 130, 140, 150, 160, 170, 180)),
      (4, Array(200, 210, 220, 230, 240, 250, 5, 15, 25)))
    val raw = new ByteArrayOutputStream()
    rows.foreach { case (f, data) =>
      raw.write(f); data.foreach(raw.write)
    }
    val got = PngCodec.decode(png(w, 5, 2, raw.toByteArray)).get
    // independent defilter
    val px = Array.ofDim[Int](5, stride)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    for (y <- 0 until 5; x <- 0 until stride) {
      val cur = rows(y)._2(x)
      val left = if (x >= ch) px(y)(x - ch) else 0
      val up = if (y > 0) px(y - 1)(x) else 0
      val ul = if (y > 0 && x >= ch) px(y - 1)(x - ch) else 0
      px(y)(x) = (rows(y)._1 match {
        case 0 => cur
        case 1 => cur + left
        case 2 => cur + up
        case 3 => cur + ((left + up) >> 1)
        case 4 => cur + paeth(left, up, ul)
      }) & 0xff
    }
    val expect = px.flatten.map(_.toByte).toSeq
    assert(got.rgb.toSeq == expect)
  }

  test("grayscale expands to RGB; RGBA drops alpha") {
    val gray = Array[Byte](0, 7, 9, 0, 11, 13) // 1x... w=2,h=2? stride=w*1
    val g = PngCodec.decode(png(2, 2, 0, gray)).get
    assert(g.rgb.toSeq == Seq[Byte](7, 7, 7, 9, 9, 9, 11, 11, 11, 13, 13, 13))
    val rgba = Array[Byte](0, 1, 2, 3, 99, 5, 6, 7, 98)
    val a = PngCodec.decode(png(2, 1, 6, rgba)).get
    assert(a.rgb.toSeq == Seq[Byte](1, 2, 3, 5, 6, 7))
  }

  test("multi-IDAT streams reassemble") {
    val raw = Array[Byte](0, 1, 2, 3, 0, 4, 5, 6) // 1x2 RGB... w=1,h=2 stride=3
    val z = deflate(raw)
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val ihdr = Array[Byte](0, 0, 0, 1, 0, 0, 0, 2, 8, 2, 0, 0, 0)
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", z.take(3)))
    out.write(chunk("IDAT", z.drop(3)))
    out.write(chunk("IEND", Array.emptyByteArray))
    val f = PngCodec.decode(out.toByteArray).get
    assert(f.rgb.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
  }

  test("malformed streams quarantine: CRC flip, truncated inflate, bad filter, bad sig") {
    val raw = Array[Byte](0, 1, 2, 3)
    val good = png(1, 1, 2, raw)
    assert(PngCodec.decode(good).isDefined)
    // flip a byte inside IDAT payload -> chunk CRC mismatch
    val bad = good.clone()
    bad(8 + 25 + 8 + 2) = (bad(8 + 25 + 8 + 2) ^ 0x7f).toByte
    assert(PngCodec.decode(bad).isEmpty)
    // truncated pixel stream: deflate of too-few bytes
    assert(PngCodec.decode(png(2, 2, 2, Array[Byte](0, 1, 2, 3))).isEmpty)
    // unknown filter type 9
    assert(PngCodec.decode(png(1, 1, 2, Array[Byte](9, 1, 2, 3))).isEmpty)
    // bad signature
    assert(PngCodec.decode("nope".getBytes).isEmpty)
    // oversized pixel stream (extra bytes after the expected scanlines)
    assert(PngCodec.decode(png(1, 1, 2, Array[Byte](0, 1, 2, 3, 0))).isEmpty)
    // bit depth 16 rejected: patch IHDR depth byte and re-CRC
    val ihdr16 = Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 16.toByte, 2, 0, 0, 0)
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    out.write(chunk("IHDR", ihdr16))
    out.write(chunk("IDAT", deflate(Array[Byte](0, 0, 0, 0, 0, 0, 0))))
    out.write(chunk("IEND", Array.emptyByteArray))
    assert(PngCodec.decode(out.toByteArray).isEmpty)
  }
}
