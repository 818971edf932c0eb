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
    // hostile dims: a 1-bit 16384x16384 image fits the 64MB raw guard
    // but would demand a 768MB RGB plane — the pixel cap quarantines it
    val big = new ByteArrayOutputStream()
    big.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    big.write(chunk("IHDR", Array[Byte](0, 0, 0x40, 0, 0, 0, 0x40, 0, 1, 0, 0, 0, 0)))
    big.write(chunk("IDAT", deflate(Array[Byte](0))))
    big.write(chunk("IEND", Array.emptyByteArray))
    assert(PngCodec.decode(big.toByteArray).isEmpty)
    // an ILLEGAL depth/type combination (depth 3 exists for no type)
    val ihdr3 = Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 3.toByte, 2, 0, 0, 0)
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    out.write(chunk("IHDR", ihdr3))
    out.write(chunk("IDAT", deflate(Array[Byte](0, 0, 0, 0, 0, 0, 0))))
    out.write(chunk("IEND", Array.emptyByteArray))
    assert(PngCodec.decode(out.toByteArray).isEmpty)
  }

  // ---- the r13 format-matrix extension ----

  /** Assemble a PNG with explicit depth / palette / interlace. */
  private def png2(w: Int, h: Int, colorType: Int, depth: Int,
                   raw: Array[Byte], plte: Array[Byte] = null,
                   interlace: Int = 0): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >> 24).toByte; ihdr(1) = (w >> 16).toByte
    ihdr(2) = (w >> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >> 24).toByte; ihdr(5) = (h >> 16).toByte
    ihdr(6) = (h >> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = depth.toByte; ihdr(9) = colorType.toByte
    ihdr(12) = interlace.toByte
    out.write(chunk("IHDR", ihdr))
    if (plte != null) out.write(chunk("PLTE", plte))
    out.write(chunk("IDAT", deflate(raw)))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Pack one row of `d`-bit samples MSB-first (the spec's packing). */
  private def packRow(samples: Seq[Int], d: Int): Array[Byte] = {
    val rb = (samples.length * d + 7) / 8
    val out = new Array[Byte](rb)
    for ((v, i) <- samples.zipWithIndex) {
      val pos = i * d
      out(pos >> 3) = (out(pos >> 3) | (v << (8 - d - (pos & 7)))).toByte
    }
    out
  }

  test("palette color: depths 1/2/4/8 map through PLTE exactly") {
    // 4-entry palette with distinct channel triples
    val plte = Array[Byte](10, 11, 12, 50, 51, 52, 90, 91, 92, (200 - 256).toByte, 13, 7)
    for (d <- Seq(1, 2, 4, 8)) {
      val nIdx = 1 << math.min(d, 2) // indices 0..1 at depth 1, else 0..3
      val (w, h) = (5, 3)
      val idx = (0 until w * h).map(i => i % nIdx)
      val raw = new ByteArrayOutputStream()
      for (y <- 0 until h) {
        raw.write(0) // filter None
        raw.write(packRow(idx.slice(y * w, y * w + w), d))
      }
      val f = PngCodec.decode(png2(w, h, 3, d, raw.toByteArray, plte)).get
      val want = idx.flatMap(j => Seq(plte(3 * j), plte(3 * j + 1), plte(3 * j + 2)))
      assert(f.rgb.toSeq == want, s"depth $d")
    }
    // an index past the palette quarantines (depth 4, palette of 4)
    val raw = new ByteArrayOutputStream()
    raw.write(0); raw.write(packRow(Seq(9), 4))
    assert(PngCodec.decode(png2(1, 1, 3, 4, raw.toByteArray, plte)).isEmpty)
    // palette color without a PLTE chunk quarantines
    assert(PngCodec.decode(png2(1, 1, 3, 4, raw.toByteArray)).isEmpty)
  }

  test("grayscale sub-byte depths scale by 255/(2^d-1); 16-bit takes the high byte") {
    // depth 1: 0 -> 0, 1 -> 255
    val r1 = Array[Byte](0, packRow(Seq(1, 0, 1), 1)(0))
    assert(PngCodec.decode(png2(3, 1, 0, 1, r1)).get.rgb.toSeq ==
      Seq[Byte](-1, -1, -1, 0, 0, 0, -1, -1, -1))
    // depth 2: v * 85
    val r2 = Array[Byte](0) ++ packRow(Seq(0, 1, 2, 3), 2)
    assert(PngCodec.decode(png2(4, 1, 0, 2, r2)).get.rgb.toSeq ==
      Seq(0, 85, 170, 255).flatMap(v => Seq(v.toByte, v.toByte, v.toByte)))
    // depth 4: v * 17
    val r4 = Array[Byte](0) ++ packRow(Seq(3, 15), 4)
    assert(PngCodec.decode(png2(2, 1, 0, 4, r4)).get.rgb.toSeq ==
      Seq(51, 255).flatMap(v => Seq(v.toByte, v.toByte, v.toByte)))
    // gray 16: high byte survives, low byte is precision beyond RGB24
    val r16 = Array[Byte](0, 0x12, 0x34, 0x7f.toByte, 0xff.toByte)
    assert(PngCodec.decode(png2(2, 1, 0, 16, r16)).get.rgb.toSeq ==
      Seq[Byte](0x12, 0x12, 0x12, 0x7f, 0x7f, 0x7f))
    // RGB 16: three 16-bit channels -> their high bytes
    val rgb16 = Array[Byte](0, 1, 99, 2, 98, 3, 97)
    assert(PngCodec.decode(png2(1, 1, 2, 16, rgb16)).get.rgb.toSeq ==
      Seq[Byte](1, 2, 3))
  }

  test("gray+alpha and 16-bit RGBA drop alpha after defiltering") {
    // type 4 at depth 8: (g, a) pairs; Sub filter exercises bpp=2 offsets
    val ga = Array[Byte](1, 9, 50, 5, 60) // filter Sub: g=9,14 a=50,110
    val f = PngCodec.decode(png2(2, 1, 4, 8, ga)).get
    assert(f.rgb.toSeq == Seq[Byte](9, 9, 9, 14, 14, 14))
    // type 6 at depth 16: 8 bytes per pixel, alpha dropped, high bytes kept
    val rgba16 = Array[Byte](0, 11, 1, 22, 2, 33, 3, 44, 4)
    val f2 = PngCodec.decode(png2(1, 1, 6, 16, rgba16)).get
    assert(f2.rgb.toSeq == Seq[Byte](11, 22, 33))
  }

  test("Adam7 interlace recomposes identically to the straight encoding") {
    val rnd = new scala.util.Random(97)
    // ragged dims exercise empty/short passes; RGB8 and 1-bit gray lanes
    val x0 = Array(0, 4, 0, 2, 0, 1, 0); val y0 = Array(0, 0, 4, 0, 2, 0, 1)
    val dx = Array(8, 8, 4, 4, 2, 2, 1); val dy = Array(8, 8, 8, 4, 4, 2, 2)
    for ((w, h) <- Seq((9, 10), (3, 3), (16, 8), (1, 1))) {
      // RGB8
      val pix = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val straight = new ByteArrayOutputStream()
      for (y <- 0 until h) {
        straight.write(0); straight.write(pix, y * w * 3, w * 3)
      }
      val inter = new ByteArrayOutputStream()
      for (p <- 0 until 7) {
        val pw = if (w > x0(p)) (w - x0(p) + dx(p) - 1) / dx(p) else 0
        val ph = if (h > y0(p)) (h - y0(p) + dy(p) - 1) / dy(p) else 0
        for (j <- 0 until ph if pw > 0) {
          inter.write(0)
          for (i <- 0 until pw; c <- 0 until 3)
            inter.write(pix(((y0(p) + j * dy(p)) * w + x0(p) + i * dx(p)) * 3 + c))
        }
      }
      val a = PngCodec.decode(png2(w, h, 2, 8, straight.toByteArray)).get
      val b = PngCodec.decode(png2(w, h, 2, 8, inter.toByteArray, interlace = 1)).get
      assert(a.rgb.toSeq == b.rgb.toSeq, s"rgb8 ${w}x$h")
      // 1-bit grayscale: sub-byte packing per PASS row
      val bits = Array.fill(w * h)(rnd.nextInt(2))
      val s1 = new ByteArrayOutputStream()
      for (y <- 0 until h) {
        s1.write(0); s1.write(packRow(bits.slice(y * w, y * w + w).toSeq, 1))
      }
      val i1 = new ByteArrayOutputStream()
      for (p <- 0 until 7) {
        val pw = if (w > x0(p)) (w - x0(p) + dx(p) - 1) / dx(p) else 0
        val ph = if (h > y0(p)) (h - y0(p) + dy(p) - 1) / dy(p) else 0
        for (j <- 0 until ph if pw > 0) {
          i1.write(0)
          i1.write(packRow((0 until pw).map(i =>
            bits((y0(p) + j * dy(p)) * w + x0(p) + i * dx(p))), 1))
        }
      }
      val g1 = PngCodec.decode(png2(w, h, 0, 1, s1.toByteArray)).get
      val g2 = PngCodec.decode(png2(w, h, 0, 1, i1.toByteArray, interlace = 1)).get
      assert(g1.rgb.toSeq == g2.rgb.toSeq, s"gray1 ${w}x$h")
    }
  }
}
