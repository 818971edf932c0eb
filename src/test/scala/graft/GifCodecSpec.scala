package graft

import graft.operators.GifCodec
import org.scalatest.funsuite.AnyFunSuite

/** Test-side general GIF-LZW compressor + container builder: the
  * decoder is validated by round-trip against an INDEPENDENT encoder
  * implementation (plus hand-assembled fixed streams, so a matched
  * encoder/decoder bug pair can't hide).
  */
object GifTestEncoder {

  /** GIF-variant LZW: emits clear first, LSB-first packing, code width
    * grows when the next entry index exceeds the current width's range
    * (one entry later than the decoder's bump — the standard pairing),
    * dictionary frozen at 4096, EOI last.
    */
  def compress(indexes: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode; val eoi = clear + 1
    var width = minCode + 1
    var next = eoi + 1
    val table = scala.collection.mutable.HashMap[(Int, Byte), Int]()
    val bytes = scala.collection.mutable.ArrayBuffer[Byte]()
    var acc = 0L; var accBits = 0
    def emit(code: Int): Unit = {
      acc |= code.toLong << accBits; accBits += width
      while (accBits >= 8) { bytes += (acc & 0xff).toByte; acc >>>= 8; accBits -= 8 }
    }
    emit(clear)
    var w = indexes(0) & 0xff
    var i = 1
    while (i < indexes.length) {
      val k = indexes(i)
      table.get((w, k)) match {
        case Some(c) => w = c
        case None =>
          emit(w)
          if (next < 4096) {
            table((w, k)) = next
            next += 1
            if (next == (1 << width) + 1 && width < 12) width += 1
          }
          w = k & 0xff
      }
      i += 1
    }
    emit(w)
    emit(eoi)
    if (accBits > 0) bytes += (acc & 0xff).toByte
    bytes.toArray
  }

  /** Wrap a payload in ≤255-byte GIF sub-blocks + terminator. */
  def subBlocks(data: Array[Byte]): Array[Byte] = {
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    data.grouped(255).foreach { g => out += g.length.toByte; out ++= g }
    out += 0
    out.toArray
  }

  /** A complete single-frame GIF89a stream: GCT-carried palette,
    * optional interlace flag (caller supplies indexes already in
    * interlaced row order when set).
    */
  def gif(w: Int, h: Int, palette: Array[Byte], indexes: Array[Byte],
          minCode: Int, interlaced: Boolean = false): Array[Byte] = {
    require(palette.length % 3 == 0)
    val gctBits = (math.ceil(math.log(palette.length / 3.0) / math.log(2)) - 1).toInt.max(0)
    val padded = palette ++ new Array[Byte](3 * (1 << (gctBits + 1)) - palette.length)
    val bb = scala.collection.mutable.ArrayBuffer[Byte]()
    bb ++= "GIF89a".getBytes
    bb += (w & 0xff).toByte; bb += ((w >> 8) & 0xff).toByte
    bb += (h & 0xff).toByte; bb += ((h >> 8) & 0xff).toByte
    bb += (0x80 | gctBits).toByte; bb += 0; bb += 0
    bb ++= padded
    bb += 0x2c.toByte
    bb ++= Array[Byte](0, 0, 0, 0) // left, top
    bb += (w & 0xff).toByte; bb += ((w >> 8) & 0xff).toByte
    bb += (h & 0xff).toByte; bb += ((h >> 8) & 0xff).toByte
    bb += (if (interlaced) 0x40 else 0).toByte
    bb += minCode.toByte
    bb ++= subBlocks(compress(indexes, minCode))
    bb += 0x3b.toByte
    bb.toArray
  }
}

class GifCodecSpec extends AnyFunSuite {
  import GifTestEncoder._

  private def rgbOf(palette: Array[Byte], idx: Int): Seq[Byte] =
    palette.slice(idx * 3, idx * 3 + 3).toSeq

  // deterministic pseudo-random indexes (no Random: reproducible failures)
  private def pseudo(n: Int, colors: Int, seed: Long): Array[Byte] =
    Array.tabulate(n)(i => (((i * 2654435761L + seed) >>> 7) % colors).toByte)

  private val pal4 = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)

  test("hand-assembled 1x1 stream (clear, idx, EOI at width 3) decodes to the palette color") {
    // the exact byte shape syntheticPixelMedia assembles in SQL — built
    // here byte-for-byte by hand, independent of the test encoder, so a
    // matched encoder/decoder bug pair can't hide:
    // codes [100b, idx, 101b] LSB-first = bytes [0x44 | idx<<3, 0x01]
    for (idx <- 0 to 3) {
      val g = ("GIF89a".getBytes.toSeq ++
        Seq[Int](1, 0, 1, 0, 0x81, 0, 0).map(_.toByte) ++ // LSD 1x1 + GCT(4)
        pal4.toSeq ++
        Seq[Int](0x2c, 0, 0, 0, 0, 1, 0, 1, 0, 0).map(_.toByte) ++ // descriptor 1x1
        Seq[Int](0x02, 0x02, 0x44 | (idx << 3), 0x01, 0x00).map(_.toByte) ++ // LZW
        Seq(0x3b.toByte)).toArray
      val frames = GifCodec.decode(g).get
      assert(frames.length == 1)
      assert((frames.head.w, frames.head.h) == ((1, 1)))
      assert(frames.head.rgb.toSeq == rgbOf(pal4, idx), s"idx=$idx")
    }
  }

  test("round-trip: multi-pixel frames, all four palette indexes, exact pixels") {
    val idx = Array[Byte](0, 1, 2, 3, 3, 2, 1, 0, 0, 0, 1, 1) // 4x3
    val g = gif(4, 3, pal4, idx, 2)
    val f = GifCodec.decode(g).get.head
    assert((f.w, f.h) == ((4, 3)))
    assert(f.rgb.toSeq == idx.flatMap(i => rgbOf(pal4, i & 0xff)).toSeq)
  }

  test("round-trip: runs force the KwKwK (code == next) branch") {
    val idx = Array.fill(64)(1.toByte) // one long run: immediate KwKwK chains
    val f = GifCodec.decode(gif(8, 8, pal4, idx, 2)).get.head
    assert(f.rgb.toSeq == idx.flatMap(i => rgbOf(pal4, i & 0xff)).toSeq)
  }

  test("round-trip: 128-color 100x100 image crosses several code-width growths") {
    val pal = Array.tabulate(128 * 3)(i => (i * 37 % 256).toByte)
    val idx = pseudo(100 * 100, 128, seed = 41L) // ~10k pixels: width 8 -> 12
    val f = GifCodec.decode(gif(100, 100, pal, idx, 7)).get.head
    assert(f.rgb.length == 100 * 100 * 3)
    assert(f.rgb.toSeq == idx.flatMap(i => rgbOf(pal, i & 0xff)).toSeq)
  }

  test("round-trip: dictionary saturation past 4096 entries (frozen dict)") {
    val pal = Array.tabulate(256 * 3)(i => (i % 256).toByte)
    val idx = pseudo(120 * 120, 256, seed = 7L) // high-entropy: fills the dict
    val f = GifCodec.decode(gif(120, 120, pal, idx, 8)).get.head
    assert(f.rgb.toSeq == idx.flatMap(i => rgbOf(pal, i & 0xff)).toSeq)
  }

  test("interlaced frames come back in natural row order") {
    val w = 5; val h = 13 // odd height exercises all four passes unevenly
    val natural = pseudo(w * h, 4, seed = 3L)
    // feed the encoder rows in interlace pass order; flag the frame
    val passes = Seq((0, 8), (4, 8), (2, 4), (1, 2))
    val interleaved = passes.flatMap { case (s, st) =>
      (s until h by st).flatMap(r => natural.slice(r * w, r * w + w))
    }.toArray
    val f = GifCodec.decode(gif(w, h, pal4, interleaved, 2, interlaced = true)).get.head
    assert(f.rgb.toSeq == natural.flatMap(i => rgbOf(pal4, i & 0xff)).toSeq)
  }

  test("multi-frame animation: every frame decoded, local table overrides global") {
    val f1 = gif(2, 2, pal4, Array[Byte](0, 1, 2, 3), 2)
    val lctPal = Array[Byte](9, 8, 7, 6, 5, 4, 3, 2, 1, 0, 1, 2)
    val frame2 = {
      val whole = gif(2, 2, lctPal, Array[Byte](3, 2, 1, 0), 2)
      val body = whole.slice(13 + 12, whole.length - 1) // descriptor..data
      // move the palette into a local color table: descriptor packed 0x81
      body(9) = 0x81.toByte
      body.take(10) ++ lctPal ++ body.drop(10)
    }
    val anim = f1.dropRight(1) ++ frame2 ++ Array(0x3b.toByte)
    val frames = GifCodec.decode(anim).get
    assert(frames.length == 2)
    assert(frames(0).rgb.toSeq == Array[Byte](0, 1, 2, 3).flatMap(i => rgbOf(pal4, i)).toSeq)
    assert(frames(1).rgb.toSeq == Array[Byte](3, 2, 1, 0).flatMap(i => rgbOf(lctPal, i)).toSeq)
  }

  test("malformed streams quarantine: truncation, bad codes, missing palette") {
    val good = gif(4, 3, pal4, Array[Byte](0, 1, 2, 3, 3, 2, 1, 0, 0, 0, 1, 1), 2)
    assert(GifCodec.decode(good.dropRight(5)).isEmpty) // truncated mid-data
    assert(GifCodec.decode(good.take(13)).isEmpty) // header only
    assert(GifCodec.decode("GIF89a then not a gif".getBytes).isEmpty)
    // no GCT and no LCT: indexes have no colors to map through
    val noPal = {
      val b = good.clone()
      b(10) = 0 // clear GCT flag; table bytes now parse as garbage blocks
      b
    }
    assert(GifCodec.decode(noPal).isEmpty)
    // a pixel index outside the palette: inflate one index beyond 4 colors
    val idxTooBig = gif(2, 1, pal4, Array[Byte](0, 7), 3) // minCode 3: index 7 encodable
    assert(GifCodec.decode(idxTooBig).isEmpty)
  }

  test("fuzz: 200 random (dims, palette, pixels, interlace) images round-trip exactly") {
    // deterministic scalacheck generation (fixed seed: reproducible failures)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genCase = for {
      w <- Gen.chooseNum(1, 37)
      h <- Gen.chooseNum(1, 29)
      colorBits <- Gen.chooseNum(2, 8) // minCode 2..8 (the spec's range)
      interlaced <- Gen.oneOf(true, false)
      seed <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (w, h, colorBits, interlaced, seed)
    val params = Gen.Parameters.default
    (0 until 200).foreach { i =>
      val (w, h, colorBits, interlaced, s) =
        genCase.pureApply(params, Seed(42L + i))
      val colors = 1 << colorBits
      val pal = Array.tabulate(colors * 3)(j => ((j * 131 + s) % 256).toByte)
      val natural = pseudo(w * h, colors, s)
      val input = if (!interlaced) natural else {
        val passes = Seq((0, 8), (4, 8), (2, 4), (1, 2))
        passes.flatMap { case (st, sp) =>
          (st until h by sp).flatMap(r => natural.slice(r * w, r * w + w))
        }.toArray
      }
      val g = gif(w, h, pal, input, colorBits, interlaced)
      val f = GifCodec.decode(g).getOrElse(
        fail(s"case $i (w=$w h=$h colors=$colors interlaced=$interlaced) failed to decode"))
        .head
      assert((f.w, f.h) == ((w, h)), s"case $i dims")
      assert(f.rgb.toSeq == natural.flatMap(ix => rgbOf(pal, ix & 0xff)).toSeq,
        s"case $i (w=$w h=$h colors=$colors interlaced=$interlaced seed=$s) pixel mismatch")
    }
  }

  test("decoder tolerates the extension blocks real files carry") {
    val base = gif(2, 2, pal4, Array[Byte](1, 1, 2, 2), 2)
    val gce = Array(0x21, 0xf9, 0x04, 0, 0, 0, 0, 0).map(_.toByte)
    val withExt = base.take(13 + 12) ++ gce ++ base.drop(13 + 12)
    val f = GifCodec.decode(withExt).get.head
    assert(f.rgb.toSeq == Array[Byte](1, 1, 2, 2).flatMap(i => rgbOf(pal4, i)).toSeq)
  }
}
