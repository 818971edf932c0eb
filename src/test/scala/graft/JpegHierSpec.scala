package graft

import graft.operators.{JpegArith, JpegCodec}
import org.scalatest.funsuite.AnyFunSuite

/** Hierarchical JPEG (T.81 Annex J) validated the established way: a
  * test-only multi-frame ENCODER (DHP, EXP, differential SOF5/SOF7/SOF13/
  * SOF15 frames over Huffman and QM coding) and an independent
  * reconstruction that restates the decoder's contract — the J.1.1.2
  * (a+b+1)>>1 upsampling filter, zero-prediction differential coding,
  * no level shift on differential IDCT output, clamped DCT folds and
  * modulo-2^16 lossless folds.
  */
class JpegHierSpec extends AnyFunSuite {

  // ---- bit-level helpers (mirrors of JpegExtSpec's) ----

  private class BitWriter {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var acc = 0; private var n = 0
    def bits(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); n += 1
        if (n == 8) { out += acc.toByte; if ((acc & 0xff) == 0xff) out += 0x00.toByte; acc = 0; n = 0 }
        i -= 1
      }
    }
    def align(): Unit = while (n != 0) bits(1, 1)
    def raw(b: Int): Unit = { assert(n == 0); out += b.toByte }
    def rawBytes(bs: Array[Byte]): Unit = { assert(n == 0); out ++= bs }
  }

  private def codes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val m = scala.collection.mutable.Map[Int, (Int, Int)]()
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l - 1)) { m(vals(k)) = (code, l); code += 1; k += 1 }
      code <<= 1
    }
    m.toMap
  }

  private def seg(bw: BitWriter, marker: Int, payload: Array[Int]): Unit = {
    bw.raw(0xff); bw.raw(marker)
    val len = payload.length + 2
    bw.raw(len >> 8); bw.raw(len & 0xff)
    payload.foreach(bw.raw)
  }

  private val zig = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private def cat(v: Int): Int = { var t = 0; var a = math.abs(v); while (a > 0) { a >>= 1; t += 1 }; t }

  // Huffman tables: DC/lossless categories 0-16 at 5 bits; AC run/size
  // symbols (sizes 1-10) + EOB + ZRL at 8 bits
  private val dcVals = (0 to 16).toArray
  private val dcBits = Array(0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val dcCode = codes(dcBits, dcVals)
  private val acSyms: Array[Int] =
    (Seq(0x00, 0xF0) ++ (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)).sorted.toArray
  private val acBits = Array(0, 0, 0, 0, 0, 0, 0, acSyms.length, 0, 0, 0, 0, 0, 0, 0, 0)
  private val acCode = codes(acBits, acSyms)

  private def sofSeg(marker: Int, w: Int, h: Int, precision: Int = 8): Array[Int] =
    Array(precision, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0)

  private def sosSeg(ss: Int, al: Int = 0): Array[Int] = Array(1, 1, 0x00, ss, 0, al)

  // ---- lossless frames (Huffman category coding, gray, (1,1)) ----

  private def emitDiffH(bw: BitWriter, d16: Int): Unit =
    if (d16 == 32768) { val (c, l) = dcCode(16); bw.bits(c, l) }
    else {
      val d = if (d16 > 32768) d16 - 65536 else d16
      val t = cat(d)
      val (c, l) = dcCode(t); bw.bits(c, l)
      if (t > 0) bw.bits(if (d >= 0) d else d + (1 << t) - 1, t)
    }

  /** Non-differential lossless frame scan body: predictor `psel`. */
  private def losslessScanBody(w: Int, h: Int, plane: Array[Int], psel: Int): BitWriter = {
    val bw = new BitWriter
    for (y <- 0 until h; x <- 0 until w) {
      val px =
        if (x == 0 && y == 0) 128
        else if (y == 0) plane(x - 1)
        else if (x == 0) plane((y - 1) * w)
        else {
          val ra = plane(y * w + x - 1); val rb = plane((y - 1) * w + x)
          val rc = plane((y - 1) * w + x - 1)
          psel match {
            case 1 => ra
            case 2 => rb
            case 4 => ra + rb - rc
            case _ => (ra + rb) >> 1
          }
        }
      emitDiffH(bw, (plane(y * w + x) - px) & 0xffff)
    }
    bw.align(); bw
  }

  /** Differential lossless frame scan body: raw diffs, Ss = 0. */
  private def diffLosslessScanBody(diffs: Array[Int]): BitWriter = {
    val bw = new BitWriter
    diffs.foreach(d => emitDiffH(bw, d & 0xffff))
    bw.align(); bw
  }

  /** Differential lossless via the QM coder (SOF15): the H.2 model with
    * zero prediction — the arith dual of [[diffLosslessScanBody]].
    */
  private def diffLosslessArithBody(w: Int, h: Int, diffs: Array[Int]): Array[Byte] = {
    val enc = new QmEncoder
    val stats = JpegArith.stats(158)
    val catRow = new Array[Int](w)
    var catL = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d16 = diffs(y * w + x) & 0xffff
      val d = if (d16 > 32768) d16 - 65536 else d16
      val ca = if (x == 0) 0 else catL
      val cb = catRow(x)
      val ctx = 4 * (5 * cb + ca)
      var c = 0
      if (d == 0) enc.encode(stats, ctx, 0)
      else {
        enc.encode(stats, ctx, 1)
        val sign = if (d < 0) 1 else 0
        enc.encode(stats, ctx + 1, sign)
        val e = math.abs(d) - 1
        var sp = ctx + 2 + sign
        val m = if (e == 0) 0 else Integer.highestOneBit(e)
        enc.encode(stats, sp, if (e == 0) 0 else 1)
        if (e > 0) {
          sp = if (cb >= 3) 129 else 100
          var mm = 1
          while (mm < m) { enc.encode(stats, sp, 1); mm <<= 1; sp += 1 }
          enc.encode(stats, sp, 0)
        }
        // default conditioning (L=0, U=1): zero iff m < 0 (never), small
        // iff m <= 1, large iff m > 1 — restated from the bound formulas
        c = if (m > ((1 << 1) >> 1)) 3 + sign else if (m < ((1 << 0) >> 1)) 0 else 1 + sign
        sp += 14
        var bm = m >> 1
        while (bm != 0) { enc.encode(stats, sp, if ((e & bm) != 0) 1 else 0); bm >>= 1 }
      }
      catL = c
      catRow(x) = c
      if (x == w - 1) catL = 0
    }
    enc.flush()
    enc.out.toArray
  }

  // ---- DCT frames (sequential Huffman, gray, (1,1)) ----

  private def emitDctBlock(bw: BitWriter, coef: Array[Int], pred: Int): Unit = {
    val diff = coef(0) - pred
    val t = cat(diff)
    val (c, l) = dcCode(t); bw.bits(c, l)
    if (t > 0) bw.bits(if (diff >= 0) diff else diff + (1 << t) - 1, t)
    var k = 1; var run = 0
    while (k < 64) {
      val v = coef(zig(k))
      if (v == 0) run += 1
      else {
        while (run >= 16) { val (zc, zl) = acCode(0xF0); bw.bits(zc, zl); run -= 16 }
        val s = cat(v)
        val (ac, al) = acCode((run << 4) | s); bw.bits(ac, al)
        bw.bits(if (v >= 0) v else v + (1 << s) - 1, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, el) = acCode(0x00); bw.bits(ec, el) }
  }

  private def dctScanBody(w: Int, h: Int, blocks: Seq[Array[Int]],
                          differential: Boolean): BitWriter = {
    val bw = new BitWriter
    var pred = 0
    blocks.foreach { blk =>
      emitDctBlock(bw, blk, if (differential) 0 else pred)
      if (!differential) pred = blk(0)
    }
    bw.align(); bw
  }

  // ---- independent reference reconstruction ----

  /** J.1.1.2 upsample ×2 (both dims here), cropped to (tw, th). */
  private def refExpand(src: Array[Int], sw: Int, sh: Int, tw: Int, th: Int): Array[Int] = {
    val a = Array.tabulate(2 * sw * sh) { i =>
      val y = i / (2 * sw); val x = i % (2 * sw)
      val v = src(y * sw + x / 2)
      if (x % 2 == 0) v
      else (v + src(y * sw + math.min(x / 2 + 1, sw - 1)) + 1) >> 1
    }
    val b = Array.tabulate(2 * sw * 2 * sh) { i =>
      val y = i / (2 * sw); val x = i % (2 * sw)
      val v = a((y / 2) * 2 * sw + x)
      if (y % 2 == 0) v
      else (v + a(math.min(y / 2 + 1, sh - 1) * 2 * sw + x) + 1) >> 1
    }
    Array.tabulate(tw * th)(i => b((i / tw) * 2 * sw + i % tw))
  }

  private def refIdct(coef: Array[Int], q: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      var s = 0.0
      for (v <- 0 until 8; u <- 0 until 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        s += cu * cv * (coef(v * 8 + u) * q(v * 8 + u)).toDouble *
          math.cos((2 * x + 1) * u * math.Pi / 16) *
          math.cos((2 * y + 1) * v * math.Pi / 16)
      }
      out(y * 8 + x) = math.round(s / 4.0).toInt
    }
    out
  }

  private def grayRgb(w: Int, h: Int, p: Array[Int]): Array[Byte] = {
    // the decoder's 8-bit scaling clips over-range full-precision values
    val rgb = new Array[Byte](w * h * 3)
    for (i <- 0 until w * h; c <- 0 until 3)
      rgb(i * 3 + c) = math.min(p(i), 255).toByte
    rgb
  }

  private def assertPixels(jpeg: Array[Byte], w: Int, h: Int, want: Array[Byte]): Unit = {
    val got = JpegCodec.decodeOrThrow(jpeg).getOrElse(fail("hierarchical decode returned None"))
    assert(got.w == w && got.h == h, s"dims ${got.w}x${got.h}")
    val bad = got.rgb.zip(want).zipWithIndex.filter { case ((a, b), _) => a != b }
    assert(bad.isEmpty, s"${bad.length} byte mismatches, first at ${bad.headOption.map(_._2)}")
  }

  test("lossless pyramid: SOF3 base, EXP x2, SOF7 differential refinement") {
    val rnd = new scala.util.Random(501)
    val (w0, h0) = (6, 5)
    val (w1, h1) = (11, 9) // crop of the 12x10 expansion
    val base = Array.fill(w0 * h0)(rnd.nextInt(256))
    val diffs = Array.fill(w1 * h1)(rnd.nextInt(9) - 4)
    val bw = new BitWriter
    bw.raw(0xff); bw.raw(0xd8)
    seg(bw, 0xc4, 0x00 +: (dcBits ++ dcVals))
    seg(bw, 0xde, sofSeg(0, w1, h1)) // DHP: full-res params
    seg(bw, 0xc3, sofSeg(0, w0, h0))
    seg(bw, 0xda, sosSeg(ss = 1)) // predictor 1
    bw.rawBytes(losslessScanBody(w0, h0, base, psel = 1).out.toArray)
    seg(bw, 0xdf, Array(0x11)) // EXP both dims
    seg(bw, 0xc7, sofSeg(0, w1, h1))
    seg(bw, 0xda, sosSeg(ss = 0)) // differential: raw diffs
    bw.rawBytes(diffLosslessScanBody(diffs).out.toArray)
    bw.raw(0xff); bw.raw(0xd9)

    val expanded = refExpand(base, w0, h0, w1, h1)
    val want = expanded.zip(diffs).map { case (r, d) => (r + d) & 0xffff }
    assertPixels(bw.out.toArray, w1, h1, grayRgb(w1, h1, want))
    // the metadata lane reads the DHP's FULL-resolution dims, not the
    // reduced first level's
    assert(graft.operators.Multimodal.HeaderDecoder.parse(bw.out.toArray)
      .contains(("jpeg", w1, h1, 1)))
  }

  test("DCT pyramid: SOF0 base + SOF5 differential (no level shift, clamped fold)") {
    val rnd = new scala.util.Random(503)
    val (w, h) = (16, 16)
    val q = Array.fill(64)(1 + rnd.nextInt(3))
    def blocks(range: Int): Seq[Array[Int]] = Seq.fill(4) {
      val b = new Array[Int](64)
      b(0) = rnd.nextInt(2 * range) - range
      for (_ <- 0 until 6) b(zig(1 + rnd.nextInt(20))) = rnd.nextInt(9) - 4
      b
    }
    val b0 = blocks(200)
    val b1 = blocks(30)
    val bw = new BitWriter
    bw.raw(0xff); bw.raw(0xd8)
    seg(bw, 0xdb, 0x00 +: (0 until 64).map(i => q(zig(i))).toArray)
    seg(bw, 0xc4, 0x00 +: (dcBits ++ dcVals))
    seg(bw, 0xc4, 0x10 +: (acBits ++ acSyms))
    seg(bw, 0xde, sofSeg(0, w, h))
    seg(bw, 0xc0, sofSeg(0, w, h))
    seg(bw, 0xda, Array(1, 1, 0x00, 0, 63, 0))
    bw.rawBytes(dctScanBody(w, h, b0, differential = false).out.toArray)
    seg(bw, 0xc5, sofSeg(0, w, h)) // differential sequential, same dims
    seg(bw, 0xda, Array(1, 1, 0x00, 0, 63, 0))
    bw.rawBytes(dctScanBody(w, h, b1, differential = true).out.toArray)
    bw.raw(0xff); bw.raw(0xd9)

    val want = new Array[Int](w * h)
    for ((blk, bi) <- b0.zipWithIndex) {
      val s0 = refIdct(blk, q); val s1 = refIdct(b1(bi), q)
      val bx = (bi % 2) * 8; val by = (bi / 2) * 8
      for (yy <- 0 until 8; xx <- 0 until 8) {
        val v0 = math.max(0, math.min(255, s0(yy * 8 + xx) + 128))
        want((by + yy) * w + bx + xx) =
          math.max(0, math.min(255, v0 + s1(yy * 8 + xx)))
      }
    }
    assertPixels(bw.out.toArray, w, h, grayRgb(w, h, want))
  }

  test("arithmetic differential lossless (SOF15) refines a Huffman base") {
    val rnd = new scala.util.Random(509)
    val (w, h) = (9, 7)
    val base = Array.fill(w * h)(rnd.nextInt(256))
    val diffs = Array.fill(w * h)(rnd.nextInt(7) - 3)
    val bw = new BitWriter
    bw.raw(0xff); bw.raw(0xd8)
    seg(bw, 0xc4, 0x00 +: (dcBits ++ dcVals))
    seg(bw, 0xde, sofSeg(0, w, h))
    seg(bw, 0xc3, sofSeg(0, w, h))
    seg(bw, 0xda, sosSeg(ss = 2))
    bw.rawBytes(losslessScanBody(w, h, base, psel = 2).out.toArray)
    seg(bw, 0xcf, sofSeg(0, w, h)) // arithmetic differential lossless
    seg(bw, 0xda, sosSeg(ss = 0))
    bw.rawBytes(diffLosslessArithBody(w, h, diffs))
    bw.raw(0xff); bw.raw(0xd9)
    val want = base.zip(diffs).map { case (r, d) => (r + d) & 0xffff }
    assertPixels(bw.out.toArray, w, h, grayRgb(w, h, want))
  }

  /** Differential sequential DCT over the QM coder (SOF13): zero-pred DC
    * (the F.1.4 DC model with per-block PRED = 0) + the standard AC band.
    */
  private def diffDctArithBody(blocks: Seq[Array[Int]]): Array[Byte] = {
    val enc = new QmEncoder
    val dcStats = JpegArith.stats(64)
    val acStats = JpegArith.stats(256)
    val fixed = JpegArith.fixedBin
    var dcCtx = 0
    blocks.foreach { coefs =>
      val diff = coefs(0) // zero prediction
      if (diff == 0) { enc.encode(dcStats, dcCtx, 0); dcCtx = 0 }
      else {
        enc.encode(dcStats, dcCtx, 1)
        val sign = if (diff < 0) 1 else 0
        enc.encode(dcStats, dcCtx + 1, sign)
        val e = math.abs(diff) - 1
        var sp = dcCtx + 2 + sign
        val m = if (e == 0) 0 else Integer.highestOneBit(e)
        enc.encode(dcStats, sp, if (e == 0) 0 else 1)
        if (e > 0) {
          sp = 20
          var mm = 1
          while (mm < m) { enc.encode(dcStats, sp, 1); mm <<= 1; sp += 1 }
          enc.encode(dcStats, sp, 0)
        }
        dcCtx = // default conditioning L=0, U=1
          if (m < ((1 << 0) >> 1)) 0
          else if (m > ((1 << 1) >> 1)) 12 + sign * 4
          else 4 + sign * 4
        sp += 14
        var b = m >> 1
        while (b != 0) { enc.encode(dcStats, sp, if ((e & b) != 0) 1 else 0); b >>= 1 }
      }
      // AC band 1..63 (F.2.2.2), default Kx = 5
      var kEnd = 63
      while (kEnd >= 1 && coefs(zig(kEnd)) == 0) kEnd -= 1
      var k = 1
      while (k <= kEnd) {
        enc.encode(acStats, 3 * (k - 1), 0) // not EOB
        while (coefs(zig(k)) == 0) { enc.encode(acStats, 3 * (k - 1) + 1, 0); k += 1 }
        enc.encode(acStats, 3 * (k - 1) + 1, 1)
        val v = coefs(zig(k))
        enc.encode(fixed, 0, if (v < 0) 1 else 0)
        val e = math.abs(v) - 1
        val base = 3 * (k - 1) + 2
        var sp = base
        var m = 0
        if (e == 0) enc.encode(acStats, base, 0)
        else {
          enc.encode(acStats, base, 1)
          if (e == 1) { enc.encode(acStats, base, 0); m = 1 }
          else {
            enc.encode(acStats, base, 1)
            m = Integer.highestOneBit(e)
            sp = if (k <= 5) 189 else 217
            var mm = 2
            while (mm < m) { enc.encode(acStats, sp, 1); mm <<= 1; sp += 1 }
            enc.encode(acStats, sp, 0)
          }
        }
        sp += 14
        var b = m >> 1
        while (b != 0) { enc.encode(acStats, sp, if ((e & b) != 0) 1 else 0); b >>= 1 }
        k += 1
      }
      if (kEnd < 63) enc.encode(acStats, 3 * (k - 1), 1) // EOB
    }
    enc.flush()
    enc.out.toArray
  }

  test("arithmetic differential DCT (SOF13) refines a Huffman sequential base") {
    val rnd = new scala.util.Random(521)
    val (w, h) = (16, 8)
    val q = Array.fill(64)(1 + rnd.nextInt(2))
    val b0 = Seq.fill(2) {
      val b = new Array[Int](64)
      b(0) = rnd.nextInt(300) - 150
      for (_ <- 0 until 5) b(zig(1 + rnd.nextInt(15))) = rnd.nextInt(7) - 3
      b
    }
    val b1 = Seq.fill(2) {
      val b = new Array[Int](64)
      b(0) = rnd.nextInt(40) - 20
      for (_ <- 0 until 4) b(zig(1 + rnd.nextInt(15))) = rnd.nextInt(5) - 2
      b
    }
    val bw = new BitWriter
    bw.raw(0xff); bw.raw(0xd8)
    seg(bw, 0xdb, 0x00 +: (0 until 64).map(i => q(zig(i))).toArray)
    seg(bw, 0xc4, 0x00 +: (dcBits ++ dcVals))
    seg(bw, 0xc4, 0x10 +: (acBits ++ acSyms))
    seg(bw, 0xde, sofSeg(0, w, h))
    seg(bw, 0xc0, sofSeg(0, w, h))
    seg(bw, 0xda, Array(1, 1, 0x00, 0, 63, 0))
    bw.rawBytes(dctScanBody(w, h, b0, differential = false).out.toArray)
    seg(bw, 0xcd, sofSeg(0, w, h)) // arithmetic differential sequential
    seg(bw, 0xda, Array(1, 1, 0x00, 0, 63, 0))
    bw.rawBytes(diffDctArithBody(b1))
    bw.raw(0xff); bw.raw(0xd9)
    val want = new Array[Int](w * h)
    for ((blk, bi) <- b0.zipWithIndex) {
      val s0 = refIdct(blk, q); val s1 = refIdct(b1(bi), q)
      val bx = bi * 8
      for (yy <- 0 until 8; xx <- 0 until 8) {
        val v0 = math.max(0, math.min(255, s0(yy * 8 + xx) + 128))
        want(yy * w + bx + xx) = math.max(0, math.min(255, v0 + s1(yy * 8 + xx)))
      }
    }
    assertPixels(bw.out.toArray, w, h, grayRgb(w, h, want))
  }

  test("differential progressive (SOF6): DC-only refinement folds without level shift") {
    val rnd = new scala.util.Random(523)
    val (w, h) = (8, 16)
    val q = Array.fill(64)(1 + rnd.nextInt(2))
    val b0 = Seq.fill(2) {
      val b = new Array[Int](64); b(0) = rnd.nextInt(200) - 100; b
    }
    val dcDiffs = Seq.fill(2)(rnd.nextInt(30) - 15)
    val bw = new BitWriter
    bw.raw(0xff); bw.raw(0xd8)
    seg(bw, 0xdb, 0x00 +: (0 until 64).map(i => q(zig(i))).toArray)
    seg(bw, 0xc4, 0x00 +: (dcBits ++ dcVals))
    seg(bw, 0xc4, 0x10 +: (acBits ++ acSyms))
    seg(bw, 0xde, sofSeg(0, w, h))
    seg(bw, 0xc0, sofSeg(0, w, h))
    seg(bw, 0xda, Array(1, 1, 0x00, 0, 63, 0))
    bw.rawBytes(dctScanBody(w, h, b0, differential = false).out.toArray)
    // differential PROGRESSIVE frame, one DC scan (ss=se=0, al=0)
    seg(bw, 0xc6, sofSeg(0, w, h))
    seg(bw, 0xda, Array(1, 1, 0x00, 0, 0, 0))
    val dcBw = new BitWriter
    dcDiffs.foreach { d => // zero prediction per block
      val t = cat(d)
      val (c, l) = dcCode(t); dcBw.bits(c, l)
      if (t > 0) dcBw.bits(if (d >= 0) d else d + (1 << t) - 1, t)
    }
    dcBw.align()
    bw.rawBytes(dcBw.out.toArray)
    bw.raw(0xff); bw.raw(0xd9)
    val want = new Array[Int](w * h)
    for ((blk, bi) <- b0.zipWithIndex) {
      val s0 = refIdct(blk, q)
      val d = new Array[Int](64); d(0) = dcDiffs(bi)
      val s1 = refIdct(d, q)
      val by = bi * 8
      for (yy <- 0 until 8; xx <- 0 until 8) {
        val v0 = math.max(0, math.min(255, s0(yy * 8 + xx) + 128))
        want((by + yy) * w + xx) = math.max(0, math.min(255, v0 + s1(yy * 8 + xx)))
      }
    }
    assertPixels(bw.out.toArray, w, h, grayRgb(w, h, want))
  }

  test("hierarchical quarantine: EXP misuse and differential-first streams") {
    val rnd = new scala.util.Random(511)
    val (w, h) = (8, 8)
    val base = Array.fill(w * h)(rnd.nextInt(256))
    def stream(f: BitWriter => Unit): Array[Byte] = {
      val bw = new BitWriter
      bw.raw(0xff); bw.raw(0xd8)
      seg(bw, 0xc4, 0x00 +: (dcBits ++ dcVals))
      f(bw)
      bw.raw(0xff); bw.raw(0xd9)
      bw.out.toArray
    }
    // differential frame with no prior reference
    assert(JpegCodec.decode(stream { bw =>
      seg(bw, 0xde, sofSeg(0, w, h))
      seg(bw, 0xc7, sofSeg(0, w, h))
      seg(bw, 0xda, sosSeg(ss = 0))
      bw.rawBytes(diffLosslessScanBody(base.map(_ - 128)).out.toArray)
    }).isEmpty)
    // EXP before a NON-differential frame
    assert(JpegCodec.decode(stream { bw =>
      seg(bw, 0xde, sofSeg(0, w, h))
      seg(bw, 0xdf, Array(0x11))
      seg(bw, 0xc3, sofSeg(0, w, h))
      seg(bw, 0xda, sosSeg(ss = 1))
      bw.rawBytes(losslessScanBody(w, h, base, psel = 1).out.toArray)
    }).isEmpty)
    // EXP expand value 2 is out of range
    assert(JpegCodec.decode(stream { bw =>
      seg(bw, 0xde, sofSeg(0, w, h))
      seg(bw, 0xdf, Array(0x21))
    }).isEmpty)
    // dims mismatch: differential frame smaller than the reference
    assert(JpegCodec.decode(stream { bw =>
      seg(bw, 0xde, sofSeg(0, w, h))
      seg(bw, 0xc3, sofSeg(0, w, h))
      seg(bw, 0xda, sosSeg(ss = 1))
      bw.rawBytes(losslessScanBody(w, h, base, psel = 1).out.toArray)
      seg(bw, 0xc7, sofSeg(0, w - 2, h))
      seg(bw, 0xda, sosSeg(ss = 0))
      bw.rawBytes(diffLosslessScanBody(
        Array.fill((w - 2) * h)(0)).out.toArray)
    }).isEmpty)
  }
}
