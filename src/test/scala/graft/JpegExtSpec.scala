package graft

import graft.operators.JpegCodec
import org.scalatest.funsuite.AnyFunSuite

/** The r13 JPEG scope extensions — 12-bit extended sequential (SOF1,
  * 16-bit DQT) and lossless (SOF3, T.81 Annex H) — validated the
  * JpegCodecSpec way: an independent test-only encoder plus a reference
  * decode written here. The lossless reference is exact by construction
  * (prediction is integer arithmetic, no DCT anywhere), so decoded
  * frames must match byte-for-byte; the 12-bit DCT reference recomputes
  * the textbook non-separable IDCT at the 2^11 level shift and the
  * documented top-bits 8-bit scaling.
  */
class JpegExtSpec extends AnyFunSuite {

  // ---- shared bit-level helpers (mirrors of JpegCodecSpec's) ----

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

  // ---- 12-bit extended sequential encoder (SOF1, Pq=1 DQT) ----

  // DC categories 0-15 (12-bit allows up to 15) at 5 bits; AC run/size
  // symbols with sizes 1-14 plus ZRL and EOB at 8 bits
  private val dc12Vals = (0 to 15).toArray
  private val dc12Bits = Array(0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val ac12Syms: Array[Int] =
    (Seq(0x00, 0xF0) ++ (for (r <- 0 to 15; s <- 1 to 14) yield (r << 4) | s)).sorted.toArray
  private val ac12Bits = Array(0, 0, 0, 0, 0, 0, 0, ac12Syms.length, 0, 0, 0, 0, 0, 0, 0, 0)
  private val dc12Code = codes(dc12Bits, dc12Vals)
  private val ac12Code = codes(ac12Bits, ac12Syms)

  private def emitBlock12(bw: BitWriter, coef: Array[Int], pred: Int): Int = {
    val diff = coef(0) - pred
    val t = cat(diff)
    val (c, l) = dc12Code(t); bw.bits(c, l)
    if (t > 0) bw.bits(if (diff >= 0) diff else diff + (1 << t) - 1, t)
    var k = 1; var run = 0
    while (k < 64) {
      val v = coef(zig(k))
      if (v == 0) run += 1
      else {
        while (run >= 16) { val (zc, zl) = ac12Code(0xF0); bw.bits(zc, zl); run -= 16 }
        val s = cat(v)
        val (ac, al) = ac12Code((run << 4) | s); bw.bits(ac, al)
        bw.bits(if (v >= 0) v else v + (1 << s) - 1, s)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, el) = ac12Code(0x00); bw.bits(ec, el) }
    coef(0)
  }

  /** Assemble a 12-bit extended sequential JPEG with a 16-bit qtable. */
  private def encode12(w: Int, h: Int, samp: Seq[(Int, Int)], q: Array[Int],
                       blocks: Seq[Seq[Array[Int]]], restart: Int = 0): Array[Byte] = {
    val bw = new BitWriter
    bw.raw(0xff); bw.raw(0xd8)
    seg(bw, 0xdb, 0x10 +: (0 until 64).flatMap(i =>
      Seq(q(zig(i)) >> 8, q(zig(i)) & 0xff)).toArray)
    seg(bw, 0xc4, 0x00 +: (dc12Bits ++ dc12Vals))
    seg(bw, 0xc4, 0x10 +: (ac12Bits ++ ac12Syms))
    if (restart > 0) seg(bw, 0xdd, Array(restart >> 8, restart & 0xff))
    val nc = samp.length
    seg(bw, 0xc1, Array(12, h >> 8, h & 0xff, w >> 8, w & 0xff, nc) ++
      samp.zipWithIndex.flatMap { case ((sh, sv), i) => Seq(i + 1, (sh << 4) | sv, 0) })
    seg(bw, 0xda, Array(nc) ++ (1 to nc).flatMap(i => Seq(i, 0x00)) ++ Seq(0, 63, 0))
    val hMax = samp.map(_._1).max; val vMax = samp.map(_._2).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val pred = new Array[Int](nc)
    val idx = new Array[Int](nc)
    var rst = 0
    for (m <- 0 until mcusX * mcusY) {
      if (restart > 0 && m > 0 && m % restart == 0) {
        bw.align(); bw.raw(0xff); bw.raw(0xd0 + rst); rst = (rst + 1) & 7
        java.util.Arrays.fill(pred, 0)
      }
      for (c <- 0 until nc; _ <- 0 until samp(c)._1 * samp(c)._2) {
        pred(c) = emitBlock12(bw, blocks(c)(idx(c)), pred(c))
        idx(c) += 1
      }
    }
    bw.align(); bw.raw(0xff); bw.raw(0xd9)
    bw.out.toArray
  }

  /** Textbook non-separable IDCT at 12-bit: level shift 2048, clamp to
    * [0,4095], then the documented top-bits scale to 8 bits.
    */
  private def refIdct12(coef: Array[Int], q: Array[Int]): Array[Int] = {
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
      val p = math.round(s / 4.0 + 2048.0).toInt
      out(y * 8 + x) = math.max(0, math.min(4095, p)) >> 4
    }
    out
  }

  /** 8-bit planes → RGB24 (NN upsample + JFIF matrix / gray fanout) —
    * the same contract JpegCodecSpec.refRgb pins, shared by precisions.
    */
  private def refRgb(w: Int, h: Int, samp: Seq[(Int, Int)],
                     planes: Seq[Array[Int]], planeW: Seq[Int],
                     directRgb: Boolean = false): Array[Byte] = {
    val hMax = samp.map(_._1).max; val vMax = samp.map(_._2).max
    val rgb = new Array[Byte](w * h * 3)
    def sm(ci: Int, x: Int, y: Int): Int =
      planes(ci)((y * samp(ci)._2 / vMax) * planeW(ci) + x * samp(ci)._1 / hMax)
    def cl(d: Double): Byte = math.max(0, math.min(255, math.round(d).toInt)).toByte
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      if (directRgb && samp.length == 3) {
        rgb(o) = sm(0, x, y).toByte; rgb(o + 1) = sm(1, x, y).toByte
        rgb(o + 2) = sm(2, x, y).toByte
      } else if (samp.length >= 3) {
        val yv = sm(0, x, y).toDouble
        val cb = sm(1, x, y) - 128.0; val cr = sm(2, x, y) - 128.0
        rgb(o) = cl(yv + 1.402 * cr)
        rgb(o + 1) = cl(yv - 0.344136 * cb - 0.714136 * cr)
        rgb(o + 2) = cl(yv + 1.772 * cb)
      } else {
        val g = sm(0, x, y).toByte
        rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
      }
    }
    rgb
  }

  private def buildPlanes12(w: Int, h: Int, samp: Seq[(Int, Int)], q: Array[Int],
                            blocks: Seq[Seq[Array[Int]]]): (Seq[Array[Int]], Seq[Int]) = {
    val hMax = samp.map(_._1).max; val vMax = samp.map(_._2).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val planeWs = samp.map { case (sh, _) => mcusX * sh * 8 }
    val planes = samp.zip(planeWs).map { case ((_, sv), pw) =>
      new Array[Int](pw * mcusY * sv * 8)
    }
    val idx = new Array[Int](samp.length)
    for (m <- 0 until mcusX * mcusY; c <- samp.indices;
         by <- 0 until samp(c)._2; bx <- 0 until samp(c)._1) {
      val px = ((m % mcusX) * samp(c)._1 + bx) * 8
      val py = ((m / mcusX) * samp(c)._2 + by) * 8
      val sp = refIdct12(blocks(c)(idx(c)), q); idx(c) += 1
      for (yy <- 0 until 8; xx <- 0 until 8)
        planes(c)((py + yy) * planeWs(c) + px + xx) = sp(yy * 8 + xx)
    }
    (planes, planeWs)
  }

  private def randomBlocks12(rnd: scala.util.Random, n: Int): Seq[Array[Int]] =
    Seq.fill(n) {
      val b = new Array[Int](64)
      b(0) = rnd.nextInt(6001) - 3000 // DC categories up to 12-13
      for (_ <- 0 until 12 + rnd.nextInt(20))
        b(1 + rnd.nextInt(63)) = rnd.nextInt(3001) - 1500 // AC sizes up to 11
      b
    }

  // 16-bit qtable entries: values above 255 prove the Pq=1 parse
  private val q16: Array[Int] = (0 until 64).map(i => 200 + (i * 37) % 500).toArray

  private def check12(w: Int, h: Int, samp: Seq[(Int, Int)],
                      blocks: Seq[Seq[Array[Int]]], restart: Int = 0): Unit = {
    val jpeg = encode12(w, h, samp, q16, blocks, restart)
    val got = JpegCodec.decodeOrThrow(jpeg).getOrElse(fail("12-bit decode returned None"))
    assert(got.w == w && got.h == h)
    val (planes, planeWs) = buildPlanes12(w, h, samp, q16, blocks)
    val want = refRgb(w, h, samp, planes, planeWs)
    val bad = got.rgb.zip(want).zipWithIndex.filter { case ((a, b), _) => a != b }
    assert(bad.isEmpty, s"${bad.length} byte mismatches, first at ${bad.headOption.map(_._2)}")
  }

  private def nBlocks(w: Int, h: Int, samp: Seq[(Int, Int)], c: Int): Int = {
    val hMax = samp.map(_._1).max; val vMax = samp.map(_._2).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    mcusX * mcusY * samp(c)._1 * samp(c)._2
  }

  test("12-bit grayscale fuzz: wide-range coefficients, 16-bit qtable, exact") {
    val rnd = new scala.util.Random(101)
    for (_ <- 0 until 6) {
      val (w, h) = (8 * (1 + rnd.nextInt(4)), 8 * (1 + rnd.nextInt(4)))
      val samp = Seq((1, 1))
      check12(w, h, samp, Seq(randomBlocks12(rnd, nBlocks(w, h, samp, 0))))
    }
  }

  test("12-bit color 4:2:0 with restart markers") {
    val rnd = new scala.util.Random(103)
    val samp = Seq((2, 2), (1, 1), (1, 1))
    val (w, h) = (32, 16)
    check12(w, h, samp, samp.indices.map(c =>
      randomBlocks12(rnd, nBlocks(w, h, samp, c))), restart = 2)
  }

  test("12-bit padding dims crop correctly") {
    val rnd = new scala.util.Random(107)
    val samp = Seq((1, 1))
    check12(20, 12, samp, Seq(randomBlocks12(rnd, nBlocks(20, 12, samp, 0))))
  }

  // ---- lossless (SOF3) encoder ----

  // lossless difference categories 0-16 at 5 bits (16 = the 32768 code)
  private val llVals = (0 to 16).toArray
  private val llBits = Array(0, 0, 0, 0, 17, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val llCode = codes(llBits, llVals)

  /** Assemble a lossless JPEG (T.81 H): `planes` hold the P−Pt bit
    * samples on the padded lossless MCU grid (lossMcuX·hᵢ wide). The
    * prediction mirror below re-states the decoder's contract
    * independently: default 2^(P−Pt−1) at (re)start, 1-D Ra along the
    * (re)start line, Rb at line starts, the selected predictor
    * elsewhere, all modulo 2^16.
    */
  private def encodeLossless(w: Int, h: Int, samp: Seq[(Int, Int)], precision: Int,
                             planes: Seq[Array[Int]], psel: Int, pt: Int,
                             restart: Int = 0,
                             interleaved: Boolean = true): Array[Byte] = {
    val nc = samp.length
    val hMax = samp.map(_._1).max; val vMax = samp.map(_._2).max
    val mcuX = (w + hMax - 1) / hMax; val mcuY = (h + vMax - 1) / vMax
    val planeWs = samp.map { case (sh, _) => mcuX * sh }
    val bw = new BitWriter
    bw.raw(0xff); bw.raw(0xd8)
    seg(bw, 0xc4, 0x00 +: (llBits ++ llVals))
    if (restart > 0) seg(bw, 0xdd, Array(restart >> 8, restart & 0xff))
    seg(bw, 0xc3, Array(precision, h >> 8, h & 0xff, w >> 8, w & 0xff, nc) ++
      samp.zipWithIndex.flatMap { case ((sh, sv), i) => Seq(i + 1, (sh << 4) | sv, 0) })

    def emitScan(scanComps: Seq[Int]): Unit = {
      seg(bw, 0xda, Array(scanComps.length) ++
        scanComps.flatMap(c => Seq(c + 1, 0x00)) ++ Seq(psel, 0, pt))
      val fresh = Array.fill(nc)(true)
      val freshY = Array.fill(nc)(0)
      var rst = 0; var unit = 0
      def maybeRestart(): Unit =
        if (restart > 0 && unit > 0 && unit % restart == 0) {
          bw.align(); bw.raw(0xff); bw.raw(0xd0 + rst); rst = (rst + 1) & 7
          java.util.Arrays.fill(fresh, true)
        }
      def emitSample(ci: Int, x: Int, y: Int): Unit = {
        val pw = planeWs(ci); val p = planes(ci)
        val px =
          if (fresh(ci)) { fresh(ci) = false; freshY(ci) = y; 1 << (precision - pt - 1) }
          else if (y == freshY(ci)) p(y * pw + x - 1)
          else if (x == 0) p((y - 1) * pw)
          else {
            val ra = p(y * pw + x - 1); val rb = p((y - 1) * pw + x)
            val rc = p((y - 1) * pw + x - 1)
            psel match {
              case 1 => ra
              case 2 => rb
              case 3 => rc
              case 4 => ra + rb - rc
              case 5 => ra + ((rb - rc) >> 1)
              case 6 => rb + ((ra - rc) >> 1)
              case _ => (ra + rb) >> 1
            }
          }
        val d16 = (p(y * pw + x) - px) & 0xffff
        if (d16 == 32768) { val (c, l) = llCode(16); bw.bits(c, l) }
        else {
          val d = if (d16 > 32768) d16 - 65536 else d16
          val t = cat(d)
          val (c, l) = llCode(t); bw.bits(c, l)
          if (t > 0) bw.bits(if (d >= 0) d else d + (1 << t) - 1, t)
        }
      }
      if (scanComps.length == 1) {
        val ci = scanComps.head; val (sh, sv) = samp(ci)
        val cw = math.max((w.toLong * sh + hMax - 1).toInt / hMax, 1)
        val chh = math.max((h.toLong * sv + vMax - 1).toInt / vMax, 1)
        while (unit < cw * chh) {
          maybeRestart(); emitSample(ci, unit % cw, unit / cw); unit += 1
        }
      } else {
        while (unit < mcuX * mcuY) {
          maybeRestart()
          val mx = unit % mcuX; val my = unit / mcuX
          for (ci <- scanComps; by <- 0 until samp(ci)._2; bx <- 0 until samp(ci)._1)
            emitSample(ci, mx * samp(ci)._1 + bx, my * samp(ci)._2 + by)
          unit += 1
        }
      }
      bw.align()
    }

    if (interleaved) emitScan(samp.indices)
    else samp.indices.foreach(c => emitScan(Seq(c)))
    bw.raw(0xff); bw.raw(0xd9)
    bw.out.toArray
  }

  /** Expected RGB24 of a lossless frame from its sample planes: undo the
    * point transform, take the top 8 bits, NN-upsample; 3 components are
    * DIRECT RGB (no color transform in the lossless process).
    */
  private def refLossless(w: Int, h: Int, samp: Seq[(Int, Int)], precision: Int,
                          planes: Seq[Array[Int]], pt: Int): Array[Byte] = {
    val hMax = samp.map(_._1).max
    val mcuX = (w + hMax - 1) / hMax
    val planeWs = samp.map { case (sh, _) => mcuX * sh }
    val planes8 = planes.map(_.map { v =>
      val full = (v << pt) & 0xffff
      val v8 = if (precision >= 8) full >> (precision - 8) else full << (8 - precision)
      math.min(v8, 255)
    })
    refRgb(w, h, samp, planes8, planeWs, directRgb = samp.length == 3)
  }

  private def losslessPlanes(rnd: scala.util.Random, w: Int, h: Int,
                             samp: Seq[(Int, Int)], codedBits: Int): Seq[Array[Int]] = {
    val hMax = samp.map(_._1).max; val vMax = samp.map(_._2).max
    val mcuX = (w + hMax - 1) / hMax; val mcuY = (h + vMax - 1) / vMax
    samp.map { case (sh, sv) =>
      Array.fill(mcuX * sh * mcuY * sv)(rnd.nextInt(1 << codedBits))
    }
  }

  private def checkLossless(w: Int, h: Int, samp: Seq[(Int, Int)], precision: Int,
                            planes: Seq[Array[Int]], psel: Int, pt: Int,
                            restart: Int = 0, interleaved: Boolean = true): Unit = {
    val jpeg = encodeLossless(w, h, samp, precision, planes, psel, pt, restart, interleaved)
    val got = JpegCodec.decodeOrThrow(jpeg).getOrElse(
      fail(s"lossless decode returned None (psel=$psel pt=$pt P=$precision)"))
    assert(got.w == w && got.h == h)
    val want = refLossless(w, h, samp, precision, planes, pt)
    val bad = got.rgb.zip(want).zipWithIndex.filter { case ((a, b), _) => a != b }
    assert(bad.isEmpty,
      s"psel=$psel pt=$pt P=$precision: ${bad.length} byte mismatches, " +
        s"first at ${bad.headOption.map(_._2)}")
  }

  test("lossless predictors 1-7 reproduce random planes exactly at 8/12/16-bit") {
    val rnd = new scala.util.Random(211)
    for (precision <- Seq(8, 12, 16); psel <- 1 to 7) {
      val (w, h) = (1 + rnd.nextInt(24), 1 + rnd.nextInt(24))
      checkLossless(w, h, Seq((1, 1)), precision,
        losslessPlanes(rnd, w, h, Seq((1, 1)), precision), psel, pt = 0)
    }
  }

  test("lossless RGB: three components, interleaved and per-component scans") {
    val rnd = new scala.util.Random(223)
    val samp = Seq((1, 1), (1, 1), (1, 1))
    val (w, h) = (19, 11)
    val planes = losslessPlanes(rnd, w, h, samp, 8)
    checkLossless(w, h, samp, 8, planes, psel = 4, pt = 0, interleaved = true)
    checkLossless(w, h, samp, 8, planes, psel = 7, pt = 0, interleaved = false)
  }

  test("lossless point transform: decoder re-applies << Pt before scaling") {
    val rnd = new scala.util.Random(227)
    val (w, h) = (13, 9)
    // coded samples are P-Pt = 10-bit; the output undoes the transform
    checkLossless(w, h, Seq((1, 1)), 12,
      losslessPlanes(rnd, w, h, Seq((1, 1)), 10), psel = 5, pt = 2)
  }

  test("lossless restart markers reset prediction to the scan-start state") {
    val rnd = new scala.util.Random(229)
    val (w, h) = (21, 7)
    checkLossless(w, h, Seq((1, 1)), 8,
      losslessPlanes(rnd, w, h, Seq((1, 1)), 8), psel = 6, pt = 0, restart = 17)
  }

  test("lossless sampling factors: subsampled components walk MCUs of samples") {
    val rnd = new scala.util.Random(233)
    val samp = Seq((2, 1), (1, 1), (1, 1))
    val (w, h) = (22, 10)
    checkLossless(w, h, samp, 8, losslessPlanes(rnd, w, h, samp, 8),
      psel = 1, pt = 0, interleaved = true)
  }

  test("lossless 16-bit wraparound and the category-16 (32768) code") {
    // P=16, pt=0: the first sample's default prediction is 32768, so a
    // sample of 0 forces diff = 32768 -> the magnitude-bit-free cat 16;
    // neighbors at range extremes force modulo-2^16 wraparound diffs
    val plane = Array(0, 65535, 1, 32768, 65534, 2, 40000, 20000, 60000)
    checkLossless(3, 3, Seq((1, 1)), 16, Seq(plane), psel = 4, pt = 0)
    // and a 2-bit precision plane exercises the low extreme
    val rnd = new scala.util.Random(239)
    checkLossless(5, 4, Seq((1, 1)), 2,
      losslessPlanes(rnd, 5, 4, Seq((1, 1)), 2), psel = 2, pt = 0)
  }

  test("out-of-scope and malformed variants quarantine") {
    val rnd = new scala.util.Random(241)
    val samp = Seq((1, 1))
    val planes = losslessPlanes(rnd, 8, 8, samp, 8)
    val good = encodeLossless(8, 8, samp, 8, planes, psel = 1, pt = 0)
    assert(JpegCodec.decode(good).isDefined)
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone(); f(c); c
    }
    def findMarker(bs: Array[Byte], m: Int): Int =
      (0 until bs.length - 1).find(i =>
        (bs(i) & 0xff) == 0xff && (bs(i + 1) & 0xff) == m).get
    val sofAt = findMarker(good, 0xc3)
    val sosAt = findMarker(good, 0xda)
    // a differential frame OUTSIDE hierarchical mode (no DHP) quarantines
    // (SOF11 and the hierarchical processes are in scope since r13 —
    // JpegArithLosslessSpec / JpegHierSpec carry their positive paths)
    assert(JpegCodec.decode(patched(_(sofAt + 1) = 0xc5.toByte)).isEmpty)
    // predictor 0 (differential-only) and 8+ are invalid scan headers
    assert(JpegCodec.decode(patched(_(sosAt + 7) = 0.toByte)).isEmpty)
    assert(JpegCodec.decode(patched(_(sosAt + 7) = 8.toByte)).isEmpty)
    // point transform >= precision
    assert(JpegCodec.decode(patched(_(sosAt + 9) = 9.toByte)).isEmpty)
    // precision 1 and 17 are outside lossless range
    assert(JpegCodec.decode(patched(_(sofAt + 4) = 1.toByte)).isEmpty)
    assert(JpegCodec.decode(patched(_(sofAt + 4) = 17.toByte)).isEmpty)
    // truncation mid-scan
    assert(JpegCodec.decode(good.take(good.length - 6)).isEmpty)
    // a DCT frame claiming precision 9 is out of DCT scope
    val planes12 = Seq(randomBlocks12(rnd, 1))
    val seq12 = encode12(8, 8, samp, q16, planes12)
    val sof12 = findMarker(seq12, 0xc1)
    assert(JpegCodec.decode(seq12).isDefined) // sanity: well-formed
    assert(JpegCodec.decode(patched2(seq12, sof12 + 4, 9)).isEmpty)
  }

  private def patched2(bs: Array[Byte], at: Int, v: Int): Array[Byte] = {
    val c = bs.clone(); c(at) = v.toByte; c
  }
}
