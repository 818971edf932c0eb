package graft

import graft.operators.JpegCodec
import org.scalatest.funsuite.AnyFunSuite

/** JpegCodec validated the same way GifCodec was: against an independent
  * encoder + reference decode written here in the spec. The encoder
  * works directly in the frequency domain (it picks quantized
  * coefficients, not pixels), so the expected output is computable
  * exactly — dequantize, textbook non-separable IDCT (a DIFFERENT
  * formulation than the codec's separable one), level shift, round,
  * clamp, NN chroma upsample, JFIF YCbCr→RGB — with no lossy FDCT in
  * the loop. Every entropy-layer feature gets exercised: general
  * run/size AC coding with ZRL and EOB, DC prediction across blocks,
  * byte stuffing, restart markers, MCU padding, 4:2:0 interleaving.
  */
class JpegCodecSpec extends AnyFunSuite {

  // ---- minimal general-purpose baseline encoder (test-only) ----

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
    def align(): Unit = while (n != 0) bits(1, 1) // pad with 1s
    def raw(b: Int): Unit = { assert(n == 0); out += b.toByte }
  }

  /** Canonical codes from (bits, vals) — the encoder-side mirror of the
    * codec's decoder tables.
    */
  private def codes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val m = scala.collection.mutable.Map[Int, (Int, Int)]()
    for (l <- 1 to 16) {
      for (_ <- 0 until bits(l - 1)) { m(vals(k)) = (code, l); code += 1; k += 1 }
      code <<= 1
    }
    m.toMap
  }

  // general flat tables: DC cats 0-11 at 4 bits; AC gets every run/size
  // symbol PLUS all 15 EOBn symbols (progressive EOB-run lengths) at 8
  private val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val dcVals = (0 to 11).toArray
  private val acSyms: Array[Int] =
    ((0 to 14).map(_ << 4) ++ Seq(0xF0) ++
      (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)).sorted.toArray
  private val acBits = Array(0, 0, 0, 0, 0, 0, 0, acSyms.length, 0, 0, 0, 0, 0, 0, 0, 0)
  private val dcCode = codes(dcBits, dcVals)
  private val acCode = codes(acBits, acSyms)

  private def cat(v: Int): Int = { var t = 0; var a = math.abs(v); while (a > 0) { a >>= 1; t += 1 }; t }

  private def emitCoeffBlock(bw: BitWriter, coef: Array[Int], pred: Int): Int = {
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
    coef(0)
  }

  private val zig = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private def seg(bw: BitWriter, marker: Int, payload: Array[Int]): Unit = {
    bw.raw(0xff); bw.raw(marker)
    val len = payload.length + 2
    bw.raw(len >> 8); bw.raw(len & 0xff)
    payload.foreach(bw.raw)
  }

  /** Assemble a baseline JPEG: `samp` per component, `blocks(comp)(mcu
    * block index in scan order)` = quantized coefficient blocks.
    */
  private def encode(w: Int, h: Int, samp: Seq[(Int, Int)], q: Array[Int],
                     blocks: Seq[Seq[Array[Int]]], restart: Int = 0): Array[Byte] = {
    val bw = new BitWriter
    bw.raw(0xff); bw.raw(0xd8)
    seg(bw, 0xdb, 0 +: (0 until 64).map(i => q(zig(i))).toArray)
    seg(bw, 0xc4, 0x00 +: (dcBits ++ dcVals))
    seg(bw, 0xc4, 0x10 +: (acBits ++ acSyms))
    if (restart > 0) seg(bw, 0xdd, Array(restart >> 8, restart & 0xff))
    val nc = samp.length
    seg(bw, 0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, nc) ++
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
        pred(c) = emitCoeffBlock(bw, blocks(c)(idx(c)), pred(c))
        idx(c) += 1
      }
    }
    bw.align(); bw.raw(0xff); bw.raw(0xd9)
    bw.out.toArray
  }

  // ---- progressive encoder (T.81 G.1.2, the jcphuff dual) ----

  /** One progressive scan descriptor: `comps` (multiple ⇒ interleaved,
    * DC only), spectral band [ss,se], successive approximation ah→al.
    */
  private case class Scan(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int)

  /** The standard scan script: DC first+refine interleaved, then per
    * component split AC bands at Al=2 refined twice down to Al=0.
    */
  private def stdScript(nc: Int): Seq[Scan] = {
    val all = 0 until nc
    Seq(Scan(all, 0, 0, 0, 1), Scan(all, 0, 0, 1, 0)) ++
      all.flatMap(c => Seq(
        Scan(Seq(c), 1, 5, 0, 2), Scan(Seq(c), 6, 63, 0, 2),
        Scan(Seq(c), 1, 63, 2, 1), Scan(Seq(c), 1, 63, 1, 0)))
  }

  /** Assemble a progressive (SOF2) JPEG from quantized coefficient
    * blocks. `blocks(comp)` is indexed in the MCU-padded grid's
    * row-major order (blocksW = mcusX·h_c), matching the decoder grid.
    */
  private def encodeProg(w: Int, h: Int, samp: Seq[(Int, Int)], q: Array[Int],
                         blocks: Seq[Seq[Array[Int]]],
                         scans: Seq[Scan], restart: Int = 0): Array[Byte] = {
    val bw = new BitWriter
    bw.raw(0xff); bw.raw(0xd8)
    seg(bw, 0xdb, 0 +: (0 until 64).map(i => q(zig(i))).toArray)
    seg(bw, 0xc4, 0x00 +: (dcBits ++ dcVals))
    seg(bw, 0xc4, 0x10 +: (acBits ++ acSyms))
    if (restart > 0) seg(bw, 0xdd, Array(restart >> 8, restart & 0xff))
    val nc = samp.length
    seg(bw, 0xc2, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, nc) ++
      samp.zipWithIndex.flatMap { case ((sh, sv), i) => Seq(i + 1, (sh << 4) | sv, 0) })
    val hMax = samp.map(_._1).max; val vMax = samp.map(_._2).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val blocksW = samp.map(_._1 * mcusX)

    for (scan <- scans) {
      seg(bw, 0xda, Array(scan.comps.length) ++
        scan.comps.flatMap(c => Seq(c + 1, 0x00)) ++
        Seq(scan.ss, scan.se, (scan.ah << 4) | scan.al))
      var eobrun = 0
      val eobBits = scala.collection.mutable.ArrayBuffer[Int]()
      def emitEobrun(): Unit = {
        if (eobrun > 0) {
          val nb = 31 - Integer.numberOfLeadingZeros(eobrun)
          val (c, l) = acCode(nb << 4); bw.bits(c, l)
          if (nb > 0) bw.bits(eobrun & ((1 << nb) - 1), nb)
          eobrun = 0
        }
        eobBits.foreach(bw.bits(_, 1)); eobBits.clear()
      }
      val pred = new Array[Int](nc)

      def dcFirst(ci: Int, v: Int): Unit = {
        val value = v >> scan.al // arithmetic shift per G.1.2.1
        val diff = value - pred(ci); pred(ci) = value
        val t = cat(diff)
        val (c, l) = dcCode(t); bw.bits(c, l)
        if (t > 0) bw.bits(if (diff >= 0) diff else diff + (1 << t) - 1, t)
      }

      def acFirst(coefs: Array[Int]): Unit = {
        var r = 0
        for (k <- scan.ss to scan.se) {
          val t = coefs(zig(k)) / (1 << scan.al) // truncate toward zero
          if (t == 0) r += 1
          else {
            emitEobrun()
            while (r > 15) { val (zc, zl) = acCode(0xF0); bw.bits(zc, zl); r -= 16 }
            val s = cat(t)
            val (c, l) = acCode((r << 4) | s); bw.bits(c, l)
            bw.bits(if (t >= 0) t else t + (1 << s) - 1, s)
            r = 0
          }
        }
        if (r > 0) { eobrun += 1; if (eobrun == 0x7fff) emitEobrun() }
      }

      def acRefine(coefs: Array[Int]): Unit = {
        val band = (scan.ss to scan.se).toArray
        val t = band.map(k => math.abs(coefs(zig(k))) >> scan.al)
        val eobPos = band.indices.reverse.find(i => t(i) == 1).getOrElse(-1)
        var r = 0
        val pending = scala.collection.mutable.ArrayBuffer[Int]()
        for (i <- band.indices) {
          if (t(i) == 0) r += 1
          else {
            while (r > 15 && i <= eobPos) {
              emitEobrun()
              val (zc, zl) = acCode(0xF0); bw.bits(zc, zl); r -= 16
              pending.foreach(bw.bits(_, 1)); pending.clear()
            }
            if (t(i) > 1) pending += (t(i) & 1) // already significant
            else { // newly significant (t == 1)
              emitEobrun()
              val (c, l) = acCode((r << 4) | 1); bw.bits(c, l)
              bw.bits(if (coefs(zig(band(i))) >= 0) 1 else 0, 1)
              pending.foreach(bw.bits(_, 1)); pending.clear()
              r = 0
            }
          }
        }
        if (r > 0 || pending.nonEmpty) {
          eobrun += 1; eobBits ++= pending
          if (eobrun == 0x7fff) emitEobrun()
        }
      }

      def encodeBlock(ci: Int, coefs: Array[Int]): Unit =
        if (scan.ss == 0) {
          if (scan.ah == 0) dcFirst(ci, coefs(0))
          else bw.bits((coefs(0) >> scan.al) & 1, 1)
        } else if (scan.ah == 0) acFirst(coefs)
        else acRefine(coefs)

      var rst = 0; var unit = 0
      def maybeRestart(): Unit =
        if (restart > 0 && unit > 0 && unit % restart == 0) {
          emitEobrun(); bw.align()
          bw.raw(0xff); bw.raw(0xd0 + rst); rst = (rst + 1) & 7
          java.util.Arrays.fill(pred, 0)
        }

      if (scan.comps.length == 1) {
        val ci = scan.comps.head
        val (sh, sv) = samp(ci)
        val nbx = math.max((w * sh + 8 * hMax - 1) / (8 * hMax), 1)
        val nby = math.max((h * sv + 8 * vMax - 1) / (8 * vMax), 1)
        while (unit < nbx * nby) {
          maybeRestart()
          encodeBlock(ci, blocks(ci)((unit / nbx) * blocksW(ci) + unit % nbx))
          unit += 1
        }
      } else {
        while (unit < mcusX * mcusY) {
          maybeRestart()
          val mx = unit % mcusX; val my = unit / mcusX
          for (ci <- scan.comps; by <- 0 until samp(ci)._2; bx <- 0 until samp(ci)._1)
            encodeBlock(ci, blocks(ci)((my * samp(ci)._2 + by) * blocksW(ci) +
              mx * samp(ci)._1 + bx))
          unit += 1
        }
      }
      emitEobrun()
      bw.align()
    }
    bw.raw(0xff); bw.raw(0xd9)
    bw.out.toArray
  }

  // ---- independent reference decode ----

  /** Textbook direct (non-separable) IDCT of dequantized coefficients. */
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
      val p = math.round(s / 4.0 + 128.0).toInt
      out(y * 8 + x) = math.max(0, math.min(255, p))
    }
    out
  }

  /** Reference planes → RGB24 with the documented NN upsample + JFIF
    * matrix (independent re-implementation of the codec's contract).
    */
  private def refRgb(w: Int, h: Int, samp: Seq[(Int, Int)],
                     planes: Seq[Array[Int]], planeW: Seq[Int]): Array[Byte] = {
    val hMax = samp.map(_._1).max; val vMax = samp.map(_._2).max
    val rgb = new Array[Byte](w * h * 3)
    def sm(ci: Int, x: Int, y: Int): Int =
      planes(ci)((y * samp(ci)._2 / vMax) * planeW(ci) + x * samp(ci)._1 / hMax)
    def cl(d: Double): Byte = math.max(0, math.min(255, math.round(d).toInt)).toByte
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      if (samp.length >= 3) {
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

  /** Build component planes from the same block sequence the encoder got. */
  private def buildPlanes(w: Int, h: Int, samp: Seq[(Int, Int)], q: Array[Int],
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
      val sp = refIdct(blocks(c)(idx(c)), q); idx(c) += 1
      for (yy <- 0 until 8; xx <- 0 until 8)
        planes(c)((py + yy) * planeWs(c) + px + xx) = sp(yy * 8 + xx)
    }
    (planes, planeWs)
  }

  /** Reference planes for GRID-ordered blocks (the progressive layout:
    * index = row·blocksW + col in the MCU-padded grid).
    */
  private def buildPlanesGrid(w: Int, h: Int, samp: Seq[(Int, Int)], q: Array[Int],
                              blocks: Seq[Seq[Array[Int]]]): (Seq[Array[Int]], Seq[Int]) = {
    val hMax = samp.map(_._1).max; val vMax = samp.map(_._2).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val planeWs = samp.map { case (sh, _) => mcusX * sh * 8 }
    val planes = samp.zip(planeWs).map { case ((_, sv), pw) => new Array[Int](pw * mcusY * sv * 8) }
    for (c <- samp.indices) {
      val bwid = mcusX * samp(c)._1
      for (i <- blocks(c).indices) {
        val sp = refIdct(blocks(c)(i), q)
        val px = (i % bwid) * 8; val py = (i / bwid) * 8
        for (yy <- 0 until 8; xx <- 0 until 8)
          planes(c)((py + yy) * planeWs(c) + px + xx) = sp(yy * 8 + xx)
      }
    }
    (planes, planeWs)
  }

  private def checkProg(w: Int, h: Int, samp: Seq[(Int, Int)], q: Array[Int],
                        blocks: Seq[Seq[Array[Int]]], scans: Seq[Scan],
                        restart: Int = 0): Unit = {
    val jpeg = encodeProg(w, h, samp, q, blocks, scans, restart)
    val got = JpegCodec.decodeOrThrow(jpeg).getOrElse(fail("progressive decode returned None"))
    assert(got.w == w && got.h == h)
    val (planes, planeWs) = buildPlanesGrid(w, h, samp, q, blocks)
    val want = refRgb(w, h, samp, planes, planeWs)
    val bad = got.rgb.zip(want).zipWithIndex.filter { case ((a, b), _) => a != b }
    assert(bad.isEmpty, s"${bad.length} byte mismatches, first at ${bad.headOption.map(_._2)}")
  }

  private def randomBlocks(rnd: scala.util.Random, n: Int, dense: Boolean): Seq[Array[Int]] =
    Seq.fill(n) {
      val b = new Array[Int](64)
      b(0) = rnd.nextInt(401) - 200
      val nAc = if (dense) 20 + rnd.nextInt(43) else rnd.nextInt(6)
      for (_ <- 0 until nAc) b(1 + rnd.nextInt(63)) = rnd.nextInt(61) - 30
      b
    }

  private val qReal: Array[Int] = (0 until 64).map(i => 2 + (i * 3) % 17).toArray

  private def check(w: Int, h: Int, samp: Seq[(Int, Int)], q: Array[Int],
                    blocks: Seq[Seq[Array[Int]]], restart: Int = 0): Unit = {
    val jpeg = encode(w, h, samp, q, blocks, restart)
    val got = JpegCodec.decodeOrThrow(jpeg).getOrElse(fail("decode returned None"))
    assert(got.w == w && got.h == h)
    val (planes, planeWs) = buildPlanes(w, h, samp, q, blocks)
    val want = refRgb(w, h, samp, planes, planeWs)
    assert(got.rgb.length == want.length)
    val bad = got.rgb.zip(want).zipWithIndex.filter { case ((a, b), _) => a != b }
    assert(bad.isEmpty, s"${bad.length} byte mismatches, first at ${bad.headOption.map(_._2)}")
  }

  private def nBlocks(w: Int, h: Int, samp: Seq[(Int, Int)], c: Int): Int = {
    val hMax = samp.map(_._1).max; val vMax = samp.map(_._2).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    mcusX * mcusY * samp(c)._1 * samp(c)._2
  }

  test("grayscale fuzz: random coefficient blocks decode to the exact reference pixels") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 8) {
      val (w, h) = (8 * (1 + rnd.nextInt(4)), 8 * (1 + rnd.nextInt(4)))
      val samp = Seq((1, 1))
      check(w, h, samp, qReal,
        Seq(randomBlocks(rnd, nBlocks(w, h, samp, 0), dense = trial % 2 == 0)))
    }
  }

  test("MCU padding: non-multiple-of-8 dims crop correctly") {
    val rnd = new scala.util.Random(7)
    val samp = Seq((1, 1))
    check(20, 12, samp, qReal, Seq(randomBlocks(rnd, nBlocks(20, 12, samp, 0), dense = true)))
  }

  test("color 4:4:4: interleaved three-component scan, JFIF matrix exact") {
    val rnd = new scala.util.Random(11)
    val samp = Seq((1, 1), (1, 1), (1, 1))
    val (w, h) = (16, 16)
    check(w, h, samp, qReal, samp.indices.map(c =>
      randomBlocks(rnd, nBlocks(w, h, samp, c), dense = c == 0)))
  }

  test("color 4:2:0: subsampled chroma with NN upsampling exact") {
    val rnd = new scala.util.Random(13)
    val samp = Seq((2, 2), (1, 1), (1, 1))
    val (w, h) = (32, 16)
    check(w, h, samp, qReal, samp.indices.map(c =>
      randomBlocks(rnd, nBlocks(w, h, samp, c), dense = true)))
  }

  test("color 4:2:2 and asymmetric 1x2 sampling") {
    val rnd = new scala.util.Random(17)
    for (samp <- Seq(Seq((2, 1), (1, 1), (1, 1)), Seq((1, 2), (1, 1), (1, 1)))) {
      val (w, h) = (16, 32)
      check(w, h, samp, qReal, samp.indices.map(c =>
        randomBlocks(rnd, nBlocks(w, h, samp, c), dense = true)))
    }
  }

  test("restart markers: predictors reset, stream realigns") {
    val rnd = new scala.util.Random(19)
    val samp = Seq((1, 1))
    val (w, h) = (40, 24) // 15 MCUs, restart every 4 -> RST0..RST2
    check(w, h, samp, qReal,
      Seq(randomBlocks(rnd, nBlocks(w, h, samp, 0), dense = true)), restart = 4)
  }

  private def sparseBlocks(rnd: scala.util.Random, n: Int): Seq[Array[Int]] =
    Seq.fill(n) {
      val b = new Array[Int](64)
      rnd.nextInt(4) match {
        case 0 => // all-zero: pure EOB-run fodder
        case 1 => b(0) = rnd.nextInt(201) - 100 // DC only
        case 2 => // DC + one high-frequency coef (long ZRL runs)
          b(0) = rnd.nextInt(201) - 100
          b(1 + rnd.nextInt(63)) = rnd.nextInt(25) - 12
        case _ =>
          b(0) = rnd.nextInt(201) - 100
          for (_ <- 0 until 8) b(1 + rnd.nextInt(63)) = rnd.nextInt(25) - 12
      }
      b
    }

  test("progressive grayscale: spectral selection + successive approximation exact") {
    val rnd = new scala.util.Random(29)
    for (trial <- 0 until 6) {
      val (w, h) = (8 * (1 + rnd.nextInt(4)), 8 * (1 + rnd.nextInt(4)))
      val samp = Seq((1, 1))
      val blocks = Seq(
        if (trial % 2 == 0) randomBlocks(rnd, nBlocks(w, h, samp, 0), dense = true)
        else sparseBlocks(rnd, nBlocks(w, h, samp, 0)))
      checkProg(w, h, samp, qReal, blocks, stdScript(1))
    }
  }

  test("progressive EOB runs span blocks with buffered correction bits") {
    val rnd = new scala.util.Random(31)
    val samp = Seq((1, 1))
    val (w, h) = (64, 40) // 40 blocks: long EOB runs across blocks
    checkProg(w, h, samp, qReal, Seq(sparseBlocks(rnd, nBlocks(w, h, samp, 0))),
      stdScript(1))
  }

  test("progressive color 4:2:0: per-component AC scans, interleaved DC") {
    val rnd = new scala.util.Random(37)
    val samp = Seq((2, 2), (1, 1), (1, 1))
    val (w, h) = (32, 16)
    checkProg(w, h, samp, qReal, samp.indices.map(c =>
      if (c == 0) randomBlocks(rnd, nBlocks(w, h, samp, c), dense = true)
      else sparseBlocks(rnd, nBlocks(w, h, samp, c))), stdScript(3))
  }

  test("progressive 4:4:4 with MCU padding dims") {
    val rnd = new scala.util.Random(41)
    val samp = Seq((1, 1), (1, 1), (1, 1))
    val (w, h) = (20, 12)
    checkProg(w, h, samp, qReal, samp.indices.map(_ =>
      randomBlocks(rnd, nBlocks(w, h, samp, 0), dense = true)), stdScript(3))
  }

  test("progressive restart markers reset predictors and EOB runs") {
    val rnd = new scala.util.Random(43)
    val samp = Seq((1, 1))
    val (w, h) = (48, 24) // 18 blocks, restart every 5
    checkProg(w, h, samp, qReal, Seq(sparseBlocks(rnd, nBlocks(w, h, samp, 0))),
      stdScript(1), restart = 5)
  }

  test("garbage quarantines: truncated, progressive, oversized, non-JPEG") {
    val rnd = new scala.util.Random(23)
    val samp = Seq((1, 1))
    val good = encode(16, 16, samp, qReal,
      Seq(randomBlocks(rnd, nBlocks(16, 16, samp, 0), dense = true)))
    assert(JpegCodec.decode(good).isDefined)
    // truncation in the headers or mid-scan must return None, never throw
    for (cut <- Seq(0, 1, 2, 3, 10, 40, good.length / 2, good.length - 20))
      assert(JpegCodec.decode(good.take(cut)).isEmpty, s"cut=$cut")
    // a missing EOI after a complete scan still decodes (standard
    // decoder leniency — the entropy data proved itself)
    assert(JpegCodec.decode(good.dropRight(2)).isDefined)
    // a baseline stream relabeled SOF2 is MALFORMED progressive (its one
    // scan claims the full band interleaved) — quarantined, not decoded
    val prog = good.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog).isEmpty)
    // a baseline stream relabeled SOF3 is MALFORMED lossless (its scan
    // header carries Ss=0/Se=63, not a predictor) — quarantined; real
    // lossless coverage lives in JpegExtSpec
    val lossless = good.clone()
    lossless(sofAt + 1) = 0xc3.toByte
    assert(JpegCodec.decode(lossless).isEmpty)
    // hostile dims: 65535x65535 would be 12 GiB of planes
    val big = good.clone()
    big(sofAt + 5) = 0xff.toByte; big(sofAt + 6) = 0xff.toByte
    big(sofAt + 7) = 0xff.toByte; big(sofAt + 8) = 0xff.toByte
    assert(JpegCodec.decode(big).isEmpty)
    assert(JpegCodec.decode("not a jpeg at all".getBytes).isEmpty)
    assert(JpegCodec.decode(Array[Byte]()).isEmpty)
    // SOS naming a component id absent from SOF: the one parse error
    // raised by lookup (not require/array access) — must quarantine
    // under the r8 narrowed catch, not escape as a RuntimeException
    val badComp = good.clone()
    val sosAt = (0 until badComp.length - 1).find(i =>
      (badComp(i) & 0xff) == 0xff && (badComp(i + 1) & 0xff) == 0xda).get
    badComp(sosAt + 5) = 9.toByte // first scan-component id -> unknown
    assert(JpegCodec.decode(badComp).isEmpty)
  }
}
