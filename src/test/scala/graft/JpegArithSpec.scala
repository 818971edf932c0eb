package graft

import graft.operators.{JpegArith, JpegCodec}
import org.scalatest.funsuite.AnyFunSuite

/** Arithmetic-coded JPEG (SOF9/SOF10) validated the established way: a
  * test-only ENCODER written here — the QM encoder of T.81 D.1 with the
  * carry/byte-stuffing output stage, plus the DC/AC context models —
  * and an independent reference decode of the same quantized
  * coefficients (textbook non-separable IDCT + the documented
  * upsample/JFIF contract). The coder itself is additionally
  * round-tripped at the bit level, with skewed streams that walk the
  * probability ladder deep and adversarial runs that force carry
  * propagation over stacked 0xFF bytes.
  */
class JpegArithSpec extends AnyFunSuite {

  // ---- QM encoder: shared test dual (QmEncoder.scala) ----

  test("QM coder round-trips adversarial bit streams exactly") {
    val rnd = new scala.util.Random(307)
    // three regimes: balanced, heavily skewed (walks the ladder deep),
    // and long constant runs (forces carries over stacked 0xFF bytes)
    val streams: Seq[Array[Int]] = Seq(
      Array.fill(4000)(rnd.nextInt(2)),
      Array.fill(6000)(if (rnd.nextInt(50) == 0) 1 else 0),
      Array.fill(3000)(1) ++ Array.fill(3000)(0) ++
        Array.tabulate(2000)(i => if (i % 97 == 0) 1 else 0))
    for ((bits, si) <- streams.zipWithIndex; nCtx <- Seq(1, 4)) {
      val enc = new QmEncoder
      val encSt = JpegArith.stats(nCtx)
      bits.zipWithIndex.foreach { case (bit, j) => enc.encode(encSt, j % nCtx, bit) }
      enc.flush()
      val data = enc.out.toArray ++ Array(0xff.toByte, 0xd9.toByte)
      val dec = new JpegArith.Decoder(data, 0)
      val decSt = JpegArith.stats(nCtx)
      val got = bits.indices.map(j => dec.decode(decSt, j % nCtx))
      assert(got == bits.toSeq, s"stream $si nCtx $nCtx diverged")
      assert(java.util.Arrays.equals(encSt, decSt),
        s"stream $si nCtx $nCtx: final statistics state diverged")
    }
  }

  test("the fixed bin never adapts and codes ~1 bit per decision") {
    val rnd = new scala.util.Random(311)
    val bits = Array.fill(2048)(rnd.nextInt(2))
    val enc = new QmEncoder
    val fb = JpegArith.fixedBin
    bits.foreach(enc.encode(fb, 0, _))
    assert((fb(0) & 0x7f) == JpegArith.FixedState && (fb(0) & 0x80) == 0)
    enc.flush()
    // random bits on a 0.5 state must cost ~1 bit each (no miracle, no blowup)
    assert(math.abs(enc.out.length - 2048 / 8) < 64, s"got ${enc.out.length} bytes")
    val dec = new JpegArith.Decoder(enc.out.toArray, 0)
    assert(bits.indices.map(_ => dec.decode(JpegArith.fixedBin, 0)) == bits.toSeq)
  }

  // ---- JPEG-layer encoder: context models over the QM coder ----

  private val zig = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private def seg(out: scala.collection.mutable.ArrayBuffer[Byte],
                  marker: Int, payload: Array[Int]): Unit = {
    out += 0xff.toByte; out += marker.toByte
    val len = payload.length + 2
    out += (len >> 8).toByte; out += (len & 0xff).toByte
    payload.foreach(p => out += p.toByte)
  }

  private case class Scan(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int)

  /** Assemble an arithmetic JPEG (SOF9 when `scans` is the single
    * full-band scan, SOF10 otherwise) from quantized coefficient blocks
    * in the MCU-padded GRID order. The context models below mirror
    * T.81 F.1.4 (DC conditioning, AC Kx split) — the encoder duals of
    * the decoder's F.2.2/G.2 models.
    */
  private def encodeArith(w: Int, h: Int, samp: Seq[(Int, Int)], q: Array[Int],
                          blocks: Seq[Seq[Array[Int]]], scans: Seq[Scan],
                          progressive: Boolean, precision: Int = 8,
                          restart: Int = 0, condDc: (Int, Int) = (0, 1),
                          condKx: Int = 5): Array[Byte] = {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    out += 0xff.toByte; out += 0xd8.toByte
    if (precision == 12)
      seg(out, 0xdb, 0x10 +: (0 until 64).flatMap(i =>
        Seq(q(zig(i)) >> 8, q(zig(i)) & 0xff)).toArray)
    else
      seg(out, 0xdb, 0 +: (0 until 64).map(i => q(zig(i))).toArray)
    // DAC: DC table 0 conditioning + AC table 0 Kx
    seg(out, 0xcc, Array(0x00, (condDc._2 << 4) | condDc._1, 0x10, condKx))
    if (restart > 0) seg(out, 0xdd, Array(restart >> 8, restart & 0xff))
    val nc = samp.length
    seg(out, if (progressive) 0xca else 0xc9,
      Array(precision, h >> 8, h & 0xff, w >> 8, w & 0xff, nc) ++
        samp.zipWithIndex.flatMap { case ((sh, sv), i) => Seq(i + 1, (sh << 4) | sv, 0) })
    val hMax = samp.map(_._1).max; val vMax = samp.map(_._2).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val blocksW = samp.map(_._1 * mcusX)

    for (scan <- scans) {
      seg(out, 0xda, Array(scan.comps.length) ++
        scan.comps.flatMap(c => Seq(c + 1, 0x00)) ++
        Seq(scan.ss, scan.se, (scan.ah << 4) | scan.al))
      val enc = new QmEncoder
      var dcStats = JpegArith.stats(64)
      var acStats = JpegArith.stats(256)
      val fixed = JpegArith.fixedBin
      val pred = new Array[Int](nc)
      val dcCtx = new Array[Int](nc)

      def encDc(ci: Int, dcVal: Int): Unit = {
        val sv = dcVal >> scan.al
        val diff = sv - pred(ci); pred(ci) = sv
        val ctx = dcCtx(ci)
        if (diff == 0) { enc.encode(dcStats, ctx, 0); dcCtx(ci) = 0 }
        else {
          enc.encode(dcStats, ctx, 1)
          val sign = if (diff < 0) 1 else 0
          enc.encode(dcStats, ctx + 1, sign)
          val e = math.abs(diff) - 1
          var sp = ctx + 2 + sign
          val m = if (e == 0) 0 else Integer.highestOneBit(e)
          enc.encode(dcStats, sp, if (e == 0) 0 else 1)
          if (e > 0) {
            sp = 20
            var mm = 1
            while (mm < m) { enc.encode(dcStats, sp, 1); mm <<= 1; sp += 1 }
            enc.encode(dcStats, sp, 0)
          }
          dcCtx(ci) =
            if (m < ((1 << condDc._1) >> 1)) 0
            else if (m > ((1 << condDc._2) >> 1)) 12 + sign * 4
            else 4 + sign * 4
          sp += 14
          var b = m >> 1
          while (b != 0) {
            enc.encode(dcStats, sp, if ((e & b) != 0) 1 else 0); b >>= 1
          }
        }
      }

      def encAcBand(coefs: Array[Int], lo: Int, hi: Int): Unit = {
        def t(k: Int): Int = coefs(zig(k)) / (1 << scan.al)
        var kEnd = hi
        while (kEnd >= lo && t(kEnd) == 0) kEnd -= 1
        var k = lo
        while (k <= kEnd) {
          enc.encode(acStats, 3 * (k - 1), 0) // not EOB
          while (t(k) == 0) { enc.encode(acStats, 3 * (k - 1) + 1, 0); k += 1 }
          enc.encode(acStats, 3 * (k - 1) + 1, 1)
          val v = t(k)
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
              sp = if (k <= condKx) 189 else 217
              var mm = 2
              while (mm < m) { enc.encode(acStats, sp, 1); mm <<= 1; sp += 1 }
              enc.encode(acStats, sp, 0)
            }
          }
          sp += 14
          var b = m >> 1
          while (b != 0) {
            enc.encode(acStats, sp, if ((e & b) != 0) 1 else 0); b >>= 1
          }
          k += 1
        }
        if (kEnd < hi) enc.encode(acStats, 3 * (k - 1), 1) // EOB
      }

      def encAcRefine(coefs: Array[Int]): Unit = {
        val p1 = 1 << scan.al
        def cur(k: Int): Int = coefs(zig(k)) / p1
        def prev(k: Int): Int = coefs(zig(k)) / (p1 << 1)
        var kex = scan.se
        while (kex > 0 && prev(kex) == 0) kex -= 1
        var kEnd = scan.se
        while (kEnd >= scan.ss && cur(kEnd) == 0) kEnd -= 1
        var k = scan.ss
        var eob = false
        while (!eob && k <= scan.se) {
          if (k > kex) {
            if (k > kEnd) { enc.encode(acStats, 3 * (k - 1), 1); eob = true }
            else enc.encode(acStats, 3 * (k - 1), 0)
          }
          if (!eob) {
            var done = false
            while (!done) {
              if (prev(k) != 0) { // history: correction bit
                enc.encode(acStats, 3 * (k - 1) + 2, math.abs(cur(k)) & 1)
                done = true
              } else if (cur(k) != 0) { // newly significant (|cur| == 1)
                enc.encode(acStats, 3 * (k - 1) + 1, 1)
                enc.encode(fixed, 0, if (cur(k) < 0) 1 else 0)
                done = true
              } else {
                enc.encode(acStats, 3 * (k - 1) + 1, 0); k += 1
              }
            }
            k += 1
          }
        }
      }

      def encBlock(ci: Int, coefs: Array[Int]): Unit =
        if (!progressive) { encDc(ci, coefs(0)); encAcBand(coefs, 1, 63) }
        else if (scan.ss == 0) {
          if (scan.ah == 0) encDc(ci, coefs(0))
          else enc.encode(fixed, 0, (coefs(0) >> scan.al) & 1)
        } else if (scan.ah == 0) encAcBand(coefs, scan.ss, scan.se)
        else encAcRefine(coefs)

      var rst = 0; var unit = 0
      def maybeRestart(): Unit =
        if (restart > 0 && unit > 0 && unit % restart == 0) {
          enc.flush(); enc.rawMarker(0xd0 + rst); rst = (rst + 1) & 7
          dcStats = JpegArith.stats(64); acStats = JpegArith.stats(256)
          java.util.Arrays.fill(pred, 0); java.util.Arrays.fill(dcCtx, 0)
        }

      if (scan.comps.length == 1) {
        val ci = scan.comps.head
        val (sh, sv) = samp(ci)
        val nbx = math.max((w * sh + 8 * hMax - 1) / (8 * hMax), 1)
        val nby = math.max((h * sv + 8 * vMax - 1) / (8 * vMax), 1)
        while (unit < nbx * nby) {
          maybeRestart()
          encBlock(ci, blocks(ci)((unit / nbx) * blocksW(ci) + unit % nbx))
          unit += 1
        }
      } else {
        while (unit < mcusX * mcusY) {
          maybeRestart()
          val mx = unit % mcusX; val my = unit / mcusX
          for (ci <- scan.comps; by <- 0 until samp(ci)._2; bx <- 0 until samp(ci)._1)
            encBlock(ci, blocks(ci)((my * samp(ci)._2 + by) * blocksW(ci) +
              mx * samp(ci)._1 + bx))
          unit += 1
        }
      }
      enc.flush()
      out ++= enc.out
    }
    out += 0xff.toByte; out += 0xd9.toByte
    out.toArray
  }

  // ---- independent reference decode (the JpegCodecSpec discipline) ----

  private def refIdct(coef: Array[Int], q: Array[Int], precision: Int): Array[Int] = {
    val shift = 1 << (precision - 1); val maxv = (1 << precision) - 1
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
      val p = math.round(s / 4.0 + shift).toInt
      out(y * 8 + x) = math.max(0, math.min(maxv, p)) >> (precision - 8)
    }
    out
  }

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

  /** Reference planes from GRID-ordered blocks (the decoder's layout). */
  private def buildPlanes(w: Int, h: Int, samp: Seq[(Int, Int)], q: Array[Int],
                          blocks: Seq[Seq[Array[Int]]],
                          precision: Int): (Seq[Array[Int]], Seq[Int]) = {
    val hMax = samp.map(_._1).max; val vMax = samp.map(_._2).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val planeWs = samp.map { case (sh, _) => mcusX * sh * 8 }
    val planes = samp.zip(planeWs).map { case ((_, sv), pw) =>
      new Array[Int](pw * mcusY * sv * 8) }
    for (c <- samp.indices) {
      val bwid = mcusX * samp(c)._1
      for (i <- blocks(c).indices) {
        val sp = refIdct(blocks(c)(i), q, precision)
        val px = (i % bwid) * 8; val py = (i / bwid) * 8
        for (yy <- 0 until 8; xx <- 0 until 8)
          planes(c)((py + yy) * planeWs(c) + px + xx) = sp(yy * 8 + xx)
      }
    }
    (planes, planeWs)
  }

  private def nBlocks(w: Int, h: Int, samp: Seq[(Int, Int)], c: Int): Int = {
    val hMax = samp.map(_._1).max; val vMax = samp.map(_._2).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    mcusX * mcusY * samp(c)._1 * samp(c)._2
  }

  private def randomBlocks(rnd: scala.util.Random, n: Int, dense: Boolean,
                           dcRange: Int = 200, acRange: Int = 30): Seq[Array[Int]] =
    Seq.fill(n) {
      val b = new Array[Int](64)
      b(0) = rnd.nextInt(2 * dcRange + 1) - dcRange
      val nAc = if (dense) 20 + rnd.nextInt(43) else rnd.nextInt(6)
      for (_ <- 0 until nAc)
        b(1 + rnd.nextInt(63)) = rnd.nextInt(2 * acRange + 1) - acRange
      b
    }

  private val qReal: Array[Int] = (0 until 64).map(i => 2 + (i * 3) % 17).toArray

  private val seqScan = Seq(Scan(Seq(0, 1, 2), 0, 63, 0, 0))
  private def seqScanN(nc: Int) = Seq(Scan(0 until nc, 0, 63, 0, 0))

  private def progScript(nc: Int): Seq[Scan] = {
    val all = 0 until nc
    Seq(Scan(all, 0, 0, 0, 1), Scan(all, 0, 0, 1, 0)) ++
      all.flatMap(c => Seq(
        Scan(Seq(c), 1, 5, 0, 2), Scan(Seq(c), 6, 63, 0, 2),
        Scan(Seq(c), 1, 63, 2, 1), Scan(Seq(c), 1, 63, 1, 0)))
  }

  private def checkArith(w: Int, h: Int, samp: Seq[(Int, Int)],
                         blocks: Seq[Seq[Array[Int]]], scans: Seq[Scan],
                         progressive: Boolean, precision: Int = 8,
                         restart: Int = 0, condDc: (Int, Int) = (0, 1),
                         condKx: Int = 5): Unit = {
    val jpeg = encodeArith(w, h, samp, qReal, blocks, scans, progressive,
      precision, restart, condDc, condKx)
    val got = JpegCodec.decodeOrThrow(jpeg).getOrElse(
      fail(s"arithmetic decode returned None (prog=$progressive P=$precision)"))
    assert(got.w == w && got.h == h)
    val (planes, planeWs) = buildPlanes(w, h, samp, qReal, blocks, precision)
    val want = refRgb(w, h, samp, planes, planeWs)
    val bad = got.rgb.zip(want).zipWithIndex.filter { case ((a, b), _) => a != b }
    assert(bad.isEmpty,
      s"prog=$progressive P=$precision: ${bad.length} byte mismatches, " +
        s"first at ${bad.headOption.map(_._2)}")
  }

  test("arithmetic sequential grayscale fuzz: exact reference pixels") {
    val rnd = new scala.util.Random(401)
    for (trial <- 0 until 6) {
      val (w, h) = (8 * (1 + rnd.nextInt(4)), 8 * (1 + rnd.nextInt(4)))
      val samp = Seq((1, 1))
      checkArith(w, h, samp,
        Seq(randomBlocks(rnd, nBlocks(w, h, samp, 0), dense = trial % 2 == 0)),
        seqScanN(1), progressive = false)
    }
  }

  test("arithmetic sequential color 4:2:0 with padding dims") {
    val rnd = new scala.util.Random(409)
    val samp = Seq((2, 2), (1, 1), (1, 1))
    val (w, h) = (36, 20) // pads to 3x2 MCUs of 16x16
    checkArith(w, h, samp, samp.indices.map(c =>
      randomBlocks(rnd, nBlocks(w, h, samp, c), dense = true)),
      seqScan, progressive = false)
  }

  test("arithmetic restart markers: coder, statistics and DC state reset") {
    val rnd = new scala.util.Random(419)
    val samp = Seq((1, 1))
    val (w, h) = (40, 24) // 15 MCUs, restart every 4
    checkArith(w, h, samp,
      Seq(randomBlocks(rnd, nBlocks(w, h, samp, 0), dense = true)),
      seqScanN(1), progressive = false, restart = 4)
  }

  test("DAC conditioning variants change the coded stream, not the pixels") {
    val rnd = new scala.util.Random(421)
    val samp = Seq((1, 1))
    val (w, h) = (24, 24)
    val blocks = Seq(randomBlocks(rnd, nBlocks(w, h, samp, 0), dense = true))
    for ((dc, kx) <- Seq(((0, 1), 5), ((2, 4), 1), ((0, 0), 63), ((4, 8), 20)))
      checkArith(w, h, samp, blocks, seqScanN(1), progressive = false,
        condDc = dc, condKx = kx)
  }

  test("arithmetic 12-bit sequential: wide-range coefficients, 16-bit qtable") {
    val rnd = new scala.util.Random(431)
    val samp = Seq((1, 1))
    val (w, h) = (16, 16)
    // NOTE: precision 12 reuses qReal values (all < 256) but ships them
    // through the Pq=1 16-bit DQT path; coefficients push DC categories
    // past the 8-bit range
    checkArith(w, h, samp,
      Seq(randomBlocks(rnd, nBlocks(w, h, samp, 0), dense = true,
        dcRange = 3000, acRange = 1500)),
      seqScanN(1), progressive = false, precision = 12)
  }

  test("arithmetic progressive grayscale: SA chain + spectral bands exact") {
    val rnd = new scala.util.Random(433)
    for (trial <- 0 until 4) {
      val (w, h) = (8 * (1 + rnd.nextInt(3)), 8 * (1 + rnd.nextInt(3)))
      val samp = Seq((1, 1))
      checkArith(w, h, samp,
        Seq(randomBlocks(rnd, nBlocks(w, h, samp, 0), dense = trial % 2 == 0)),
        progScript(1), progressive = true)
    }
  }

  test("arithmetic progressive color 4:2:0: interleaved DC, per-component AC") {
    val rnd = new scala.util.Random(439)
    val samp = Seq((2, 2), (1, 1), (1, 1))
    val (w, h) = (32, 16)
    checkArith(w, h, samp, samp.indices.map(c =>
      randomBlocks(rnd, nBlocks(w, h, samp, c), dense = c == 0)),
      progScript(3), progressive = true)
  }

  test("arithmetic progressive restart markers") {
    val rnd = new scala.util.Random(443)
    val samp = Seq((1, 1))
    val (w, h) = (48, 24) // 18 blocks, restart every 5
    checkArith(w, h, samp,
      Seq(randomBlocks(rnd, nBlocks(w, h, samp, 0), dense = false)),
      progScript(1), progressive = true, restart = 5)
  }

  test("malformed arithmetic streams quarantine") {
    val rnd = new scala.util.Random(449)
    val samp = Seq((1, 1))
    val blocks = Seq(randomBlocks(rnd, nBlocks(16, 16, samp, 0), dense = true))
    val good = encodeArith(16, 16, samp, qReal, blocks, seqScanN(1),
      progressive = false)
    assert(JpegCodec.decode(good).isDefined)
    // truncations anywhere must quarantine or decode-with-zero-feed,
    // never throw out of decode()
    for (cut <- Seq(2, 10, 30, good.length / 2, good.length - 3))
      JpegCodec.decode(good.take(cut)) // must not throw
    // bad DAC values
    def findMarker(bs: Array[Byte], m: Int): Int =
      (0 until bs.length - 1).find(i =>
        (bs(i) & 0xff) == 0xff && (bs(i + 1) & 0xff) == m).get
    val dacAt = findMarker(good, 0xcc)
    val badKx = good.clone(); badKx(dacAt + 7) = 0.toByte
    assert(JpegCodec.decode(badKx).isEmpty)
    val badLu = good.clone(); badLu(dacAt + 5) = 0x0f.toByte // L=15 > U=1
    assert(JpegCodec.decode(badLu).isEmpty)
    // arithmetic lossless (SOF11) remains out of scope
    val sofAt = findMarker(good, 0xc9)
    val sof11 = good.clone(); sof11(sofAt + 1) = 0xcb.toByte
    assert(JpegCodec.decode(sof11).isEmpty)
  }
}
