package graft

import graft.operators.{JpegArith, JpegCodec}
import org.scalatest.funsuite.AnyFunSuite

/** Arithmetic-coded LOSSLESS JPEG (SOF11) validated the established way:
  * a test-only ENCODER — the H.2 difference model (two-dimensionally
  * conditioned on the left/above diff categories) over the shared QM
  * coder dual — plus an exact independent reconstruction of the expected
  * RGB24. The bin layout inside the 158-bin statistics area is the
  * engine's documented one (decoder scaladoc); this encoder restates it
  * independently, so any drift between the two is a red test.
  */
class JpegArithLosslessSpec extends AnyFunSuite {

  private def seg(out: scala.collection.mutable.ArrayBuffer[Byte],
                  marker: Int, payload: Array[Int]): Unit = {
    out += 0xff.toByte; out += marker.toByte
    val len = payload.length + 2
    out += (len >> 8).toByte; out += (len & 0xff).toByte
    payload.foreach(p => out += p.toByte)
  }

  /** Assemble an SOF11 stream from P−Pt-bit sample planes on the padded
    * lossless MCU grid. `cond` is the DAC (L, U) pair (None = spec
    * default 0/1, no DAC segment).
    */
  private def encodeArithLossless(w: Int, h: Int, samp: Seq[(Int, Int)],
                                  precision: Int, planes: Seq[Array[Int]],
                                  psel: Int, pt: Int, restart: Int = 0,
                                  interleaved: Boolean = true,
                                  cond: Option[(Int, Int)] = None): Array[Byte] = {
    val nc = samp.length
    val (condL, condU) = cond.getOrElse((0, 1))
    val hMax = samp.map(_._1).max; val vMax = samp.map(_._2).max
    val mcuX = (w + hMax - 1) / hMax; val mcuY = (h + vMax - 1) / vMax
    val planeWs = samp.map { case (sh, _) => mcuX * sh }
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    out += 0xff.toByte; out += 0xd8.toByte // SOI
    cond.foreach { case (l, u) => seg(out, 0xcc, Array(0x00, (u << 4) | l)) }
    if (restart > 0) seg(out, 0xdd, Array(restart >> 8, restart & 0xff))
    seg(out, 0xcb, Array(precision, h >> 8, h & 0xff, w >> 8, w & 0xff, nc) ++
      samp.zipWithIndex.flatMap { case ((sh, sv), i) => Seq(i + 1, (sh << 4) | sv, 0) })

    def emitScan(scanComps: Seq[Int]): Unit = {
      seg(out, 0xda, Array(scanComps.length) ++
        scanComps.flatMap(c => Seq(c + 1, 0x00)) ++ Seq(psel, 0, pt))
      val enc = new QmEncoder
      var stats = JpegArith.stats(158)
      val catRow = samp.indices.map(i => new Array[Int](planeWs(i).max(1))).toArray
      val catLeft = samp.indices.map(i => new Array[Int](samp(i)._2)).toArray
      val fresh = Array.fill(nc)(true)
      val freshY = Array.fill(nc)(0)
      var rst = 0; var unit = 0

      def maybeRestart(): Unit =
        if (restart > 0 && unit > 0 && unit % restart == 0) {
          enc.flush(); enc.rawMarker(0xd0 + rst); rst = (rst + 1) & 7
          stats = JpegArith.stats(158)
          catRow.foreach(java.util.Arrays.fill(_, 0))
          catLeft.foreach(java.util.Arrays.fill(_, 0))
          java.util.Arrays.fill(fresh, true)
        }

      def emitSample(ci: Int, x: Int, y: Int): Unit = {
        val pw = planeWs(ci); val p = planes(ci)
        val (_, sv) = samp(ci)
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
        val d = if (d16 > 32768) d16 - 65536 else d16
        val ca = if (x == 0) 0 else catLeft(ci)(y % sv)
        val cb = catRow(ci)(x)
        val ctx = 4 * (5 * cb + ca)
        var cat = 0
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
          cat =
            if (m < ((1 << condL) >> 1)) 0
            else if (m > ((1 << condU) >> 1)) 3 + sign
            else 1 + sign
          sp += 14
          var bm = m >> 1
          while (bm != 0) {
            enc.encode(stats, sp, if ((e & bm) != 0) 1 else 0); bm >>= 1
          }
        }
        catLeft(ci)(y % sv) = cat
        catRow(ci)(x) = cat
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
      enc.flush()
      out ++= enc.out
    }

    if (interleaved) emitScan(samp.indices) else samp.indices.foreach(c => emitScan(Seq(c)))
    out += 0xff.toByte; out += 0xd9.toByte
    out.toArray
  }

  /** Expected RGB24: undo the point transform, take the top 8 bits; 3
    * components are direct RGB, 1 replicates to gray. (1,1) sampling
    * only — same restriction the SOF3 suite uses.
    */
  private def refLossless(w: Int, h: Int, nc: Int, precision: Int,
                          planes: Seq[Array[Int]], pt: Int): Array[Byte] = {
    val p8 = planes.map(_.map { v =>
      val full = (v << pt) & 0xffff
      val v8 = if (precision >= 8) full >> (precision - 8) else full << (8 - precision)
      math.min(v8, 255)
    })
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    var px = 0
    while (px < w * h) {
      if (nc == 3) {
        rgb(i) = p8(0)(px).toByte; rgb(i + 1) = p8(1)(px).toByte
        rgb(i + 2) = p8(2)(px).toByte
      } else {
        val v = p8(0)(px).toByte
        rgb(i) = v; rgb(i + 1) = v; rgb(i + 2) = v
      }
      i += 3; px += 1
    }
    rgb
  }

  private def planesOf(rnd: scala.util.Random, w: Int, h: Int, nc: Int,
                       codedBits: Int, smooth: Boolean = false): Seq[Array[Int]] =
    (0 until nc).map { _ =>
      if (!smooth) Array.fill(w * h)(rnd.nextInt(1 << codedBits))
      else {
        // small-step random walk: exercises the zero/small categories
        var v = 1 << (codedBits - 1)
        Array.fill(w * h) { v = (v + rnd.nextInt(5) - 2).max(0).min((1 << codedBits) - 1); v }
      }
    }

  private def check(w: Int, h: Int, nc: Int, precision: Int,
                    planes: Seq[Array[Int]], psel: Int, pt: Int,
                    restart: Int = 0, interleaved: Boolean = true,
                    cond: Option[(Int, Int)] = None): Unit = {
    val samp = Seq.fill(nc)((1, 1))
    val jpeg = encodeArithLossless(w, h, samp, precision, planes, psel, pt,
      restart, interleaved, cond)
    val got = JpegCodec.decodeOrThrow(jpeg).getOrElse(
      fail(s"SOF11 decode returned None (psel=$psel pt=$pt P=$precision)"))
    assert(got.w == w && got.h == h)
    val want = refLossless(w, h, nc, precision, planes, pt)
    val bad = got.rgb.zip(want).zipWithIndex.filter { case ((a, b), _) => a != b }
    assert(bad.isEmpty,
      s"psel=$psel pt=$pt P=$precision: ${bad.length} mismatches, first at ${bad.headOption.map(_._2)}")
  }

  test("SOF11 predictors 1-7 reproduce random planes exactly at 8/12/16-bit") {
    val rnd = new scala.util.Random(401)
    for (precision <- Seq(8, 12, 16); psel <- 1 to 7) {
      val (w, h) = (1 + rnd.nextInt(24), 1 + rnd.nextInt(24))
      check(w, h, 1, precision, planesOf(rnd, w, h, 1, precision), psel, pt = 0)
    }
  }

  test("SOF11 conditioning adapts: smooth planes hit zero/small, random hit large") {
    val rnd = new scala.util.Random(409)
    val (w, h) = (48, 32)
    val smooth = planesOf(rnd, w, h, 1, 8, smooth = true)
    val noisy = planesOf(rnd, w, h, 1, 8)
    check(w, h, 1, 8, smooth, psel = 4, pt = 0)
    check(w, h, 1, 8, noisy, psel = 4, pt = 0)
    // adaptivity is real: the smooth stream must code smaller than noise
    val sSmooth = encodeArithLossless(w, h, Seq((1, 1)), 8, smooth, 4, 0).length
    val sNoisy = encodeArithLossless(w, h, Seq((1, 1)), 8, noisy, 4, 0).length
    assert(sSmooth < sNoisy / 2, s"smooth $sSmooth vs noisy $sNoisy")
  }

  test("SOF11 RGB: interleaved and per-component scans") {
    val rnd = new scala.util.Random(419)
    val (w, h) = (19, 11)
    val planes = planesOf(rnd, w, h, 3, 8)
    check(w, h, 3, 8, planes, psel = 4, pt = 0, interleaved = true)
    check(w, h, 3, 8, planes, psel = 7, pt = 0, interleaved = false)
  }

  test("SOF11 point transform and custom DAC conditioning bounds") {
    val rnd = new scala.util.Random(421)
    check(13, 9, 1, 12, planesOf(rnd, 13, 9, 1, 10), psel = 5, pt = 2)
    check(17, 8, 1, 8, planesOf(rnd, 17, 8, 1, 8), psel = 4, pt = 0,
      cond = Some((2, 4)))
  }

  test("SOF11 restart markers reset statistics, conditioning and prediction") {
    val rnd = new scala.util.Random(431)
    check(21, 7, 1, 8, planesOf(rnd, 21, 7, 1, 8), psel = 6, pt = 0, restart = 17)
  }
}
