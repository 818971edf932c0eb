package graft.operators

/** Pure-JVM JPEG decoder (ITU-T T.81) — the r7 multimodal capability
  * boundary erased in r8: the pixel tier now covers GIF (LZW), PNG
  * (DEFLATE), raw RGB, WAV (PCM16) **and** JPEG, without a codec
  * dependency. The reference engine treats media as opaque bytes; this
  * decoder exists for the beyond-parity multimodal lane
  * (`Multimodal.PixelResizeKernel`), so a training-data pipeline can
  * decode/resize real images inside the engine.
  *
  * Scope:
  *   - **baseline/extended sequential** (SOF0/SOF1): 8- and 12-bit
  *     (r13), 1-4 components, sampling factors 1-4 each (4:4:4, 4:2:2,
  *     4:2:0, ... all fall out of the generic MCU walk), single
  *     interleaved scan, 8- and 16-bit quantization tables;
  *   - **progressive** (SOF2, r8): the full successive-approximation
  *     protocol — interleaved or per-component DC first/refine scans
  *     (point transform Al, `|= bit<<Al` refinement), per-component AC
  *     scans with spectral selection bands, EOB-run coding (EOBn), ZRL
  *     in refinement, correction-bit decoding per T.81 G.1.2.3 (the
  *     public libjpeg algorithm), coefficients accumulated across scans
  *     and IDCT'd once at EOI;
  *   - **lossless** (SOF3, r13): predictive Annex H — sample-unit MCUs,
  *     predictors 1-7, point transform, modulo-2^16 reconstruction,
  *     precisions 2-16, gray or direct-RGB output;
  *   - **arithmetic-coded** (SOF9/SOF10, r13): the QM coder of Annex D
  *     ([[JpegArith]]) under the standard DC/AC context models with DAC
  *     conditioning, sequential and full progressive;
  *   - **arithmetic lossless** (SOF11, late r13): the H.2 difference
  *     model — the DC model's 5-way classification applied to BOTH
  *     neighbor diffs (25 contexts, two magnitude-chain sets, 158 bins);
  *   - **hierarchical** (Annex J, late r13): DHP/EXP markers, the
  *     (a+b+1)>>1 ×2 reference upsampling filter, and every differential
  *     process — SOF5/6/7 Huffman and SOF13/14/15 arithmetic — with
  *     zero-prediction DC, no level shift on differential IDCT output,
  *     clamped DCT folds and modulo-2^16 lossless folds;
  *   - multiple DQT/DHT segments, table redefinition between scans,
  *     APPn/COM skipped by length, restart markers (DRI/RSTn with
  *     predictor/statistics reset and realignment), 0xFF00 unstuffing.
  * With these the T.81 coding-process matrix is COMPLETE — every SOF
  * marker the standard defines decodes to pixels.
  *
  * Decode math: coefficients dequantize to Int, the IDCT is the exact
  * separable double-precision definition from T.81 A.3.3 (no fast
  * integer approximation — per-block cost is a constant 1024 FMAs, and
  * exactness is what lets flat DC-only blocks reproduce bit-identically
  * for the oracle), samples round half-up and clamp to [0,255]. Chroma
  * upsampling is nearest-neighbor (sample (x·hᵢ/Hmax, y·vᵢ/Vmax)), and
  * YCbCr→RGB is the JFIF matrix (R = Y + 1.402·(Cr−128), ...) rounded
  * half-up — both documented contracts the unit fuzz test recomputes
  * independently.
  *
  * Quarantine contract (same as every decoder here): any malformed,
  * truncated, oversized, or unsupported payload returns None — garbage
  * never kills a batch.
  */
object JpegCodec {

  /** Hard cap on decoded pixel volume (w·h). A hostile header claiming
    * 65535×65535 would otherwise allocate ~12 GiB of planes before the
    * entropy decode has proven a single bit; beyond the cap the payload
    * quarantines. 2^24 px = 48 MiB RGB, ample for a resize pipeline's
    * per-row bound.
    */
  private val MaxPixels = 1 << 24

  private final class Reader(b: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = ((b(pos) & 0xff) << 8) | (b(pos + 1) & 0xff); pos += 2; v }
    def skip(n: Int): Unit = { require(n >= 0 && pos + n <= b.length); pos += n }
    def remaining: Int = b.length - pos
  }

  /** Canonical Huffman table (T.81 C.2): decode via the standard
    * mincode/maxcode/valptr walk — one compare per code length, no
    * lookup-table memory per task.
    */
  private final class Huff(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = if (bits(l - 1) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len))
  }

  /** Entropy-segment bit reader: 0xFF00 unstuffs to 0xFF; any other
    * 0xFF-marker ends the segment (the MCU/restart loop decides whether
    * that marker was expected).
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0

    def bit(): Int = {
      if (nbits == 0) {
        require(pos < b.length, "entropy data exhausted")
        val v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          require(pos < b.length, "truncated stuffing")
          val m = b(pos) & 0xff
          require(m == 0x00, f"marker 0xFF$m%02X inside entropy data")
          pos += 1
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }

    def bits(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | bit(); i += 1 }; v }

    def decode(h: Huff): Int = {
      var code = bit(); var l = 1
      while (!(code <= h.maxCode(l))) {
        require(l < 16, "invalid Huffman code")
        code = (code << 1) | bit(); l += 1
      }
      h.value(l, code)
    }

    /** Byte-align and consume an expected RSTn marker. */
    def restart(expected: Int): Unit = {
      nbits = 0
      require(pos + 1 < b.length && (b(pos) & 0xff) == 0xff &&
        (b(pos + 1) & 0xff) == (0xd0 + expected), "missing restart marker")
      pos += 2
    }
  }

  /** T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private val zigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // cos((2x+1)·u·π/16) · C(u), the exact T.81 A.3.3 basis, precomputed
  private val basis: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        t(x * 8 + u) = c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        u += 1
      }
      x += 1
    }
    t
  }

  /** Exact separable 2-D IDCT of one dequantized block; output is the
    * UNSHIFTED spatial sample (level shift +128 happens at plane write).
    */
  private def idct(coef: Array[Int], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) { // rows: tmp(y,x) = Σu C(u)·F(y·8+u)·cos(...)
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += basis(x * 8 + u) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) { // columns
      var yy = 0
      while (yy < 8) {
        var s = 0.0; var v = 0
        while (v < 8) { s += basis(yy * 8 + v) * tmp(v * 8 + x); v += 1 }
        out(yy * 8 + x) = s / 4.0
        yy += 1
      }
      x += 1
    }
  }

  private case class Comp(id: Int, h: Int, v: Int, tq: Int,
                          var td: Int = 0, var ta: Int = 0)

  /** Decode a sequential (8/12-bit), progressive, lossless or
    * arithmetic-coded JPEG to one RGB24 frame; None on anything
    * malformed or out of scope (hierarchical, arithmetic lossless).
    * The quarantine catch is PARSE-SHAPED only (the GIF/PNG sibling
    * discipline): a fatal VM error (OOM mid-IDCT, stack overflow) or a
    * task-kill interrupt must fail the task so Spark retries/surfaces
    * it — swallowing those as "malformed payload" would silently drop
    * valid rows from the pixel tier.
    */
  def decode(b: Array[Byte]): Option[GifCodec.Frame] =
    try decodeOrThrow(b) catch {
      case _: IndexOutOfBoundsException | _: IllegalArgumentException |
           _: NegativeArraySizeException | _: ArithmeticException |
           _: NumberFormatException | _: UnsupportedOperationException |
           _: NoSuchElementException => None
    }

  /** The throwing body behind [[decode]] — test-visible so a spec
    * failure names the actual parse error instead of a bare None.
    */
  private[graft] def decodeOrThrow(b: Array[Byte]): Option[GifCodec.Frame] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    val r = new Reader(b); r.skip(2)
    val qtab = new Array[Array[Int]](4)
    val dcTab = new Array[Huff](4)
    val acTab = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0; var h = 0
    var restartInterval = 0
    var progressive = false
    var lossless = false
    var arithmetic = false
    var precision = 8 // sample precision P from SOF (8/12 DCT, 2-16 lossless)
    // hierarchical mode (T.81 Annex J): DHP seen; per-frame `differential`
    // (SOF5-7/13-15: zero DC prediction, no level shift, output ADDS to
    // the reference); refPlanes accumulate full-precision samples per
    // component at the CURRENT level's unpadded dims; EXP (0xDF) queues a
    // ×2 upsample applied when the next frame's dims are known
    var hier = false
    var differential = false
    var refPlanes: Array[Array[Int]] = null
    var refW: Array[Int] = null; var refH: Array[Int] = null
    var pendingExpH = false; var pendingExpV = false
    var framesDone = 0
    var lastLossless = false
    // arithmetic conditioning (DAC, T.81 B.2.4.3); spec defaults
    val dcCond = Array.fill(4)((0, 1)) // (L, U) thresholds per table
    val acCond = Array.fill(4)(5)      // Kx per table
    // frame geometry, set at SOF
    var hMax = 0; var vMax = 0; var mcusX = 0; var mcusY = 0
    var blocksW: Array[Int] = null; var blocksH: Array[Int] = null
    // progressive: per-comp coefficient grids (flat, blocksW·blocksH·64,
    // natural order within each block), accumulated across scans
    var grids: Array[Array[Int]] = null
    var progScans = 0
    // lossless: per-comp sample planes at the padded MCU grid (values are
    // the RECONSTRUCTED P−Pt bit samples; << Pt and 8-bit scaling happen
    // at assembly), plus that grid's geometry (1 sample per data unit,
    // not 8x8 blocks — T.81 H.1)
    var lossPlanes: Array[Array[Int]] = null
    var lossW: Array[Int] = null; var lossH: Array[Int] = null
    var lossMcuX = 0; var lossMcuY = 0
    var lossPt = 0
    var lossScans = 0

    def parseSof(prog: Boolean, loss: Boolean): Unit = {
      val len = r.u16()
      precision = r.u8()
      if (loss) require(precision >= 2 && precision <= 16,
        "lossless precision 2-16")
      else require(precision == 8 || precision == 12,
        "DCT precision must be 8 or 12")
      h = r.u16(); w = r.u16()
      val nc = r.u8()
      require(len == 8 + 3 * nc, "SOF length mismatch")
      require(nc >= 1 && nc <= 4, "1-4 components")
      require(w > 0 && h > 0 && w.toLong * h <= MaxPixels, "dims out of range")
      comps = Array.fill(nc) {
        val id = r.u8(); val hv = r.u8(); val tq = r.u8()
        val ch = hv >> 4; val cv = hv & 15
        require(ch >= 1 && ch <= 4 && cv >= 1 && cv <= 4, "sampling out of range")
        Comp(id, ch, cv, tq)
      }
      // a single-component frame is coded non-interleaved (T.81 A.2.2):
      // the component covers the full frame in plain 8x8 blocks, so its
      // declared sampling factors are irrelevant — normalize them
      if (nc == 1) comps = Array(comps(0).copy(h = 1, v = 1))
      progressive = prog
      lossless = loss
      hMax = comps.map(_.h).max; vMax = comps.map(_.v).max
      if (lossless) {
        // lossless data units are SAMPLES, not 8x8 blocks (T.81 H.1):
        // the MCU grid is ceil(dim / sampling-max), planes padded to it
        lossMcuX = (w + hMax - 1) / hMax
        lossMcuY = (h + vMax - 1) / vMax
        lossW = comps.map(c => lossMcuX * c.h)
        lossH = comps.map(c => lossMcuY * c.v)
        lossPlanes = comps.indices.toArray.map(i => new Array[Int](lossW(i) * lossH(i)))
      } else {
        mcusX = (w + 8 * hMax - 1) / (8 * hMax)
        mcusY = (h + 8 * vMax - 1) / (8 * vMax)
        blocksW = comps.map(c => mcusX * c.h)
        blocksH = comps.map(c => mcusY * c.v)
      }
    }

    /** Effective (unpadded) sample dims of component ci in the CURRENT
      * frame — ceil(dim · samp / sampMax), the A.1.1 formula at sample
      * granularity for both DCT and lossless processes.
      */
    def compDims(ci: Int): (Int, Int) = (
      ((w.toLong * comps(ci).h + hMax - 1) / hMax).toInt.max(1),
      ((h.toLong * comps(ci).v + vMax - 1) / vMax).toInt.max(1))

    /** ×2 upsample of one reference plane per T.81 J.1.1.2 — x2i = Ri,
      * x2i+1 = (Ri + Ri+1 + 1) >> 1 with the last value replicated —
      * horizontal then vertical, cropped to (tw, th).
      */
    def expandPlane(src: Array[Int], sw: Int, sh: Int,
                    eh: Boolean, ev: Boolean, tw: Int, th: Int): Array[Int] = {
      val w1 = if (eh) sw * 2 else sw
      val a = new Array[Int](w1 * sh)
      var y = 0
      while (y < sh) {
        var x = 0
        while (x < sw) {
          val v = src(y * sw + x)
          if (eh) {
            val nxt = src(y * sw + math.min(x + 1, sw - 1))
            a(y * w1 + 2 * x) = v
            a(y * w1 + 2 * x + 1) = (v + nxt + 1) >> 1
          } else a(y * w1 + x) = v
          x += 1
        }
        y += 1
      }
      val h1 = if (ev) sh * 2 else sh
      val bArr = if (!ev) a else {
        val o = new Array[Int](w1 * h1)
        var yy = 0
        while (yy < sh) {
          var x = 0
          while (x < w1) {
            val v = a(yy * w1 + x)
            val nxt = a(math.min(yy + 1, sh - 1) * w1 + x)
            o(2 * yy * w1 + x) = v
            o((2 * yy + 1) * w1 + x) = (v + nxt + 1) >> 1
            x += 1
          }
          yy += 1
        }
        o
      }
      require(tw <= w1 && th <= h1,
        s"EXP target ${tw}x$th exceeds expanded ${w1}x$h1")
      val out = new Array[Int](tw * th)
      var yy = 0
      while (yy < th) {
        System.arraycopy(bArr, yy * w1, out, yy * tw, tw)
        yy += 1
      }
      out
    }

    /** Fold the in-flight hierarchical frame into the reference planes:
      * full-precision samples (clamped [0, 2^P−1]) for non-differential
      * frames; ref + diff (clamped for DCT, modulo 2^16 for lossless)
      * for differential ones (T.81 J.1.1.4/J.1.1.5).
      */
    def finalizeFrame(): Unit = {
      require(comps != null, "hierarchical frame with no SOF")
      require((if (lossless) lossScans else progScans) > 0, "frame with no scans")
      val sMax = (1 << precision) - 1
      val vals = comps.indices.toArray.map { ci =>
        val (cw, ch) = compDims(ci)
        val out = new Array[Int](cw * ch)
        if (lossless) {
          val src = lossPlanes(ci); val stride = lossW(ci)
          var y = 0
          while (y < ch) {
            var x = 0
            while (x < cw) {
              out(y * cw + x) = (src(y * stride + x) << lossPt) & 0xffff
              x += 1
            }
            y += 1
          }
        } else {
          val q = qtab(comps(ci).tq); require(q != null, "missing qtable")
          val g = grids(ci)
          val cf = new Array[Int](64)
          val sp = new Array[Double](64)
          val shift = if (differential) 0 else 1 << (precision - 1)
          var blk = 0
          val nBlk = blocksW(ci) * blocksH(ci)
          while (blk < nBlk) {
            var i = 0
            while (i < 64) { cf(i) = g(blk * 64 + i) * q(i); i += 1 }
            idct(cf, sp)
            val px = (blk % blocksW(ci)) * 8; val py = (blk / blocksW(ci)) * 8
            var yy = 0
            while (yy < 8) {
              val oy = py + yy
              if (oy < ch) {
                var xx = 0
                while (xx < 8) {
                  val ox = px + xx
                  if (ox < cw) {
                    val v = math.round(sp(yy * 8 + xx)).toInt + shift
                    out(oy * cw + ox) =
                      if (differential) v // signed diff, clamp at fold
                      else math.max(0, math.min(sMax, v))
                  }
                  xx += 1
                }
              }
              yy += 1
            }
            blk += 1
          }
        }
        out
      }
      if (!differential) {
        refPlanes = vals
        refW = comps.indices.toArray.map(ci => compDims(ci)._1)
        refH = comps.indices.toArray.map(ci => compDims(ci)._2)
      } else {
        require(refPlanes != null, "differential frame before any reference")
        comps.indices.foreach { ci =>
          val (cw, ch) = compDims(ci)
          require(cw == refW(ci) && ch == refH(ci),
            s"differential frame dims ${cw}x$ch vs reference ${refW(ci)}x${refH(ci)}")
          val ref = refPlanes(ci); val d = vals(ci)
          var i = 0
          while (i < ref.length) {
            ref(i) =
              if (lossless) (ref(i) + d(i)) & 0xffff
              else math.max(0, math.min(sMax, ref(i) + d(i)))
            i += 1
          }
        }
      }
      lastLossless = lossless
      framesDone += 1
    }

    /** Reset per-frame state for the next hierarchical frame (entropy
      * tables, DRI and DAC conditioning persist across frames, B.2/B.3).
      */
    def resetFrameState(): Unit = {
      grids = null; lossPlanes = null
      progScans = 0; lossScans = 0
      progressive = false; lossless = false
      arithmetic = false; differential = false
      lossPt = 0
    }

    /** At a new SOF in hierarchical mode: fold the in-flight frame into
      * the reference first. No-op outside hierarchical mode (a second
      * SOF there keeps the legacy overwrite behavior).
      */
    def startFrame(): Unit =
      if (hier && comps != null && (progScans > 0 || lossScans > 0)) {
        finalizeFrame(); resetFrameState()
      }

    def startDiffFrame(): Unit = {
      require(hier, "differential frame outside hierarchical mode")
      startFrame()
      require(framesDone > 0, "differential frame before any reference")
      differential = true
    }

    /** EXP may only precede a differential frame (J.1.1.3). */
    def noExp(): Unit =
      require(!pendingExpH && !pendingExpV, "EXP before a non-differential frame")

    def applyPendingExp(): Unit =
      if (pendingExpH || pendingExpV) {
        comps.indices.foreach { ci =>
          val (cw, ch) = compDims(ci)
          refPlanes(ci) = expandPlane(refPlanes(ci), refW(ci), refH(ci),
            pendingExpH, pendingExpV, cw, ch)
          refW(ci) = cw; refH(ci) = ch
        }
        pendingExpH = false; pendingExpV = false
      }

    /** One progressive scan (T.81 G.2): decode entropy data starting at
      * r.pos into the coefficient grids, return the position after it.
      */
    def progScan(scanIdx: Array[Int], ss: Int, se: Int, ah: Int, al: Int): Int = {
      val br = new BitReader(b, r.pos)
      val pred = new Array[Int](comps.length)
      var eobrun = 0
      var rstIdx = 0
      var unit = 0 // MCU counter (interleaved) or block counter (single-comp)

      def maybeRestart(): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          br.restart(rstIdx); rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(pred, 0); eobrun = 0
        }

      // refinement correction bits for nonzero-history coefficients in
      // band positions [from..se] of one block (T.81 G.1.2.3 / the
      // public libjpeg decode_mcu_AC_refine tail)
      def refineTail(g: Array[Int], off: Int, from: Int, p1: Int, m1: Int): Unit = {
        var k = from
        while (k <= se) {
          val z = off + zigzag(k)
          if (g(z) != 0 && br.bit() == 1 && (g(z) & p1) == 0)
            g(z) += (if (g(z) >= 0) p1 else m1)
          k += 1
        }
      }

      def decodeBlock(ci: Int, off: Int): Unit = {
        val c = comps(ci)
        val g = grids(ci)
        if (ss == 0) { // DC scan (se == 0 enforced at SOS parse)
          if (ah == 0) {
            val dc = dcTab(c.td); require(dc != null, "missing DC table")
            val t = br.decode(dc); require(t <= (if (precision == 12) 15 else 11), "DC category out of range")
            // differential frames code DC with ZERO prediction (F.1.1.5.1)
            if (differential) pred(ci) = extend(br.bits(t), t)
            else pred(ci) += extend(br.bits(t), t)
            g(off) = pred(ci) << al
          } else if (br.bit() == 1) g(off) |= (1 << al)
        } else if (ah == 0) { // AC first scan for this band
          if (eobrun > 0) { eobrun -= 1; return }
          val ac = acTab(c.ta); require(ac != null, "missing AC table")
          var k = ss
          while (k <= se) {
            val rs = br.decode(ac); val run = rs >> 4; val s = rs & 15
            if (s == 0) {
              if (run < 15) { // EOBn: run extra bits give the run length
                eobrun = (1 << run) - 1 + (if (run > 0) br.bits(run) else 0)
                return
              }
              k += 16 // ZRL
            } else {
              k += run
              require(k <= se, "AC index out of band")
              g(off + zigzag(k)) = extend(br.bits(s), s) << al
              k += 1
            }
          }
        } else { // AC refinement scan
          val ac = acTab(c.ta); require(ac != null, "missing AC table")
          val p1 = 1 << al; val m1 = -1 << al
          var k = ss
          if (eobrun == 0) {
            var inBand = true
            while (inBand && k <= se) {
              val rs = br.decode(ac); var run = rs >> 4; val s = rs & 15
              var newval = 0
              if (s == 0) {
                if (run < 15) {
                  eobrun = (1 << run) - 1 + (if (run > 0) br.bits(run) else 0)
                  refineTail(g, off, k, p1, m1)
                  inBand = false
                }
                // run == 15: ZRL — pass 16 zero-history coefficients
              } else {
                require(s == 1, "refinement magnitude must be 1")
                newval = if (br.bit() == 1) p1 else m1
              }
              if (inBand) {
                // advance over `run` zero-history positions, correcting
                // every nonzero-history coefficient passed; place newval
                // at the terminating zero-history position
                var placed = false
                while (!placed && k <= se) {
                  val z = off + zigzag(k)
                  if (g(z) != 0) {
                    if (br.bit() == 1 && (g(z) & p1) == 0)
                      g(z) += (if (g(z) >= 0) p1 else m1)
                  } else if (run == 0) {
                    if (newval != 0) g(z) = newval
                    placed = true
                  } else run -= 1
                  k += 1
                }
              }
            }
          } else {
            refineTail(g, off, k, p1, m1)
            eobrun -= 1
          }
        }
      }

      if (scanIdx.length == 1) {
        // non-interleaved: blocks of this comp at its EFFECTIVE
        // resolution (ceil(w·h_i/Hmax) etc.), raster order
        val ci = scanIdx(0); val c = comps(ci)
        val nbx = ((w * c.h + 8 * hMax - 1) / (8 * hMax)).max(1)
        val nby = ((h * c.v + 8 * vMax - 1) / (8 * vMax)).max(1)
        val total = nbx * nby
        while (unit < total) {
          maybeRestart()
          decodeBlock(ci, ((unit / nbx) * blocksW(ci) + unit % nbx) * 64)
          unit += 1
        }
      } else {
        require(ss == 0, "interleaved progressive scans are DC-only")
        val total = mcusX * mcusY
        while (unit < total) {
          maybeRestart()
          val mx = unit % mcusX; val my = unit / mcusX
          var i = 0
          while (i < scanIdx.length) {
            val ci = scanIdx(i); val c = comps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                decodeBlock(ci,
                  ((my * c.v + by) * blocksW(ci) + mx * c.h + bx) * 64)
                bx += 1
              }
              by += 1
            }
            i += 1
          }
          unit += 1
        }
      }
      br.pos
    }

    /** One sequential Huffman scan decoded into the coefficient grids —
      * the HIERARCHICAL path for SOF0/1/5 frames (a multi-frame stream
      * can't use the single-frame baseline fast path, which streams to
      * pixels after the marker loop). Stores UNQUANTIZED coefficients
      * like progScan; dequantize + IDCT happen at frame finalize.
      * Differential frames decode DC with zero prediction.
      */
    def seqHuffScan(scanIdx: Array[Int]): Int = {
      val br = new BitReader(b, r.pos)
      val pred = new Array[Int](comps.length)
      var rstIdx = 0
      var unit = 0

      def maybeRestart(): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          br.restart(rstIdx); rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(pred, 0)
        }

      def decodeBlock(ci: Int, off: Int): Unit = {
        val c = comps(ci)
        val g = grids(ci)
        val dc = dcTab(c.td); val ac = acTab(c.ta)
        require(dc != null && ac != null, "missing Huffman table")
        val t = br.decode(dc)
        require(t <= (if (precision == 12) 15 else 11), "DC category out of range")
        if (differential) pred(ci) = extend(br.bits(t), t)
        else pred(ci) += extend(br.bits(t), t)
        g(off) = pred(ci)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = br.decode(ac)
          val run = rs >> 4; val size = rs & 15
          if (size == 0) {
            if (run == 15) k += 16 // ZRL
            else eob = true
          } else {
            k += run
            require(k < 64, "AC index overflow")
            g(off + zigzag(k)) = extend(br.bits(size), size)
            k += 1
          }
        }
      }

      if (scanIdx.length == 1) {
        val ci = scanIdx(0); val c = comps(ci)
        val nbx = ((w * c.h + 8 * hMax - 1) / (8 * hMax)).max(1)
        val nby = ((h * c.v + 8 * vMax - 1) / (8 * vMax)).max(1)
        val total = nbx * nby
        while (unit < total) {
          maybeRestart()
          decodeBlock(ci, ((unit / nbx) * blocksW(ci) + unit % nbx) * 64)
          unit += 1
        }
      } else {
        val total = mcusX * mcusY
        while (unit < total) {
          maybeRestart()
          val mx = unit % mcusX; val my = unit / mcusX
          var i = 0
          while (i < scanIdx.length) {
            val ci = scanIdx(i); val c = comps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                decodeBlock(ci,
                  ((my * c.v + by) * blocksW(ci) + mx * c.h + bx) * 64)
                bx += 1
              }
              by += 1
            }
            i += 1
          }
          unit += 1
        }
      }
      br.pos
    }

    /** One lossless scan (T.81 H.2): predictor `psel` (1-7), point
      * transform `pt`; data units are single samples. Reconstruction is
      * modulo 2^16 (H.1.2.2). Scan-start (and post-restart) prediction:
      * the first sample takes the default 2^(P−Pt−1); the rest of that
      * LINE predicts 1-D from Ra; later lines start from Rb then use the
      * selected predictor (H.1.1). Returns the position after the
      * entropy data.
      */
    def losslessScan(scanIdx: Array[Int], psel: Int, pt: Int): Int = {
      val br = new BitReader(b, r.pos)
      lossPt = pt
      val defaultPred = 1 << (precision - pt - 1)
      // per-comp prediction-reset state: fresh = next sample takes the
      // default; freshY = the row that then predicts 1-D (Ra)
      val fresh = Array.fill(comps.length)(true)
      val freshY = Array.fill(comps.length)(0)
      var rstIdx = 0
      var unit = 0

      def maybeRestart(): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          br.restart(rstIdx); rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(fresh, true)
        }

      def decodeSample(ci: Int, x: Int, y: Int): Unit = {
        val c = comps(ci)
        val dc = dcTab(c.td); require(dc != null, "missing lossless table")
        val t = br.decode(dc)
        require(t <= 16, "lossless category out of range")
        // category 16 codes diff = 32768 with NO magnitude bits (H.2.3)
        val diff = if (t == 16) 32768 else extend(br.bits(t), t)
        val plane = lossPlanes(ci); val pw = lossW(ci)
        val px = // differential frames code the difference itself (J.1.1.5)
          if (differential) 0
          else if (fresh(ci)) { fresh(ci) = false; freshY(ci) = y; defaultPred }
          else if (y == freshY(ci)) plane(y * pw + x - 1) // 1-D line: Ra
          else if (x == 0) plane((y - 1) * pw)            // line start: Rb
          else {
            val ra = plane(y * pw + x - 1)
            val rb = plane((y - 1) * pw + x)
            val rc = plane((y - 1) * pw + x - 1)
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
        plane(y * pw + x) = (px + diff) & 0xffff
      }

      if (scanIdx.length == 1) {
        // non-interleaved: exactly the component's ceil-scaled sample
        // grid, raster order, no padding (T.81 A.2.2 at sample units)
        val ci = scanIdx(0); val c = comps(ci)
        val cw = ((w.toLong * c.h + hMax - 1) / hMax).toInt.max(1)
        val chh = ((h.toLong * c.v + vMax - 1) / vMax).toInt.max(1)
        val total = cw * chh
        while (unit < total) {
          maybeRestart()
          decodeSample(ci, unit % cw, unit / cw)
          unit += 1
        }
      } else {
        val total = lossMcuX * lossMcuY
        while (unit < total) {
          maybeRestart()
          val mx = unit % lossMcuX; val my = unit / lossMcuX
          var i = 0
          while (i < scanIdx.length) {
            val ci = scanIdx(i); val c = comps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                decodeSample(ci, mx * c.h + bx, my * c.v + by)
                bx += 1
              }
              by += 1
            }
            i += 1
          }
          unit += 1
        }
      }
      br.pos
    }

    /** One arithmetic-coded LOSSLESS scan (T.81 H.2 over the Annex D QM
      * coder): prediction, traversal and restart semantics identical to
      * [[losslessScan]]; the entropy layer replaces Huffman categories
      * with the two-dimensionally conditioned difference model — the DC
      * model of F.2.2.1 with its 5-way diff classification applied to
      * BOTH neighbors (Da left, Db above), giving 25 four-decision
      * contexts plus two magnitude-chain bin sets (the second selected
      * when Db classifies large): 158 statistics bins per table, the
      * spec's stated lossless statistics-area size. Bin ORDER inside the
      * area is this engine's documented layout (zero/sign/±magnitude
      * start at 4·(5·cat(Db)+cat(Da)); chains at 100/129; per-chain
      * low-bit bins at +14 — the DC layout shifted to the 2-D grid); the
      * encoder dual in JpegArithLosslessSpec mirrors it bit-exactly.
      */
    def arithLosslessScan(scanIdx: Array[Int], psel: Int, pt: Int): Int = {
      val dec = new JpegArith.Decoder(b, r.pos)
      lossPt = pt
      val defaultPred = 1 << (precision - pt - 1)
      val stats = Array.fill(4)(JpegArith.stats(158))
      // conditioning: the diff CATEGORY (0 zero, 1/2 small ±, 3/4 large ±)
      // decoded at each column of the previous row (Db) and at the left
      // neighbor (Da); zero at edges and after every reset
      val catRow = comps.indices.toArray.map(i => new Array[Int](lossW(i).max(1)))
      // Da per (component, row-within-MCU-row): the interleaved walk keeps
      // c.v rows in flight per component, each needing its own left-cat
      val catLeft = comps.indices.toArray.map(i => new Array[Int](comps(i).v))
      val fresh = Array.fill(comps.length)(true)
      val freshY = Array.fill(comps.length)(0)
      var rstIdx = 0
      var unit = 0

      def maybeRestart(): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          dec.restart(rstIdx); rstIdx = (rstIdx + 1) & 7
          stats.foreach(java.util.Arrays.fill(_, 0.toByte))
          catRow.foreach(java.util.Arrays.fill(_, 0))
          catLeft.foreach(java.util.Arrays.fill(_, 0))
          java.util.Arrays.fill(fresh, true)
        }

      def decodeSample(ci: Int, x: Int, y: Int): Unit = {
        val c = comps(ci)
        val st = stats(c.td)
        val (condL, condU) = dcCond(c.td)
        val ca = if (x == 0) 0 else catLeft(ci)(y % c.v)
        val cb = catRow(ci)(x)
        val ctx = 4 * (5 * cb + ca)
        var diff = 0
        var cat = 0
        if (dec.decode(st, ctx) != 0) {
          val sign = dec.decode(st, ctx + 1)
          var sp = ctx + 2 + sign
          var m = dec.decode(st, sp)
          if (m != 0) {
            sp = if (cb >= 3) 129 else 100
            while (dec.decode(st, sp) != 0) {
              m <<= 1; require(m != 0x8000, "lossless magnitude overflow"); sp += 1
            }
          }
          // classification for the NEXT samples' conditioning — the same
          // category-bound comparison the DC model uses (F.1.4.4.1.2)
          cat =
            if (m < ((1 << condL) >> 1)) 0
            else if (m > ((1 << condU) >> 1)) 3 + sign
            else 1 + sign
          var v = m
          sp += 14
          m >>= 1
          while (m != 0) { if (dec.decode(st, sp) != 0) v |= m; m >>= 1 }
          v += 1
          diff = if (sign == 1) -v else v
        }
        catLeft(ci)(y % c.v) = cat
        catRow(ci)(x) = cat
        val plane = lossPlanes(ci); val pw = lossW(ci)
        val px = // differential frames code the difference itself (J.1.1.5)
          if (differential) 0
          else if (fresh(ci)) { fresh(ci) = false; freshY(ci) = y; defaultPred }
          else if (y == freshY(ci)) plane(y * pw + x - 1)
          else if (x == 0) plane((y - 1) * pw)
          else {
            val ra = plane(y * pw + x - 1)
            val rb = plane((y - 1) * pw + x)
            val rc = plane((y - 1) * pw + x - 1)
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
        plane(y * pw + x) = (px + diff) & 0xffff
      }

      if (scanIdx.length == 1) {
        val ci = scanIdx(0); val c = comps(ci)
        val cw = ((w.toLong * c.h + hMax - 1) / hMax).toInt.max(1)
        val chh = ((h.toLong * c.v + vMax - 1) / vMax).toInt.max(1)
        val total = cw * chh
        while (unit < total) {
          maybeRestart()
          decodeSample(ci, unit % cw, unit / cw)
          unit += 1
        }
      } else {
        val total = lossMcuX * lossMcuY
        while (unit < total) {
          maybeRestart()
          val mx = unit % lossMcuX; val my = unit / lossMcuX
          var i = 0
          while (i < scanIdx.length) {
            val ci = scanIdx(i); val c = comps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                decodeSample(ci, mx * c.h + bx, my * c.v + by)
                bx += 1
              }
              by += 1
            }
            i += 1
          }
          unit += 1
        }
      }
      dec.end()
    }

    /** One arithmetic-coded scan (T.81 F.2.2 sequential, G.2
      * progressive) into the coefficient grids. Context models are the
      * standard's exactly (the public libjpeg jdarith rendering of
      * Figures F.19-F.24 / G.5-G.7): per-component DC conditioning
      * categories from the previous diff classified against the DAC
      * L/U thresholds, per-position AC bins in triplets (EOB, zero,
      * magnitude) with the Kx split for the high-frequency magnitude
      * chains, AC signs and DC refinement bits on the fixed ~0.5 state.
      * Statistics, DC predictions and conditioning reset at scan start
      * and at every restart marker. Returns the position after the
      * entropy data (the terminating marker's 0xFF).
      */
    def arithScan(scanIdx: Array[Int], ss: Int, se: Int, ah: Int, al: Int): Int = {
      val dec = new JpegArith.Decoder(b, r.pos)
      val dcStats = Array.fill(4)(JpegArith.stats(64))
      val acStats = Array.fill(4)(JpegArith.stats(256))
      val fixed = JpegArith.fixedBin
      val pred = new Array[Int](comps.length)
      val dcCtx = new Array[Int](comps.length)
      var rstIdx = 0
      var unit = 0

      def maybeRestart(): Unit =
        if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
          dec.restart(rstIdx); rstIdx = (rstIdx + 1) & 7
          dcStats.foreach(java.util.Arrays.fill(_, 0.toByte))
          acStats.foreach(java.util.Arrays.fill(_, 0.toByte))
          java.util.Arrays.fill(pred, 0)
          java.util.Arrays.fill(dcCtx, 0)
        }

      /** DC diff decode (F.2.2.1): updates pred(ci), returns it. */
      def decodeDc(ci: Int): Int = {
        val c = comps(ci)
        val st = dcStats(c.td)
        val (condL, condU) = dcCond(c.td)
        val ctx = dcCtx(ci)
        if (dec.decode(st, ctx) == 0) {
          dcCtx(ci) = 0
          if (differential) pred(ci) = 0 // zero prediction: this block's DC is 0
        } else {
          val sign = dec.decode(st, ctx + 1)
          var sp = ctx + 2 + sign
          var m = dec.decode(st, sp)
          if (m != 0) {
            sp = 20
            while (dec.decode(st, sp) != 0) {
              m <<= 1; require(m != 0x8000, "DC magnitude overflow"); sp += 1
            }
          }
          // conditioning category for the next block (F.1.4.4.1.2)
          dcCtx(ci) =
            if (m < ((1 << condL) >> 1)) 0
            else if (m > ((1 << condU) >> 1)) 12 + sign * 4
            else 4 + sign * 4
          var v = m
          sp += 14
          m >>= 1
          while (m != 0) { if (dec.decode(st, sp) != 0) v |= m; m >>= 1 }
          v += 1
          // differential frames: zero prediction per block (F.1.1.5.1) —
          // conditioning still follows the coded value
          if (differential) pred(ci) = (if (sign == 1) -v else v)
          else pred(ci) += (if (sign == 1) -v else v)
        }
        pred(ci)
      }

      /** AC band decode (F.2.2.2 / G.2's first pass), coefficients
        * shifted by `al2` into grid `g` at block offset `off`. */
      def decodeAcBand(ci: Int, g: Array[Int], off: Int,
                       lo: Int, hi: Int, al2: Int): Unit = {
        val c = comps(ci)
        val st = acStats(c.ta)
        val kx = acCond(c.ta)
        var k = lo
        var eob = false
        while (!eob && k <= hi) {
          if (dec.decode(st, 3 * (k - 1)) != 0) eob = true
          else {
            while (dec.decode(st, 3 * (k - 1) + 1) == 0) {
              k += 1; require(k <= hi, "AC index out of band")
            }
            val sign = dec.decode(fixed, 0)
            var sp = 3 * (k - 1) + 2
            var m = dec.decode(st, sp)
            if (m != 0 && dec.decode(st, sp) != 0) {
              m = 2
              sp = if (k <= kx) 189 else 217
              while (dec.decode(st, sp) != 0) {
                m <<= 1; require(m != 0x8000, "AC magnitude overflow"); sp += 1
              }
            }
            var v = m
            sp += 14
            m >>= 1
            while (m != 0) { if (dec.decode(st, sp) != 0) v |= m; m >>= 1 }
            v += 1
            g(off + zigzag(k)) = (if (sign == 1) -v else v) << al2
            k += 1
          }
        }
      }

      /** AC refinement (G.2, the jdarith decode_mcu_AC_refine model). */
      def decodeAcRefine(g: Array[Int], ci: Int, off: Int): Unit = {
        val c = comps(ci)
        val st = acStats(c.ta)
        val p1 = 1 << al; val m1 = -1 << al
        var kex = se
        while (kex > 0 && g(off + zigzag(kex)) == 0) kex -= 1
        var k = ss
        var eob = false
        while (!eob && k <= se) {
          if (k > kex && dec.decode(st, 3 * (k - 1)) != 0) eob = true
          else {
            var done = false
            while (!done) {
              val z = off + zigzag(k)
              if (g(z) != 0) {
                if (dec.decode(st, 3 * (k - 1) + 2) != 0)
                  g(z) += (if (g(z) < 0) m1 else p1)
                done = true
              } else if (dec.decode(st, 3 * (k - 1) + 1) != 0) {
                g(z) = if (dec.decode(fixed, 0) != 0) m1 else p1
                done = true
              } else {
                k += 1; require(k <= se, "refinement ran past the band")
              }
            }
            k += 1
          }
        }
      }

      def decodeBlock(ci: Int, off: Int): Unit = {
        val g = grids(ci)
        if (!progressive) { // sequential: DC + full AC band, one pass
          g(off) = decodeDc(ci)
          decodeAcBand(ci, g, off, 1, 63, 0)
        } else if (ss == 0) {
          if (ah == 0) g(off) = decodeDc(ci) << al
          else if (dec.decode(fixed, 0) != 0) g(off) |= (1 << al)
        } else if (ah == 0) decodeAcBand(ci, g, off, ss, se, al)
        else decodeAcRefine(g, ci, off)
      }

      if (scanIdx.length == 1) {
        val ci = scanIdx(0); val c = comps(ci)
        val nbx = ((w * c.h + 8 * hMax - 1) / (8 * hMax)).max(1)
        val nby = ((h * c.v + 8 * vMax - 1) / (8 * vMax)).max(1)
        val total = nbx * nby
        while (unit < total) {
          maybeRestart()
          decodeBlock(ci, ((unit / nbx) * blocksW(ci) + unit % nbx) * 64)
          unit += 1
        }
      } else {
        val total = mcusX * mcusY
        while (unit < total) {
          maybeRestart()
          val mx = unit % mcusX; val my = unit / mcusX
          var i = 0
          while (i < scanIdx.length) {
            val ci = scanIdx(i); val c = comps(ci)
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                decodeBlock(ci,
                  ((my * c.v + by) * blocksW(ci) + mx * c.h + bx) * 64)
                bx += 1
              }
              by += 1
            }
            i += 1
          }
          unit += 1
        }
      }
      dec.end()
    }

    var sosPos = -1 // baseline: entropy start; loop exits when set
    var scanComps: Array[Comp] = null
    var finished = false // progressive: EOI seen
    while (sosPos < 0 && !finished) {
      require(r.remaining >= 2, "truncated before SOS")
      require(r.u8() == 0xff, "marker desync")
      var m = r.u8()
      while (m == 0xff) m = r.u8() // fill bytes are legal
      m match {
        case 0xdb => // DQT: one or more tables, 8- or 16-bit entries
          // (Pq=1 is the norm for 12-bit frames, T.81 B.2.4.1)
          val dqtLen = r.u16(); val end = r.pos + dqtLen - 2
          while (r.pos < end) {
            val pq = r.u8(); val wide = pq >> 4
            require(wide <= 1, "bad qtable precision")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) {
              t(zigzag(i)) = if (wide == 1) r.u16() else r.u8(); i += 1
            }
            qtab(pq & 3) = t
          }
          require(r.pos == end, "DQT length mismatch")
        case 0xc4 => // DHT: one or more tables
          val dhtLen = r.u16(); val end = r.pos + dhtLen - 2
          while (r.pos < end) {
            val tc = r.u8()
            val bits = Array.fill(16)(r.u8())
            val n = bits.sum; require(n <= 256, "DHT overflow")
            val vals = Array.fill(n)(r.u8())
            val t = new Huff(bits, vals)
            if ((tc >> 4) == 0) dcTab(tc & 3) = t else acTab(tc & 3) = t
          }
          require(r.pos == end, "DHT length mismatch")
        case 0xc0 | 0xc1 => startFrame(); parseSof(prog = false, loss = false); noExp()
        case 0xc2 => startFrame(); parseSof(prog = true, loss = false); noExp()
        case 0xc3 =>
          startFrame()
          parseSof(prog = false, loss = true)
          require(comps.length == 1 || comps.length == 3,
            "lossless: 1 (gray) or 3 (RGB) components")
          noExp()
        case 0xc5 => // differential sequential (hierarchical only)
          startDiffFrame(); parseSof(prog = false, loss = false); applyPendingExp()
        case 0xc6 => // differential progressive
          startDiffFrame(); parseSof(prog = true, loss = false); applyPendingExp()
        case 0xc7 => // differential lossless
          startDiffFrame(); parseSof(prog = false, loss = true); applyPendingExp()
        case 0xc9 => startFrame(); arithmetic = true; parseSof(prog = false, loss = false); noExp()
        case 0xca => startFrame(); arithmetic = true; parseSof(prog = true, loss = false); noExp()
        case 0xcb =>
          startFrame()
          arithmetic = true
          parseSof(prog = false, loss = true)
          require(comps.length == 1 || comps.length == 3,
            "lossless: 1 (gray) or 3 (RGB) components")
          noExp()
        case 0xcd => // differential sequential, arithmetic
          startDiffFrame(); arithmetic = true
          parseSof(prog = false, loss = false); applyPendingExp()
        case 0xce => // differential progressive, arithmetic
          startDiffFrame(); arithmetic = true
          parseSof(prog = true, loss = false); applyPendingExp()
        case 0xcf => // differential lossless, arithmetic
          startDiffFrame(); arithmetic = true
          parseSof(prog = false, loss = true); applyPendingExp()
        case 0xde => // DHP: declares hierarchical mode (SOF syntax; the
          // per-level frame headers carry the authoritative dims)
          require(!hier, "duplicate DHP")
          require(comps == null, "DHP after a frame")
          hier = true
          r.skip(r.u16() - 2)
        case 0xdf => // EXP: ×2 reference upsample before the next
          // differential frame (applied once that frame's dims are known)
          require(hier, "EXP outside hierarchical mode")
          require(r.u16() == 3, "bad EXP length")
          val e = r.u8()
          require((e >> 4) <= 1 && (e & 15) <= 1, "EXP values are 0/1")
          pendingExpH = (e >> 4) == 1; pendingExpV = (e & 15) == 1
        case 0xcc => // DAC: arithmetic conditioning (T.81 B.2.4.3)
          val dacLen = r.u16(); val end = r.pos + dacLen - 2
          while (r.pos < end) {
            val tc = r.u8(); val v = r.u8()
            require((tc >> 4) <= 1, "DAC class must be DC (0) or AC (1)")
            if ((tc >> 4) == 0) {
              val lo = v & 15; val hi = v >> 4
              require(lo <= hi, "bad DC conditioning bounds")
              dcCond(tc & 3) = (lo, hi)
            } else {
              require(v >= 1 && v <= 63, "bad AC conditioning Kx")
              acCond(tc & 3) = v
            }
          }
          require(r.pos == end, "DAC length mismatch")
        case 0xdd => require(r.u16() == 4); restartInterval = r.u16()
        case 0xda => // SOS
          require(comps != null, "SOS before SOF")
          r.u16()
          val ns = r.u8()
          val sc = Array.fill(ns) {
            val cs = r.u8()
            // IllegalArgumentException: the ONE parse error here must stay
            // inside decode()'s parse-shaped quarantine catch (a bare
            // sys.error RuntimeException would escape it and kill the task)
            val c = comps.find(_.id == cs).getOrElse(
              throw new IllegalArgumentException(s"unknown comp $cs"))
            val tt = r.u8(); c.td = tt >> 4; c.ta = tt & 15
            c
          }
          val ss = r.u8(); val se = r.u8()
          val aa = r.u8(); val ah = aa >> 4; val al = aa & 15
          if (lossless) {
            // lossless scan header (T.81 H.2.2): Ss = predictor, Al = Pt;
            // differential lossless codes raw differences — Ss must be 0
            if (differential) require(ss == 0, "differential lossless: Ss must be 0")
            else require(ss >= 1 && ss <= 7, "lossless predictor 1-7")
            require(se == 0 && ah == 0, "bad lossless scan header")
            require(al < precision, "point transform out of range")
            val idx = sc.map(c => comps.indexWhere(_.id == c.id))
            r.pos = if (arithmetic) arithLosslessScan(idx, ss, al)
                    else losslessScan(idx, ss, al)
            lossScans += 1
          } else if (!progressive && !arithmetic && hier) {
            // hierarchical sequential Huffman: must decode INLINE (the
            // single-frame baseline fast path streams to pixels after
            // the marker loop, which a multi-frame stream cannot use)
            require(ss == 0 && se == 63 && ah == 0 && al == 0,
              "sequential scans cover the full band")
            if (grids == null)
              grids = comps.indices.toArray.map(i =>
                new Array[Int](blocksW(i) * blocksH(i) * 64))
            r.pos = seqHuffScan(sc.map(c => comps.indexWhere(_.id == c.id)))
            progScans += 1
          } else if (arithmetic) {
            if (progressive) {
              require(ss <= se && se <= 63, "bad spectral band")
              require(if (ss == 0) se == 0 else ns == 1,
                "DC band is [0,0]; AC scans are single-component")
              require(ah == 0 || ah == al + 1, "successive approximation chain")
            } else require(ss == 0 && se == 63 && ah == 0 && al == 0,
              "sequential scans cover the full band")
            if (grids == null)
              grids = comps.indices.toArray.map(i =>
                new Array[Int](blocksW(i) * blocksH(i) * 64))
            r.pos = arithScan(sc.map(c => comps.indexWhere(_.id == c.id)), ss, se, ah, al)
            progScans += 1
          } else if (!progressive) {
            require(ns == comps.length, "baseline: one interleaved scan")
            require(ss == 0 && se == 63 && ah == 0 && al == 0,
              "baseline spectral selection only")
            scanComps = sc
            sosPos = r.pos
          } else {
            require(ss <= se && se <= 63, "bad spectral band")
            require(if (ss == 0) se == 0 else ns == 1,
              "DC band is [0,0]; AC scans are single-component")
            require(ah == 0 || ah == al + 1, "successive approximation chain")
            if (grids == null)
              grids = comps.indices.toArray.map(i =>
                new Array[Int](blocksW(i) * blocksH(i) * 64))
            r.pos = progScan(sc.map(c => comps.indexWhere(_.id == c.id)), ss, se, ah, al)
            progScans += 1
          }
        case 0xd9 => // EOI
          if (hier) {
            if (comps != null && (progScans > 0 || lossScans > 0)) {
              finalizeFrame(); resetFrameState()
            }
            if (framesDone > 0) finished = true else return None
          } else if (((progressive || arithmetic) && progScans > 0) ||
              (lossless && lossScans > 0))
            finished = true
          else return None
        case _ => r.skip(r.u16() - 2) // APPn, COM, DNL, anything skippable
      }
    }

    // per-component 8-bit plane at its own resolution (MCU-padded for
    // single-frame decodes; the unpadded reference dims for hierarchical);
    // 12-bit DCT and deep lossless samples land here already scaled to
    // 8 bits (the frame contract is RGB24 — documented top-bits scaling)
    val planeW = comps.indices.toArray.map(i =>
      if (hier) refW(i)
      else if (lossless) lossW(i) else mcusX * comps(i).h * 8)
    val planes = comps.indices.toArray.map(i =>
      new Array[Byte](planeW(i) *
        (if (hier) refH(i)
         else if (lossless) lossH(i) else mcusY * comps(i).v * 8)))
    val coef = new Array[Int](64)
    val spatial = new Array[Double](64)
    // DCT level shift / clamp / 8-bit scale, all from the SOF precision
    // (T.81 A.3.1: level shift is 2^(P-1))
    val levelShift = 1 << (precision - 1)
    val sampleMax = (1 << precision) - 1
    val downShift = precision - 8

    def writeBlock(ci: Int, bx: Int, by: Int): Unit = {
      idct(coef, spatial)
      val px = bx * 8; val py = by * 8
      val pw = planeW(ci); val plane = planes(ci)
      var yy = 0
      while (yy < 8) {
        var xx = 0
        val rowOff = (py + yy) * pw + px
        while (xx < 8) {
          val v = math.round(spatial(yy * 8 + xx) + levelShift).toInt
          val c = if (v < 0) 0 else if (v > sampleMax) sampleMax else v
          plane(rowOff + xx) = (c >> downShift).toByte
          xx += 1
        }
        yy += 1
      }
    }

    if (hier) {
      // hierarchical: the reference planes hold full-precision samples
      // (point transforms already undone at frame finalize)
      var ci = 0
      while (ci < comps.length) {
        val src = refPlanes(ci); val dst = planes(ci)
        var i = 0
        while (i < src.length) {
          val v8 = if (precision >= 8) src(i) >> (precision - 8)
                   else src(i) << (8 - precision)
          dst(i) = (if (v8 > 255) 255 else v8).toByte
          i += 1
        }
        ci += 1
      }
    } else if (lossless) {
      // lossless: planes hold reconstructed P−Pt bit samples; undo the
      // point transform (<< Pt, H.1.2.3) and take the top 8 bits
      var ci = 0
      while (ci < comps.length) {
        val src = lossPlanes(ci); val dst = planes(ci)
        var i = 0
        while (i < src.length) {
          val full = (src(i) << lossPt) & 0xffff
          val v8 = if (precision >= 8) full >> (precision - 8)
                   else full << (8 - precision)
          dst(i) = (if (v8 > 255) 255 else v8).toByte
          i += 1
        }
        ci += 1
      }
    } else if (grids == null) {
      // Huffman baseline: stream-decode the single interleaved scan
      val br = new BitReader(b, sosPos)
      val pred = new Array[Int](comps.length)
      var mcu = 0
      val nMcus = mcusX * mcusY
      var rstIdx = 0
      while (mcu < nMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart(rstIdx); rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(pred, 0)
        }
        val mx = mcu % mcusX; val my = mcu / mcusX
        var ci = 0
        while (ci < scanComps.length) {
          val c = scanComps(ci)
          val cIdx = comps.indexWhere(_.id == c.id)
          val q = qtab(c.tq); require(q != null, "missing qtable")
          val dc = dcTab(c.td); val ac = acTab(c.ta)
          require(dc != null && ac != null, "missing Huffman table")
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              java.util.Arrays.fill(coef, 0)
              val t = br.decode(dc)
              require(t <= (if (precision == 12) 15 else 11), "DC category out of range")
              pred(cIdx) += extend(br.bits(t), t)
              coef(0) = pred(cIdx) * q(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = br.decode(ac)
                val run = rs >> 4; val size = rs & 15
                if (size == 0) {
                  if (run == 15) k += 16 // ZRL
                  else eob = true
                } else {
                  k += run
                  require(k < 64, "AC index overflow")
                  coef(zigzag(k)) = extend(br.bits(size), size) * q(zigzag(k))
                  k += 1
                }
              }
              writeBlock(cIdx, mx * c.h + bx, my * c.v + by)
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
    } else {
      // progressive/arithmetic: dequantize the accumulated grids, IDCT every block
      var ci = 0
      while (ci < comps.length) {
        val q = qtab(comps(ci).tq); require(q != null, "missing qtable")
        val g = grids(ci)
        var blk = 0
        val nBlk = blocksW(ci) * blocksH(ci)
        while (blk < nBlk) {
          var i = 0
          while (i < 64) { coef(i) = g(blk * 64 + i) * q(i); i += 1 }
          writeBlock(ci, blk % blocksW(ci), blk / blocksW(ci))
          blk += 1
        }
        ci += 1
      }
    }

    // assemble RGB24: grayscale (1 comp), YCbCr (3 comps, JFIF matrix) —
    // except lossless, where 3 components are DIRECT RGB (no JFIF color
    // transform exists for the lossless process; DNG/DICOM convention);
    // nearest-neighbor chroma upsampling via integer index math
    val rgb = new Array[Byte](w * h * 3)
    def sample(ci: Int, x: Int, y: Int): Int = {
      val c = comps(ci)
      val sx = x * c.h / hMax; val sy = y * c.v / vMax
      planes(ci)(sy * planeW(ci) + sx) & 0xff
    }
    var y = 0
    if ((if (hier) lastLossless else lossless) && comps.length == 3) {
      while (y < h) {
        var x = 0
        while (x < w) {
          val o = (y * w + x) * 3
          rgb(o) = sample(0, x, y).toByte
          rgb(o + 1) = sample(1, x, y).toByte
          rgb(o + 2) = sample(2, x, y).toByte
          x += 1
        }
        y += 1
      }
    } else if (comps.length >= 3) {
      while (y < h) {
        var x = 0
        while (x < w) {
          val yv = sample(0, x, y).toDouble
          val cb = sample(1, x, y) - 128.0
          val cr = sample(2, x, y) - 128.0
          def cl(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          val o = (y * w + x) * 3
          rgb(o) = cl(yv + 1.402 * cr)
          rgb(o + 1) = cl(yv - 0.344136 * cb - 0.714136 * cr)
          rgb(o + 2) = cl(yv + 1.772 * cb)
          x += 1
        }
        y += 1
      }
    } else {
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = sample(0, x, y).toByte
          val o = (y * w + x) * 3
          rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
          x += 1
        }
        y += 1
      }
    }
    Some(GifCodec.Frame(w, h, rgb))
  }
}
