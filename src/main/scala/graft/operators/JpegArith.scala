package graft.operators

/** The QM binary arithmetic coder of ITU-T T.81 Annex D — the entropy
  * layer behind the arithmetic JPEG processes (SOF9/SOF10/SOF11). This
  * object holds the probability-estimation state machine (Table D.3,
  * transcribed from the public libjpeg `jaricom.c` rendering of the
  * standard's table) and the DECODER (D.2); the matching test-only
  * encoder lives in `JpegArithSpec`, mirroring how the Huffman layers
  * are validated.
  *
  * Register conventions (D.1.7/D.2.7, the software flowcharts): the
  * interval register A renormalizes into [0x8000, 0x10000); the code
  * register keeps a 16-bit comparison window with one feed byte below
  * it. The coder maps the MPS to the BOTTOM subinterval [0, A−Qe) and
  * the LPS to the top [A−Qe, A), with conditional exchange when
  * renormalization makes the LPS subinterval the larger one — note this
  * is the opposite interval convention from the later MQ coder (T.88).
  * Compressed data is byte-stuffed: an 0xFF data byte is followed by
  * 0x00; any other byte after 0xFF is a real marker, after which the
  * decoder feeds zero bytes (T.81's marker-terminates-entropy-data
  * convention — unlike Huffman scans, hitting the marker mid-decode is
  * normal here, because the encoder's flush drops trailing bytes the
  * decoder can reconstruct as zeros).
  *
  * A statistics bin is one mutable byte: low 7 bits = Table D.3 state
  * index, high bit = current MPS sense. Bin 113 is the non-adapting
  * "fixed" state (Qe ≈ 0.5, self-looping) used for AC sign decisions
  * (F.2.2.2) and progressive DC refinement bits.
  */
private[graft] object JpegArith {

  /** Table D.3 rows: Qe value, Next_Index_MPS, Next_Index_LPS, Switch.
    * Row 113 is the fixed (non-adapting) ~0.5 state.
    */
  private[graft] val QE: Array[Int] = Array(
    0x5a1d, 0x2586, 0x1114, 0x080b, 0x03d8, 0x01da, 0x00e5, 0x006f,
    0x0036, 0x001a, 0x000d, 0x0006, 0x0003, 0x0001, 0x5a7f, 0x3f25,
    0x2cf2, 0x207c, 0x17b9, 0x1182, 0x0cef, 0x09a1, 0x072f, 0x055c,
    0x0406, 0x0303, 0x0240, 0x01b1, 0x0144, 0x00f5, 0x00b7, 0x008a,
    0x0068, 0x004e, 0x003b, 0x002c, 0x5ae1, 0x484c, 0x3a0d, 0x2ef1,
    0x261f, 0x1f33, 0x19a8, 0x1518, 0x1177, 0x0e74, 0x0bfb, 0x09f8,
    0x0861, 0x0706, 0x05cd, 0x04de, 0x040f, 0x0363, 0x02d4, 0x025c,
    0x01f8, 0x01a4, 0x0160, 0x0125, 0x00f6, 0x00cb, 0x00ab, 0x008f,
    0x5b12, 0x4d04, 0x412c, 0x37d8, 0x2fe8, 0x293c, 0x2379, 0x1edf,
    0x1aa9, 0x174e, 0x1424, 0x119c, 0x0f6b, 0x0d51, 0x0bb6, 0x0a40,
    0x5832, 0x4d1c, 0x438e, 0x3bdd, 0x34ee, 0x2eae, 0x299a, 0x2516,
    0x5570, 0x4ca9, 0x44d9, 0x3e22, 0x3824, 0x32b4, 0x2e17, 0x56a8,
    0x4f46, 0x47e5, 0x41cf, 0x3c3d, 0x375e, 0x5231, 0x4c0f, 0x4639,
    0x415e, 0x5627, 0x50e7, 0x4b85, 0x5597, 0x504f, 0x5a10, 0x5522,
    0x59eb, 0x5a1d)

  private[graft] val NMPS: Array[Int] = Array(
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 13, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 9, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48,
    49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63, 32,
    65, 66, 67, 68, 69, 70, 71, 72, 73, 74, 75, 76, 77, 78, 79, 48,
    81, 82, 83, 84, 85, 86, 87, 71, 89, 90, 91, 92, 93, 94, 86, 96,
    97, 98, 99, 100, 93, 102, 103, 104, 99, 106, 107, 103, 109, 107, 111, 109,
    111, 113)

  private[graft] val NLPS: Array[Int] = Array(
    1, 14, 16, 18, 20, 23, 25, 28, 30, 33, 35, 9, 10, 12, 15, 36,
    38, 39, 40, 42, 43, 45, 46, 48, 49, 51, 52, 54, 56, 57, 59, 60,
    62, 63, 32, 33, 37, 64, 65, 67, 68, 69, 70, 72, 73, 74, 75, 77,
    78, 79, 48, 50, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 61, 61,
    65, 80, 81, 82, 83, 84, 86, 87, 87, 72, 72, 74, 74, 75, 77, 77,
    80, 88, 89, 90, 91, 92, 93, 86, 88, 95, 96, 97, 99, 99, 93, 95,
    101, 102, 103, 104, 99, 105, 106, 107, 103, 105, 108, 109, 110, 111, 110, 112,
    112, 113)

  private[graft] val SWITCH: Array[Boolean] = {
    val s = new Array[Boolean](114)
    Seq(0, 14, 36, 64, 80, 88, 95, 105, 110, 112).foreach(s(_) = true)
    s
  }

  /** Index of the fixed ~0.5 non-adapting state. */
  private[graft] val FixedState = 113

  /** A fresh statistics area of `n` bins (state 0, MPS = 0). */
  private[graft] def stats(n: Int): Array[Byte] = new Array[Byte](n)

  /** A single-bin fixed-probability area (never adapts). */
  private[graft] def fixedBin: Array[Byte] = Array(FixedState.toByte)

  /** QM decoder over one entropy-coded segment starting at `start`.
    * Byte-stuffed input (0xFF 0x00 → data 0xFF); the first 0xFF
    * followed by a non-zero byte is a marker — from then on zero bytes
    * are fed and `markerPos` points at the 0xFF. [[restart]] re-reads
    * the RSTn at the marker and re-initializes (stats are reset by the
    * CALLER, which owns the statistics areas).
    */
  private[graft] final class Decoder(b: Array[Byte], start: Int) {
    private var pos = 0
    private var atMarker = false
    private var a = 0L
    private var c = 0L
    private var ct = 0

    locally { init(start) }

    private def init(p: Int): Unit = {
      pos = p; atMarker = false
      // 16-bit comparison window from the first two data bytes
      c = (nextByte().toLong << 8 | nextByte()) << 16
      ct = 0
      a = 0x10000L
    }

    /** Walk past any unconsumed flush bytes to the terminating marker
      * and return its 0xFF position (call when decoding is complete —
      * within entropy data every 0xFF is stuffed, so the first
      * unstuffed one is the marker). Returns `b.length` on a stream
      * that ends without one (the caller's marker parse fails loudly).
      */
    def end(): Int = { seekMarker(); pos }

    private def seekMarker(): Unit =
      while (!atMarker && pos < b.length) {
        if ((b(pos) & 0xff) == 0xff && pos + 1 < b.length && b(pos + 1) != 0)
          atMarker = true
        else pos += 1
      }

    private def nextByte(): Int =
      if (atMarker || pos >= b.length) 0
      else {
        val v = b(pos) & 0xff
        if (v != 0xff) { pos += 1; v }
        else if (pos + 1 < b.length && b(pos + 1) == 0) { pos += 2; 0xff }
        else { atMarker = true; 0 } // marker: feed zeros, pos pinned at 0xFF
      }

    /** Skip to and consume the expected RSTn marker, then re-init. */
    def restart(expected: Int): Unit = {
      seekMarker() // the flush's trailing bytes may not all be consumed
      require(pos + 1 < b.length && (b(pos) & 0xff) == 0xff &&
        (b(pos + 1) & 0xff) == (0xd0 + expected), "missing restart marker")
      init(pos + 2)
    }

    /** Decode one binary decision against the statistics bin `st(i)`
      * (D.2.2 DECODE with MPS at the bottom subinterval).
      */
    def decode(st: Array[Byte], i: Int): Int = {
      val sv = st(i) & 0xff
      val idx = sv & 0x7f
      val mps = sv >> 7
      val qe = QE(idx)
      val ap = a - qe
      val chigh = (c >>> 16) & 0xffffL
      var bit = 0
      if (chigh < ap) {
        if (ap >= 0x8000L) { a = ap; return mps } // short path, no renorm
        // bottom region with renorm: conditional exchange decides
        a = ap
        if (ap < qe) { // MPS/LPS exchanged: bottom holds the LPS
          bit = 1 - mps
          if (SWITCH(idx)) st(i) = (((1 - mps) << 7) | NLPS(idx)).toByte
          else st(i) = ((mps << 7) | NLPS(idx)).toByte
        } else {
          bit = mps
          st(i) = ((mps << 7) | NMPS(idx)).toByte
        }
      } else {
        // top region [A-Qe, A): holds the LPS unless exchanged
        c -= ap << 16
        a = qe
        if (ap < qe) { // exchanged: top holds the MPS
          bit = mps
          st(i) = ((mps << 7) | NMPS(idx)).toByte
        } else {
          bit = 1 - mps
          if (SWITCH(idx)) st(i) = (((1 - mps) << 7) | NLPS(idx)).toByte
          else st(i) = ((mps << 7) | NLPS(idx)).toByte
        }
      }
      // RENORMD (D.2.4): one feed byte sits below the window
      do {
        if (ct == 0) { c |= nextByte().toLong << 8; ct = 8 }
        a <<= 1; c = (c << 1) & 0xffffffffL; ct -= 1
      } while (a < 0x8000L)
      bit
    }
  }
}
