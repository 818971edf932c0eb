package graft

/** Test-only QM ENCODER (T.81 D.1 with the jcarith-shaped carry/
  * byte-stuffing output stage) — the dual of JpegArith.Decoder, shared
  * by the arithmetic-JPEG specs (DCT SOF9/SOF10 and lossless SOF11).
  */
import graft.operators.JpegArith

private[graft] class QmEncoder {
    val out = new scala.collection.mutable.ArrayBuffer[Byte]()
    private var a = 0x10000L
    private var c = 0L
    private var ct = 11
    private var buffer = -1 // pending non-0xFF byte, -1 = none
    private var sc = 0      // stacked 0xFF bytes after `buffer`

    private def emit(v: Int): Unit = {
      out += v.toByte
      if (v == 0xff) out += 0x00.toByte // byte stuffing
    }

    private def byteOut(): Unit = {
      val t = (c >> 19).toInt
      if (t > 0xff) {
        // carry: +1 into the pending byte; stacked 0xFFs roll to 0x00
        if (buffer >= 0) emit(buffer + 1)
        while (sc > 0) { out += 0x00.toByte; sc -= 1 }
        buffer = t & 0xff
      } else if (t == 0xff) sc += 1
      else {
        if (buffer >= 0) emit(buffer)
        while (sc > 0) { emit(0xff); sc -= 1 }
        buffer = t
      }
      c &= 0x7ffffL
      ct = 8
    }

    def encode(st: Array[Byte], i: Int, bit: Int): Unit = {
      val sv = st(i) & 0xff
      val idx = sv & 0x7f
      val mps = sv >> 7
      val qe = JpegArith.QE(idx)
      a -= qe
      if (bit == mps) {
        if (a >= 0x8000L) return
        if (a < qe) { c += a; a = qe } // conditional exchange
        st(i) = ((mps << 7) | JpegArith.NMPS(idx)).toByte
      } else {
        if (a >= qe) { c += a; a = qe } // LPS takes the top subinterval
        val nm = if (JpegArith.SWITCH(idx)) 1 - mps else mps
        st(i) = ((nm << 7) | JpegArith.NLPS(idx)).toByte
      }
      do {
        a <<= 1; c <<= 1; ct -= 1
        if (ct == 0) byteOut()
      } while (a < 0x8000L)
    }

    /** D.1.8 flush: pick the code point in [C, C+A) with the most
      * trailing zeros, drain the carry machinery, emit the final bytes
      * (stuffed), and re-init for a following restart interval.
      */
    def flush(): Unit = {
      val t = (a - 1 + c) & 0xffff0000L
      c = if (t < c) t + 0x8000L else t
      c <<= ct
      if ((c & 0xf8000000L) != 0) { // final carry
        if (buffer >= 0) emit(buffer + 1)
        while (sc > 0) { out += 0x00.toByte; sc -= 1 }
      } else {
        if (buffer >= 0) emit(buffer)
        while (sc > 0) { emit(0xff); sc -= 1 }
      }
      emit(((c >> 19) & 0xff).toInt)
      emit(((c >> 11) & 0xff).toInt)
      a = 0x10000L; c = 0; ct = 11; buffer = -1; sc = 0
    }

    def rawMarker(m: Int): Unit = { out += 0xff.toByte; out += m.toByte }
  }
