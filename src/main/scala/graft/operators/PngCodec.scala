package graft.operators

/** Pure-JVM PNG pixel decoding — the second real codec of the pixel tier
  * (GIF landed first; PNG's compression is DEFLATE, which the JVM ships
  * as `java.util.zip.Inflater`, so no native codec dependency here
  * either). Implements the PNG specification (W3C/ISO 15948): signature,
  * chunk walk with CRC32 verification, multi-IDAT zlib stream reassembly,
  * and full scanline defiltering — all five filter types (None, Sub, Up,
  * Average, Paeth) — for 8-bit color types 0 (grayscale, expanded to
  * RGB), 2 (truecolor RGB), and 6 (truecolor+alpha, alpha dropped after
  * defiltering, since the resample kernel is RGB24).
  *
  * Out of scope, by documented capability boundary rather than stubbing:
  * bit depths other than 8, palette color (type 3), interlace (Adam7),
  * and ancillary-chunk semantics (they are skipped; only IHDR/IDAT/IEND
  * drive the decode). Malformed streams — bad signature, chunk overrun,
  * CRC mismatch, truncated inflate, wrong scanline byte count — return
  * None and the caller quarantines, same contract as [[GifCodec]].
  */
object PngCodec {

  private val SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Decode to one RGB24 frame, or None on any malformation. */
  def decode(b: Array[Byte]): Option[GifCodec.Frame] = {
    if (b.length < SIG.length + 25) return None
    var i = 0
    while (i < SIG.length) { if (b(i) != SIG(i)) return None; i += 1 }
    try {
      var o = SIG.length
      var w, h, colorType = -1
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done) {
        if (o + 8 > b.length) return None
        val len = be32(b, o)
        if (len > Int.MaxValue - 12 || o + 12 + len > b.length) return None
        val typ = new String(b, o + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(b, o + 4, 4 + len.toInt)
        if (crc.getValue != be32(b, o + 8 + len.toInt)) return None
        typ match {
          case "IHDR" =>
            if (len != 13) return None
            w = be32(b, o + 8).toInt; h = be32(b, o + 12).toInt
            val bitDepth = b(o + 16) & 0xff
            colorType = b(o + 17) & 0xff
            val interlace = b(o + 20) & 0xff
            if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0 ||
                !(colorType == 0 || colorType == 2 || colorType == 6)) return None
          case "IDAT" => idat.write(b, o + 8, len.toInt)
          case "IEND" => done = true
          case _      => () // ancillary chunk: CRC checked above, content skipped
        }
        o += 12 + len.toInt
      }
      if (w < 0 || idat.size() == 0) return None
      val ch = colorType match { case 0 => 1; case 2 => 3; case _ => 4 }
      val stride = w * ch
      val rawLen = h * (1 + stride)
      if (rawLen > (64 << 20)) return None // decompression-bomb guard
      val raw = new Array[Byte](rawLen)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, got, rawLen - got)
        if (n == 0 && inf.needsInput()) { inf.end(); return None } // truncated
        got += n
      }
      val extra = inf.inflate(new Array[Byte](1)) // stream must end exactly
      val finished = inf.finished() // false => truncated (adler not reached)
      inf.end()
      if (got != rawLen || extra != 0 || !finished) return None

      // defilter in place into a channel buffer, then project to RGB24
      val px = new Array[Byte](h * stride)
      def paeth(a: Int, bb: Int, c: Int): Int = {
        val p = a + bb - c
        val pa = math.abs(p - a); val pb = math.abs(p - bb); val pc = math.abs(p - c)
        if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
      }
      var y = 0
      while (y < h) {
        val f = raw(y * (1 + stride)) & 0xff
        val ro = y * (1 + stride) + 1
        val po = y * stride
        var x = 0
        while (x < stride) {
          val cur = raw(ro + x) & 0xff
          val left = if (x >= ch) px(po + x - ch) & 0xff else 0
          val up = if (y > 0) px(po - stride + x) & 0xff else 0
          val ul = if (y > 0 && x >= ch) px(po - stride + x - ch) & 0xff else 0
          val v = f match {
            case 0 => cur
            case 1 => cur + left
            case 2 => cur + up
            case 3 => cur + ((left + up) >> 1)
            case 4 => cur + paeth(left, up, ul)
            case _ => return None
          }
          px(po + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      val rgb = new Array[Byte](w * h * 3)
      var p = 0
      while (p < w * h) {
        colorType match {
          case 0 =>
            val g = px(p)
            rgb(3 * p) = g; rgb(3 * p + 1) = g; rgb(3 * p + 2) = g
          case 2 =>
            rgb(3 * p) = px(3 * p); rgb(3 * p + 1) = px(3 * p + 1)
            rgb(3 * p + 2) = px(3 * p + 2)
          case _ =>
            rgb(3 * p) = px(4 * p); rgb(3 * p + 1) = px(4 * p + 1)
            rgb(3 * p + 2) = px(4 * p + 2)
        }
        p += 1
      }
      Some(GifCodec.Frame(w, h, rgb))
    } catch { case _: ArrayIndexOutOfBoundsException |
                   _: java.util.zip.DataFormatException => None }
  }
}
