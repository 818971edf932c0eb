package graft.operators

/** Pure-JVM PNG pixel decoding — the second real codec of the pixel tier
  * (GIF landed first; PNG's compression is DEFLATE, which the JVM ships
  * as `java.util.zip.Inflater`, so no native codec dependency here
  * either). Implements the PNG specification (W3C/ISO 15948): signature,
  * chunk walk with CRC32 verification, multi-IDAT zlib stream reassembly,
  * full scanline defiltering — all five filter types (None, Sub, Up,
  * Average, Paeth) at the spec's byte-granular bpp offsets — and, as of
  * r13, the ENTIRE static-image format matrix:
  *
  *   - color types 0 (grayscale), 2 (truecolor), 3 (palette/PLTE),
  *     4 (grayscale+alpha), 6 (truecolor+alpha);
  *   - every legal bit depth per type (1/2/4/8/16 gray, 1/2/4/8 palette,
  *     8/16 for the multi-channel types) — sub-byte samples unpack
  *     MSB-first and grayscale scales by 255/(2^d−1) (the spec's sample
  *     expansion), 16-bit reduces to its high byte (the RGB24 contract);
  *   - Adam7 interlace: seven passes, each defiltered independently at
  *     its own geometry and recomposed by the pass placement grid.
  *
  * Alpha is dropped after defiltering (the resample kernel is RGB24);
  * ancillary chunks are CRC-checked and skipped (tRNS included — there
  * is no alpha in the output to apply it to). Malformed streams — bad
  * signature, chunk overrun, CRC mismatch, truncated inflate, wrong
  * scanline byte count, illegal depth/type combination, palette index
  * out of range — return None and the caller quarantines, same contract
  * as [[GifCodec]].
  */
object PngCodec {

  private val SIG = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Adam7 pass geometry: x/y origin and step per pass. */
  private val A7x0 = Array(0, 4, 0, 2, 0, 1, 0)
  private val A7y0 = Array(0, 0, 4, 0, 2, 0, 1)
  private val A7dx = Array(8, 8, 4, 4, 2, 2, 1)
  private val A7dy = Array(8, 8, 8, 4, 4, 2, 2)

  /** Decode to one RGB24 frame, or None on any malformation. */
  def decode(b: Array[Byte]): Option[GifCodec.Frame] = {
    if (b.length < SIG.length + 25) return None
    var i = 0
    while (i < SIG.length) { if (b(i) != SIG(i)) return None; i += 1 }
    try {
      var o = SIG.length
      var w, h, colorType, depth, interlace = -1
      var plte: Array[Byte] = null
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
            depth = b(o + 16) & 0xff
            colorType = b(o + 17) & 0xff
            interlace = b(o + 20) & 0xff
            val legal = (colorType, depth) match {
              case (0, 1 | 2 | 4 | 8 | 16) => true
              case (2, 8 | 16) => true
              case (3, 1 | 2 | 4 | 8) => true
              case (4, 8 | 16) => true
              case (6, 8 | 16) => true
              case _ => false
            }
            // pixel-volume cap (the JpegCodec bound): the 64 MB RAW guard
            // alone lets a 1-bit image demand a 1.5 GB RGB allocation
            if (w <= 0 || h <= 0 || w.toLong * h > (1L << 24) ||
                !legal || interlace > 1) return None
          case "PLTE" =>
            if (len % 3 != 0 || len == 0 || len > 768) return None
            plte = java.util.Arrays.copyOfRange(b, o + 8, o + 8 + len.toInt)
          case "IDAT" => idat.write(b, o + 8, len.toInt)
          case "IEND" => done = true
          case _      => () // ancillary chunk: CRC checked above, content skipped
        }
        o += 12 + len.toInt
      }
      if (w < 0 || idat.size() == 0) return None
      if (colorType == 3 && plte == null) return None
      val ch = colorType match {
        case 0 | 3 => 1
        case 4 => 2
        case 2 => 3
        case _ => 4
      }
      val bitsPP = depth * ch
      val bpp = math.max(1, bitsPP / 8) // filter left-offset, bytes
      // (x0, y0, dx, dy, pw, ph) per pass; non-interlaced = one full pass
      val passes: Seq[(Int, Int, Int, Int, Int, Int)] =
        if (interlace == 0) Seq((0, 0, 1, 1, w, h))
        else (0 until 7).map { p =>
          val pw = if (w > A7x0(p)) (w - A7x0(p) + A7dx(p) - 1) / A7dx(p) else 0
          val ph = if (h > A7y0(p)) (h - A7y0(p) + A7dy(p) - 1) / A7dy(p) else 0
          (A7x0(p), A7y0(p), A7dx(p), A7dy(p), pw, ph)
        }.filter(p => p._5 > 0 && p._6 > 0)
      def rowBytes(pw: Int): Int = (pw * bitsPP + 7) / 8
      val rawLenL = passes.map { case (_, _, _, _, pw, ph) =>
        ph.toLong * (1 + rowBytes(pw)) }.sum
      if (rawLenL > (64L << 20)) return None // decompression-bomb guard
      val rawLen = rawLenL.toInt
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

      def paeth(a: Int, bb: Int, c: Int): Int = {
        val p = a + bb - c
        val pa = math.abs(p - a); val pb = math.abs(p - bb); val pc = math.abs(p - c)
        if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
      }

      val rgb = new Array[Byte](w * h * 3)
      val grayMax = (1 << depth) - 1
      var rawOff = 0
      for ((x0, y0, dx, dy, pw, ph) <- passes) {
        val rb = rowBytes(pw)
        // defilter this pass's scanlines into a contiguous byte buffer
        val px = new Array[Byte](ph * rb)
        var y = 0
        while (y < ph) {
          val f = raw(rawOff + y * (1 + rb)) & 0xff
          val ro = rawOff + y * (1 + rb) + 1
          val po = y * rb
          var x = 0
          while (x < rb) {
            val cur = raw(ro + x) & 0xff
            val left = if (x >= bpp) px(po + x - bpp) & 0xff else 0
            val up = if (y > 0) px(po - rb + x) & 0xff else 0
            val ul = if (y > 0 && x >= bpp) px(po - rb + x - bpp) & 0xff else 0
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
        // emit this pass's pixels into the full-size image
        var py = 0
        while (py < ph) {
          var pxi = 0
          while (pxi < pw) {
            // channel sample ci of pixel pxi on pass row py, as 8 bits
            def sample(ci: Int): Int = depth match {
              case 16 => px(py * rb + (pxi * ch + ci) * 2) & 0xff // high byte
              case 8 => px(py * rb + pxi * ch + ci) & 0xff
              case d => // sub-byte: single channel, MSB-first packing
                val bit = pxi * d
                ((px(py * rb + (bit >> 3)) & 0xff) >> (8 - d - (bit & 7))) &
                  ((1 << d) - 1)
            }
            var r = 0; var g = 0; var bl = 0
            colorType match {
              case 0 =>
                val v0 = sample(0)
                val v = if (depth < 8) v0 * 255 / grayMax else v0
                r = v; g = v; bl = v
              case 2 | 6 =>
                r = sample(0); g = sample(1); bl = sample(2)
              case 3 =>
                val idx = sample(0)
                if (3 * idx + 2 >= plte.length) return None
                r = plte(3 * idx) & 0xff; g = plte(3 * idx + 1) & 0xff
                bl = plte(3 * idx + 2) & 0xff
              case _ => // 4: gray + alpha, alpha dropped
                val v = sample(0); r = v; g = v; bl = v
            }
            val oo = ((y0 + py * dy) * w + x0 + pxi * dx) * 3
            rgb(oo) = r.toByte; rgb(oo + 1) = g.toByte; rgb(oo + 2) = bl.toByte
            pxi += 1
          }
          py += 1
        }
        rawOff += ph * (1 + rb)
      }
      Some(GifCodec.Frame(w, h, rgb))
    } catch { case _: ArrayIndexOutOfBoundsException |
                   _: java.util.zip.DataFormatException => None }
  }
}
