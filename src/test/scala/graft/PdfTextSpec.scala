package graft

import java.util.zip.Deflater

import graft.operators.PdfText
import org.apache.spark.sql.functions._

class PdfTextSpec extends SparkSuite {
  import spark.implicits._

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def pdf(content: Array[Byte], flate: Boolean): Array[Byte] = {
    val data = if (flate) deflate(content) else content
    val head = ("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${data.length}" +
      (if (flate) " /Filter /FlateDecode" else "") +
      " >> stream\n").getBytes("ISO-8859-1")
    head ++ data ++ "\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"
      .getBytes("ISO-8859-1")
  }

  private def textOf(content: String, flate: Boolean = false): String = {
    val doc = PdfText.parseFile(1L, pdf(content.getBytes("ISO-8859-1"), flate))
    assert(doc.ok, doc.err)
    doc.text
  }

  test("show operators: Tj, kerned TJ, quote next-line, Td/TD/T* line moves") {
    val t = textOf("BT /F1 12 Tf 72 720 Td (one) Tj 0 -14 Td " +
      "[(two ) -250 (halves)] TJ (third) ' T* (fourth) Tj ET")
    assert(t == "one\ntwo halves\nthird\nfourth")
  }

  test("text outside BT..ET never leaks; non-show operators discard operands") {
    assert(textOf("(outside) Tj BT (inside) Tj ET (after) Tj") == "inside")
    // a string consumed by a non-show op must not leak into the next Tj
    assert(textOf("BT (gone) Tz (kept) Tj ET") == "kept")
  }

  test("literal-string escapes: named, octal, nested parens, line continuation") {
    assert(textOf("BT (a\\(b\\)c \\\\ d) Tj ET") == "a(b)c \\ d")
    assert(textOf("BT (tab\\there) Tj ET") == "tab\there")
    assert(textOf("BT (oct \\101\\102\\103!) Tj ET") == "oct ABC!")
    assert(textOf("BT (nested (parens) stay) Tj ET") == "nested (parens) stay")
    assert(textOf("BT (split\\\nline) Tj ET") == "splitline") // continuation
  }

  test("hex strings decode, including the odd-digit trailing-zero rule") {
    assert(textOf("BT <48656C6C6F> Tj ET") == "Hello")
    assert(textOf("BT <48 65 6C> Tj ET") == "Hel") // whitespace ignored
    assert(textOf("BT <447> Tj ET") == "Dp") // odd count: 44 70
  }

  test("FlateDecode streams inflate to the same text as uncompressed ones") {
    val content = "BT 72 720 Td (compressed content here) Tj ET"
    assert(textOf(content, flate = true) == textOf(content, flate = false))
    assert(textOf(content, flate = true) == "compressed content here")
  }

  test("malformed files quarantine: bad header, corrupt flate, no objects") {
    assert(!PdfText.parseFile(1L, "not a pdf".getBytes("UTF-8")).ok)
    assert(PdfText.parseFile(1L, "%PDF-1.4\nnothing here".getBytes("UTF-8")).err
      .contains("no objects"))
    val corrupt = pdf("BT (x) Tj ET".getBytes("ISO-8859-1"), flate = false)
    val mangled = new String(corrupt, "ISO-8859-1")
      .replace("/Length", "/Filter /FlateDecode /Length").getBytes("ISO-8859-1")
    val doc = PdfText.parseFile(1L, mangled) // claims flate, isn't
    assert(!doc.ok && doc.err.startsWith("pdf:"))
  }

  test("missing /Length falls back to endstream framing") {
    val raw = new String(pdf("BT (fallback works) Tj ET".getBytes("ISO-8859-1"),
      flate = false), "ISO-8859-1")
    val noLen = raw.replaceAll("/Length \\d+ ", "").getBytes("ISO-8859-1")
    val doc = PdfText.parseFile(1L, noLen)
    assert(doc.ok && doc.text == "fallback works")
  }

  test("synthetic fixture round-trips through the distributed extractor") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = PdfText.extract(PdfText.syntheticPdfFromDocuments(docs))
      .filter(col("ok")).cache()
    try {
      assert(out.count() == docs.count())
      val joined = out.select(col("file_id").as("doc_id"), col("text").as("got"))
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      val expected = concat(
        lit("Title doc "), col("doc_id").cast("string"), lit("\n"), col("text"),
        lit("\nnext line "), (col("doc_id") % 7).cast("string"),
        when(col("doc_id") % 3 === 0, lit("\nesc ( ) \\ ok")).otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit("\nABC")).otherwise(lit("")))
      assert(joined.filter(col("got") =!= expected).count() == 0)
    } finally out.unpersist()
  }

  // ---------------- tier 2: xref / ObjStm / ToUnicode ----------------

  test("tier-2 fixture: ObjStm + xref stream + predictor + CID decode end-to-end") {
    val d0 = PdfText.parseFile(0L, PdfText.buildCidPdf(0L, "Hello CID"))
    assert(d0.ok, d0.err)
    assert(d0.text == "Title doc 0\nHello CID\nplain 0\n\u00abAB")
    assert(d0.n_objects == 9 && d0.n_streams == 1 && d0.n_text_streams == 1)
    val d1 = PdfText.parseFile(1L, PdfText.buildCidPdf(1L, "x (y) \\z"))
    assert(d1.ok && d1.text == "Title doc 1\nx (y) \\z\nplain 1")
  }

  test("ToUnicode: bfchar, bfrange increment, array dst, unmapped → U+FFFD") {
    val cmap = ("""1 begincodespacerange
      |<00> <ff>
      |endcodespacerange
      |1 beginbfchar
      |<01> <0041>
      |endbfchar
      |2 beginbfrange
      |<10> <12> <0061>
      |<20> <21> [<00480069> <0021>]
      |endbfrange
      |endcmap""").stripMargin.getBytes("ISO-8859-1")
    val tu = PdfText.parseToUnicode(cmap)
    assert(tu.decode(Array[Byte](0x01)) == "A")
    assert(tu.decode(Array[Byte](0x10, 0x11, 0x12)) == "abc")
    assert(tu.decode(Array[Byte](0x20)) == "Hi") // multi-unit dst
    assert(tu.decode(Array[Byte](0x21)) == "!")
    assert(tu.decode(Array[Byte](0x7f)) == "\ufffd") // in codespace, unmapped
  }

  test("classic xref table: offsets resolve, two-page /Kids tree concatenates") {
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String): Int = { val at = sb.size(); sb.write(s.getBytes("ISO-8859-1")); at }
    w("%PDF-1.4\n")
    val offs = scala.collection.mutable.ArrayBuffer(0) // index 0 unused
    offs += w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    offs += w("2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n")
    offs += w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    val c1 = "BT (page one) Tj ET"
    offs += w(s"4 0 obj << /Length ${c1.length} >> stream\n$c1\nendstream endobj\n")
    offs += w("5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n")
    val c2 = "BT (page two) Tj ET"
    offs += w(s"6 0 obj << /Length ${c2.length} >> stream\n$c2\nendstream endobj\n")
    val xr = sb.size()
    w("xref\n0 7\n0000000000 65535 f \n" +
      (1 to 6).map(i => f"${offs(i)}%010d 00000 n \n").mkString +
      s"trailer << /Size 7 /Root 1 0 R >>\nstartxref\n$xr\n%%EOF\n")
    val doc = PdfText.parseFile(9L, sb.toByteArray)
    assert(doc.ok, doc.err)
    assert(doc.text == "page one\npage two")
    assert(doc.n_objects == 6 && doc.n_streams == 2 && doc.n_text_streams == 2)
  }

  test("/Encrypt in the trailer quarantines instead of emitting ciphertext") {
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String): Int = { val at = sb.size(); sb.write(s.getBytes("ISO-8859-1")); at }
    w("%PDF-1.4\n")
    val o1 = w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    val o2 = w("2 0 obj << /Type /Pages /Kids [] /Count 0 >> endobj\n")
    val o3 = w("3 0 obj << /Filter /Standard >> endobj\n")
    val xr = sb.size()
    w("xref\n0 4\n0000000000 65535 f \n" +
      Seq(o1, o2, o3).map(o => f"$o%010d 00000 n \n").mkString +
      s"trailer << /Size 4 /Root 1 0 R /Encrypt 3 0 R >>\nstartxref\n$xr\n%%EOF\n")
    val doc = PdfText.parseFile(2L, sb.toByteArray)
    assert(!doc.ok && doc.err.contains("encrypted"))
  }

  test("damaged xref (garbage startxref) falls back to the linear scan") {
    val base = pdf("BT (fallback works) Tj ET".getBytes("ISO-8859-1"), flate = false)
    val broken = base ++ "startxref\n999999999\n%%EOF\n".getBytes("ISO-8859-1")
    val doc = PdfText.parseFile(3L, broken)
    assert(doc.ok && doc.text == "fallback works")
  }

  test("indirect /Length resolves through the xref") {
    val sb = new java.io.ByteArrayOutputStream()
    def w(s: String): Int = { val at = sb.size(); sb.write(s.getBytes("ISO-8859-1")); at }
    w("%PDF-1.4\n")
    val o1 = w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    val o2 = w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    val o3 = w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    val c = "BT (indirect len) Tj ET"
    val o4 = w(s"4 0 obj << /Length 5 0 R >> stream\n$c\nendstream endobj\n")
    val o5 = w(s"5 0 obj ${c.length} endobj\n")
    val xr = sb.size()
    w("xref\n0 6\n0000000000 65535 f \n" +
      Seq(o1, o2, o3, o4, o5).map(o => f"$o%010d 00000 n \n").mkString +
      s"trailer << /Size 6 /Root 1 0 R >>\nstartxref\n$xr\n%%EOF\n")
    val doc = PdfText.parseFile(4L, sb.toByteArray)
    assert(doc.ok, doc.err)
    assert(doc.text == "indirect len")
  }

  test("PNG predictors: unpredict inverts Sub/Up/Average/Paeth filtering") {
    val cols = 7
    val rnd = new scala.util.Random(7)
    val plain = Array.fill(4 * cols)(rnd.nextInt(256).toByte)
    // filter each row with a different type (1..4), like a real encoder may
    val filtered = new Array[Byte](4 * (cols + 1))
    for (r <- 0 until 4; i <- 0 until cols) {
      val ft = r + 1
      filtered(r * (cols + 1)) = ft.toByte
      val cur = plain(r * cols + i) & 0xff
      val left = if (i > 0) plain(r * cols + i - 1) & 0xff else 0
      val up = if (r > 0) plain((r - 1) * cols + i) & 0xff else 0
      val ul = if (r > 0 && i > 0) plain((r - 1) * cols + i - 1) & 0xff else 0
      val predicted = ft match {
        case 1 => left
        case 2 => up
        case 3 => (left + up) >> 1
        case 4 =>
          val p = left + up - ul
          val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
          if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
      }
      filtered(r * (cols + 1) + 1 + i) = ((cur - predicted) & 0xff).toByte
    }
    assert(PdfText.unpredict(filtered, 12, cols).sameElements(plain))
  }

  test("ASCIIHexDecode: pairs, whitespace, '>' terminator, odd-digit rule") {
    assert(PdfText.asciiHexDecode("48 65 6c\n6C 6f>".getBytes("ISO-8859-1"))
      .sameElements("Hello".getBytes("ISO-8859-1")))
    assert(PdfText.asciiHexDecode("7>".getBytes("ISO-8859-1"))
      .sameElements(Array(0x70.toByte)))
    intercept[IllegalStateException] {
      PdfText.asciiHexDecode("4z>".getBytes("ISO-8859-1"))
    }
  }

  // minimal in-spec LZW encoder (TIFF/PDF variant, early change 1):
  // independent mirror of the decoder for round-trip evidence
  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var width = 9
    val dict = scala.collection.mutable.HashMap.empty[Seq[Byte], Int]
    var dictSize = 258
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code; bitCnt += width
      while (bitCnt >= 8) { out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
    }
    put(256) // clear
    var w = Seq.empty[Byte]
    for (b <- data) {
      val wb = w :+ b
      if (wb.length == 1 || dict.contains(wb)) w = wb
      else {
        put(if (w.length == 1) w.head & 0xff else dict(w))
        if (dictSize < 4096) { dict(wb) = dictSize; dictSize += 1 }
        // early change: the encoder's table leads the decoder by one
        // entry, so it widens when ITS next-free slot hits 2^w (the
        // decoder widens at next-free + 1 = 2^w). Anchored against the
        // JDK ImageIO TIFF LZW encoder below — not just this mirror.
        if (dictSize >= (1 << width) && width < 12) width += 1
        w = Seq(b)
      }
    }
    if (w.nonEmpty) put(if (w.length == 1) w.head & 0xff else dict(w))
    put(257) // EOD
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  test("LZWDecode: encoder round-trip incl. table growth and KwKwK") {
    val rnd = new scala.util.Random(11)
    for (n <- Seq(0, 1, 5, 300, 5000)) {
      // low-entropy bytes force long dictionary chains + width growth
      val data = Array.fill(n)((rnd.nextInt(4) * 17).toByte)
      val got = PdfText.lzwDecode(lzwEncode(data))
      assert(got.sameElements(data), s"n=$n")
    }
    // KwKwK: "aaaa…" emits a code equal to dictSize on decode
    val runs = Array.fill(64)('a'.toByte)
    assert(PdfText.lzwDecode(lzwEncode(runs)).sameElements(runs))
    intercept[IllegalStateException] {
      PdfText.lzwDecode(Array(0xff.toByte, 0xff.toByte)) // garbage code
    }
  }

  test("LZWDecode decodes a stream from the JDK's independent TIFF LZW encoder") {
    // The r15 decoder widened one table entry EARLY and the mirror
    // encoder above shared the shifted threshold, so the round-trip test
    // was blind to it (ADVICE r15). PDF's LZWDecode is BY SPEC the TIFF
    // algorithm (ISO 32000-1 §7.4.4.2, early change = 1), and the JDK
    // ships a battle-tested TIFF codec since 9 — encode a raster with
    // ImageIO's writer, slice the LZW strips out of the TIFF container,
    // and require OUR decoder to reproduce the raster bytes. Low-entropy
    // patterned data grows the table past both the 9→10 and 10→11
    // widening boundaries where the off-by-one desyncs.
    import java.awt.image.{BufferedImage, DataBufferByte}
    import javax.imageio.{ImageIO, ImageWriteParam, IIOImage}
    val w = 256; val h = 64
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val rnd = new scala.util.Random(7)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, rnd.nextInt(17) * 15)
    val raster = img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    val baos = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val ios = ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType("LZW")
    writer.write(null, new IIOImage(img, null, null), p)
    ios.close(); writer.dispose()
    val t = baos.toByteArray
    // minimal TIFF IFD walk for StripOffsets/StripByteCounts
    val le = t(0) == 'I'
    def u16(o: Int): Int =
      if (le) (t(o) & 0xff) | ((t(o + 1) & 0xff) << 8)
      else ((t(o) & 0xff) << 8) | (t(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (le) (0 to 3).map(i => (t(o + i) & 0xffL) << (8 * i)).reduce(_ | _)
      else (0 to 3).map(i => (t(o + i) & 0xffL) << (8 * (3 - i))).reduce(_ | _)
    val ifd = u32(4).toInt
    val n = u16(ifd)
    def values(tag: Int): Seq[Long] =
      (0 until n).map(i => ifd + 2 + 12 * i).find(e => u16(e) == tag).toSeq.flatMap { e =>
        val typ = u16(e + 2); val cnt = u32(e + 4).toInt
        val sz = if (typ == 3) 2 else 4
        val base = if (cnt * sz <= 4) e + 8 else u32(e + 8).toInt
        (0 until cnt).map(i => if (typ == 3) u16(base + i * sz).toLong else u32(base + i * sz))
      }
    assert(values(259) == Seq(5L), "compression must be LZW")
    assert(values(317).forall(_ == 1L), "no predictor expected")
    val offs = values(273); val lens = values(279)
    assert(offs.nonEmpty && offs.size == lens.size)
    val decoded = offs.zip(lens).flatMap { case (o, l) =>
      PdfText.lzwDecode(java.util.Arrays.copyOfRange(t, o.toInt, (o + l).toInt))
    }.toArray
    assert(decoded.length == raster.length,
      s"decoded ${decoded.length} vs raster ${raster.length}")
    assert(decoded.sameElements(raster))
    // negative control (proves this test has teeth): widening ONE entry
    // early — numerically earlyChange+1, exactly the r15 bug — must NOT
    // reproduce the raster from the same externally-encoded stream
    val oneEarly = scala.util.Try(offs.zip(lens).flatMap { case (o, l) =>
      PdfText.lzwDecode(java.util.Arrays.copyOfRange(t, o.toInt, (o + l).toInt),
        earlyChange = 2)
    }.toArray)
    assert(oneEarly.isFailure || !oneEarly.get.sameElements(raster),
      "a one-early widen decoded the JDK stream — the boundary is not exercised")
  }

  test("cyclic indirect objects quarantine instead of hanging or overflowing") {
    // 1 0 obj 1 0 R endobj — resolve(Root) chases a self-referential
    // value; r15's tail-recursive resolve compiled to an infinite loop
    // (ADVICE high). With the hop bound the file must come back as a
    // non-ok row (or tier-1 fallback), never hang or throw an Error.
    def pdf(body: String): Array[Byte] = {
      val head = "%PDF-1.4\n"
      val b = new StringBuilder(head)
      val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
      body.split("@").zipWithIndex.foreach { case (obj, _) =>
        offs += b.length; b.append(obj)
      }
      val xref = b.length
      b.append(s"xref\n0 ${offs.length + 1}\n0000000000 65535 f \n")
      offs.foreach(o => b.append(f"$o%010d 00000 n \n"))
      b.append(s"trailer << /Size ${offs.length + 1} /Root 1 0 R >>\n")
      b.append(s"startxref\n$xref\n%%EOF\n")
      b.toString.getBytes("ISO-8859-1")
    }
    val selfRef = pdf("1 0 obj 1 0 R endobj\n")
    val d1 = PdfText.parseFile(1L, selfRef)
    assert(!d1.ok || d1.text.isEmpty) // quarantined or degraded, not hung
    // mutually-referential pair
    val mutual = pdf("1 0 obj 2 0 R endobj\n@2 0 obj 1 0 R endobj\n")
    val d2 = PdfText.parseFile(2L, mutual)
    assert(!d2.ok || d2.text.isEmpty)
    // indirect /Length that resolves through itself: exercises the fetch
    // in-progress guard (reentrant load on the same object number)
    val selfLen = pdf(
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "@2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "@3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      "@4 0 obj << /Length 4 0 R >> stream\nBT (x) Tj ET\nendstream endobj\n")
    val d3 = PdfText.parseFile(3L, selfLen)
    assert(d3 != null) // must terminate; ok either way (len falls back)
  }

  test("LZW and ASCIIHex streams extract through both tiers") {
    val content = "BT (legacy filters) Tj ET"
    // tier 1 (no xref): LZW content stream
    val lzw = lzwEncode(content.getBytes("ISO-8859-1"))
    val head = ("%PDF-1.1\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${lzw.length} /Filter /LZWDecode >> stream\n").getBytes("ISO-8859-1")
    val doc = PdfText.parseFile(5L,
      head ++ lzw ++ "\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF\n".getBytes("ISO-8859-1"))
    assert(doc.ok && doc.text == "legacy filters", doc.err)
    // ASCIIHex via the same shape
    val hexed = content.getBytes("ISO-8859-1").map(b => f"$b%02x").mkString + ">"
    val head2 = ("%PDF-1.1\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${hexed.length} /Filter /ASCIIHexDecode >> stream\n").getBytes("ISO-8859-1")
    val doc2 = PdfText.parseFile(6L,
      head2 ++ hexed.getBytes("ISO-8859-1") ++
        "\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF\n".getBytes("ISO-8859-1"))
    assert(doc2.ok && doc2.text == "legacy filters", doc2.err)
  }

  test("tier-2 fixture round-trips through the distributed extractor") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 60)
    val out = PdfText.extract(PdfText.syntheticCidPdfFromDocuments(docs))
      .filter(col("ok")).cache()
    try {
      assert(out.count() == docs.count())
      val joined = out.select(col("file_id").as("doc_id"), col("text").as("got"))
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      val expected = concat(
        lit("Title doc "), col("doc_id").cast("string"), lit("\n"), col("text"),
        lit("\nplain "), (col("doc_id") % 5).cast("string"),
        when(col("doc_id") % 3 === 0, lit("\n\u00abAB")).otherwise(lit("")))
      assert(joined.filter(col("got") =!= expected).count() == 0)
    } finally out.unpersist()
  }
}
