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
}
