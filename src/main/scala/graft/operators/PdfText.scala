package graft.operators

import java.util.zip.Inflater

import graft.operators.Multimodal.{Decoder, MediaRow}
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** PDF text extraction, planning tier (ISO 32000 — public spec): the
  * other big crawl payload class after HTML. Same shape as the image
  * codecs: a pure-JVM byte parser behind [[Multimodal.decodeBatched]]'s
  * byte-volume partitioning, quarantine rows instead of task deaths, an
  * id-derived synthetic fixture whose expected output the DuckDB oracle
  * replays with string arithmetic.
  *
  * Covered (the tier a curation pipeline needs to triage a crawl's PDFs):
  * linear object scan (`N G obj … endobj` — no xref required, the
  * resilient path real extractors fall back to on damaged files), stream
  * objects with `/Length` framing and `endstream` fallback, FlateDecode
  * decompression (bounded, quarantining), and content-stream text
  * operators: `BT…ET` blocks, `Tj`, `'`, `"`, `TJ` arrays, line moves
  * (`Td`/`TD`/`T*` and the `'`/`"` implicit ones) emitting newlines,
  * literal strings with the full escape table (`\n \r \t \b \f \( \) \\`,
  * octal, line continuation) and hex strings.
  *
  * Declared boundaries (documented, not silent): no font /Encoding or
  * ToUnicode CMap resolution (bytes are read as Latin-1 — correct for
  * the ASCII/WinAnsi majority, mojibake for subsetted-CID fonts), no
  * xref/object-stream (`/ObjStm`) indirection, no encryption. Those are
  * the full-decoder tier; this is the honest planning tier, like
  * `keyframeSamplePlan` for video.
  */
object PdfText {

  /** One parsed file: all content-stream text joined in stream order.
    * `n_text_streams` counts streams that yielded at least one show op.
    */
  case class PdfDoc(file_id: Long, n_objects: Int, n_streams: Int,
                    n_text_streams: Int, text: String, n_chars: Long,
                    ok: Boolean, err: String)

  /** Decompressed-stream cap: a content stream bigger than this is a
    * data bug (or a zip bomb), not a reason for a bigger heap.
    */
  private[operators] val MaxStreamBytes: Int = 64 << 20

  private def inflate(b: Array[Byte], from: Int, len: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(b, from, len)
    val out = new java.io.ByteArrayOutputStream(math.min(len * 4, 1 << 20))
    val buf = new Array[Byte](64 << 10)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n > 0) {
        out.write(buf, 0, n)
        if (out.size > MaxStreamBytes)
          throw new java.util.zip.DataFormatException(
            s"stream inflates past $MaxStreamBytes bytes")
      } else if (n == 0 && inf.needsDictionary())
        throw new java.util.zip.DataFormatException("preset dictionary")
    }
    inf.end()
    out.toByteArray
  }

  private def find(b: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes("ISO-8859-1")
    var i = math.max(from, 0)
    val last = b.length - n.length
    while (i <= last) {
      var j = 0
      while (j < n.length && b(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  /** Extract the show-op text of ONE content stream (already inflated).
    * Outside `BT…ET` nothing is emitted. Deterministic newline policy:
    * `Td`/`TD`/`T*` append one newline when text is already present (and
    * not already newline-terminated); `'` and `"` move to the next line
    * before showing, per spec.
    */
  private[operators] def streamText(s: Array[Byte]): String = {
    val out = new StringBuilder
    var i = 0
    var inText = false
    var lastShown = false // something emitted since the last newline
    def newline(): Unit =
      if (out.nonEmpty && out.last != '\n') { out.append('\n'); lastShown = false }
    // one literal string starting at '(' — returns (decoded, next index)
    def literal(p0: Int): (String, Int) = {
      val sb = new StringBuilder
      var p = p0 + 1
      var depth = 1
      while (p < s.length && depth > 0) {
        val c = s(p) & 0xff
        if (c == '\\' && p + 1 < s.length) {
          val e = s(p + 1) & 0xff
          e match {
            case 'n' => sb.append('\n'); p += 2
            case 'r' => sb.append('\r'); p += 2
            case 't' => sb.append('\t'); p += 2
            case 'b' => sb.append('\b'); p += 2
            case 'f' => sb.append('\f'); p += 2
            case '(' => sb.append('('); p += 2
            case ')' => sb.append(')'); p += 2
            case '\\' => sb.append('\\'); p += 2
            case '\r' => p += 2; if (p < s.length && s(p) == '\n') p += 1 // continuation
            case '\n' => p += 2 // continuation
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = 0; p += 1
              while (k < 3 && p < s.length && s(p) >= '0' && s(p) <= '7') {
                v = v * 8 + (s(p) - '0'); p += 1; k += 1
              }
              sb.append((v & 0xff).toChar)
            case _ => sb.append(e.toChar); p += 2 // unknown escape: literal
          }
        } else {
          if (c == '(') depth += 1
          else if (c == ')') { depth -= 1; if (depth == 0) { p += 1 }
          }
          if (depth > 0) { sb.append(c.toChar); p += 1 }
        }
      }
      (sb.toString, p)
    }
    def hexString(p0: Int): (String, Int) = {
      val sb = new StringBuilder
      var p = p0 + 1
      var hi = -1
      while (p < s.length && s(p) != '>') {
        val c = s(p).toChar
        val d = Character.digit(c, 16)
        if (d >= 0) { if (hi < 0) hi = d else { sb.append(((hi << 4) | d).toChar); hi = -1 } }
        p += 1
      }
      if (hi >= 0) sb.append((hi << 4).toChar) // odd count: trailing 0 per spec
      (sb.toString, math.min(p + 1, s.length))
    }
    // token scan: strings are captured (pending) and emitted when a show
    // operator consumes them; TJ arrays concatenate their string elements
    var pending = new StringBuilder // strings seen since the last operator
    def show(): Unit = {
      out.append(pending); pending = new StringBuilder; lastShown = true
    }
    def op(word: String): Unit = word match {
      case "BT" => inText = true; pending = new StringBuilder
      case "ET" => inText = false; pending = new StringBuilder
      case "Tj" | "TJ" if inText => show()
      case "'" | "\"" if inText => newline(); show()
      case "Td" | "TD" | "T*" if inText =>
        if (lastShown) newline()
        pending = new StringBuilder
      case _ => pending = new StringBuilder // any other op discards operands
    }
    while (i < s.length) {
      val c = s(i) & 0xff
      if (c == '(') { val (t, p) = literal(i); if (inText) pending.append(t); i = p }
      else if (c == '<' && i + 1 < s.length && (s(i + 1) & 0xff) == '<') i += 2 // dict
      else if (c == '<') { val (t, p) = hexString(i); if (inText) pending.append(t); i = p }
      else if (c == '%') { while (i < s.length && s(i) != '\n') i += 1 } // comment
      else if (c == '\'' || c == '"') { op(c.toChar.toString); i += 1 }
      else if (Character.isLetter(c) || c == '*') {
        val start = i
        while (i < s.length && { val x = s(i) & 0xff
          Character.isLetterOrDigit(x) || x == '*' }) i += 1
        op(new String(s, start, i - start, "ISO-8859-1"))
      } else i += 1 // numbers, arrays, names, whitespace: operands/noise
    }
    out.toString
  }

  /** Parse one PDF file into its text row; malformed input quarantines. */
  private[graft] def parseFile(fileId: Long, b: Array[Byte]): PdfDoc = {
    def bad(msg: String) = PdfDoc(fileId, 0, 0, 0, "", 0L, ok = false, err = msg)
    try {
      if (find(b, "%PDF-", 0) != 0) return bad("missing %PDF- header")
      var nObjects = 0
      var nStreams = 0
      var nTextStreams = 0
      val texts = Seq.newBuilder[String]
      var p = 0
      var going = true
      while (going) {
        val objAt = find(b, " obj", p) // linear object scan, no xref needed
        if (objAt < 0) going = false
        else {
          nObjects += 1
          val objEnd = find(b, "endobj", objAt) match {
            case -1 => b.length
            case e => e
          }
          val streamKw = find(b, "stream", objAt)
          if (streamKw >= 0 && streamKw < objEnd) {
            nStreams += 1
            // data begins after the keyword's EOL (spec: CRLF or LF)
            var ds = streamKw + "stream".length
            if (ds < b.length && b(ds) == '\r') ds += 1
            if (ds < b.length && b(ds) == '\n') ds += 1
            val dict = new String(b, objAt, streamKw - objAt, "ISO-8859-1")
            val len = "/Length\\s+(\\d+)".r.findFirstMatchIn(dict).map(_.group(1).toInt)
            val de = len.map(l => math.min(ds + l, b.length))
              .filter(e => find(b, "endstream", e) >= 0 || find(b, "endstream", ds) < 0)
              .getOrElse(find(b, "endstream", ds) match {
                case -1 => objEnd
                case e => e
              })
            val raw = java.util.Arrays.copyOfRange(b, ds, math.max(de, ds))
            val data =
              if (dict.contains("/FlateDecode")) inflate(raw, 0, raw.length)
              else raw
            val t = streamText(data)
            if (t.nonEmpty) { nTextStreams += 1; texts += t }
          }
          p = math.max(objEnd, objAt + 4)
        }
      }
      if (nObjects == 0) return bad("no objects")
      val text = texts.result().mkString("\n")
      PdfDoc(fileId, nObjects, nStreams, nTextStreams, text, text.length.toLong,
        ok = true, err = "")
    } catch {
      case e: Exception =>
        bad(s"pdf: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}")
    }
  }

  object PdfDecoder extends Decoder[PdfDoc] {
    def decode(rows: Iterator[MediaRow]): Iterator[PdfDoc] =
      rows.map(r => parseFile(r.media_id, r.media))
  }

  /** One row per PDF file, byte-volume partitioned. */
  def extract(files: DataFrame, targetBytesPerPartition: Long = 128L << 20): DataFrame =
    Multimodal.decodeBatched(files, PdfDecoder, targetBytesPerPartition)(
      Encoders.product[PdfDoc]).toDF()

  /** Deterministic id-derived PDFs over the documents table — column
    * arithmetic both engines replay. Each doc becomes a 4-object PDF
    * (catalog → pages → page → UNCOMPRESSED content stream; the Flate
    * path is unit-covered with real Deflater round-trips) whose content
    * stream exercises `Tf`/`Td` positioning, `Tj`, a kerned two-segment
    * `TJ` carrying the doc text, the `'` next-line show, and on
    * schedules the escape table (`%3`) and hex strings (`%4`).
    *
    * Expected extraction (the oracle's string arithmetic):
    * `Title doc {id}\n{text}\nnext line {id%7}`
    * [`\nesc ( ) \ ok` on %3] [`\nABC` on %4].
    */
  def syntheticPdfFromDocuments(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val textA = substring(col("text"), 1, 10)
    val textB = substring(col("text"), 11, 1 << 24)
    val content = concat(
      lit("BT\n/F1 12 Tf\n72 720 Td\n(Title doc "), id.cast("string"),
      lit(") Tj\n0 -14 Td\n[("), textA, lit(") -250 ("), textB,
      lit(")] TJ\n(next line "), (id % 7).cast("string"), lit(") '\n"),
      when(id % 3 === 0, lit("0 -14 Td\n(esc \\( \\) \\\\ ok) Tj\n")).otherwise(lit("")),
      when(id % 4 === 0, lit("0 -14 Td\n<414243> Tj\n")).otherwise(lit("")),
      lit("ET"))
    val pdf = concat(
      lit("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"),
      lit("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"),
      lit("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"),
      lit("4 0 obj << /Length "), length(content).cast("string"),
      lit(" >> stream\n"), content, lit("\nendstream endobj\n"),
      lit("trailer << /Root 1 0 R >>\n%%EOF\n"))
    docs.select(id.as("media_id"), lit("pdf").as("kind"),
        encode(pdf, "UTF-8").as("media"))
      .withColumn("n_bytes", octet_length(col("media")).cast("long"))
  }
}
