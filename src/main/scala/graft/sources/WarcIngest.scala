package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.nio.charset.Charset
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.GZIPInputStream

import graft.operators.Multimodal
import graft.operators.Multimodal.{Decoder, MediaRow}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path => HadoopPath}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** WARC (ISO 28500) ingestion — the container format crawl corpora ship in
  * (Common Crawl et al.), i.e. the byte format the 100 TB story actually
  * starts from. The reader is a pure-JVM record parser run through
  * [[Multimodal.decodeBatched]]'s byte-volume partitioning: WARC files are
  * the indivisible work unit (gzip members abut with no sync marks usable
  * without an index), so files hash-spread across tasks sized by Σ bytes,
  * never by file count — a directory of one 10 GB file and ten thousand
  * 1 MB files schedules the same either way.
  *
  * The parse is STREAMING: records are consumed one at a time off the
  * (gunzipping) input stream, so task memory is bounded by the compressed
  * file (the source column) plus ONE record — never the decompressed
  * archive. Real .warc.gz shards are ~1 GiB compressed and 3-5 GiB
  * decompressed; the .warc.gz one-gzip-member-per-record layout exists
  * precisely so readers can stream, and `GZIPInputStream` consumes
  * concatenated members natively. A record above [[MaxRecordBytes]]
  * quarantines and is SKIPPED (its length is known, so the stream
  * resynchronizes at the next record) instead of sinking the file.
  *
  * Supported per the spec: WARC/1.0 and 1.1 version lines, case-insensitive
  * named fields, Content-Length-delimited blocks (binary-safe), per-record
  * or whole-file gzip (concatenated members — the standard .warc.gz
  * layout), HTTP response blocks (status line + headers + body) including
  * chunked transfer-encoding dechunking, `Content-Encoding` payload
  * decoding (gzip/x-gzip, deflate with the raw-zlib retry — crawl
  * captures store bodies as transmitted), and charset-aware body decoding
  * (BOM > HTTP `Content-Type` charset > HTML `<meta charset>` prescan >
  * ISO-8859-1 fallback — the WHATWG encoding-sniffing precedence).
  * Malformed records quarantine as `ok=false` rows with the error; a torn
  * tail never throws the task.
  */
object WarcIngest {

  /** One parsed record. `body` is the HTTP payload decoded per the sniffed
    * charset (recorded in `charset`) for `application/http` response
    * blocks, else the raw block as UTF-8; `payload_len` is its pre-decode
    * byte length (including any BOM).
    */
  case class WarcRecord(file_id: Long, rec_idx: Int, warc_type: String,
                        target_uri: String, record_id: String,
                        content_type: String, http_status: Int,
                        http_content_type: String, payload_len: Long,
                        body: String, charset: String, ok: Boolean, err: String)

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Hard cap on a single RECORD's block size (the streaming successor to
    * the r13 whole-file decompression cap). A record past the cap
    * quarantines loudly and is skipped by length — the rest of the file
    * still parses. 1 GiB: a JVM byte array tops out at ~2 GiB, and at
    * crawl scale a bigger single payload is a data bug, not a reason for
    * bigger heaps.
    */
  private[sources] val MaxRecordBytes: Long = 1L << 30

  /** Cap on one header LINE (WARC or HTTP). A "line" that long is not a
    * header, it's a binary block being misread — quarantine instead of
    * buffering it.
    */
  private[sources] val MaxHeaderLineBytes: Int = 1 << 20

  /** Malformed-framing signal inside the record loop; always caught and
    * turned into a quarantine row, never escapes the task.
    */
  private final class Malformed(val msg: String, val halt: Boolean)
    extends Exception(msg)

  /** Minimal buffered byte reader over an InputStream — the streaming
    * primitive the record loop consumes. Not java.io.BufferedInputStream:
    * per-byte reads there are synchronized, and we want readFully/skip
    * loops over the internal buffer.
    */
  private final class ByteReader(in: InputStream) {
    private val buf = new Array[Byte](64 << 10)
    private var len = 0
    private var pos = 0
    private def fill(): Boolean = {
      if (pos < len) return true
      len = in.read(buf); pos = 0
      len > 0
    }
    /** CRLF (or bare-LF, tolerated) terminated line; None at EOF. */
    def readLine(): Option[String] = {
      if (!fill()) return None
      val out = new java.io.ByteArrayOutputStream(96)
      var done = false
      while (!done) {
        if (!fill()) done = true // EOF terminates the last line
        else {
          var i = pos
          while (i < len && buf(i) != '\n') i += 1
          out.write(buf, pos, i - pos)
          if (out.size > MaxHeaderLineBytes)
            throw new Malformed("header line exceeds 1 MiB", halt = true)
          if (i < len) { pos = i + 1; done = true } else pos = i
        }
      }
      val b = out.toByteArray
      val e = if (b.nonEmpty && b(b.length - 1) == '\r') b.length - 1 else b.length
      Some(new String(b, 0, e, UTF_8))
    }
    /** Exactly n bytes, or None if the stream ends first. */
    def readFully(n: Int): Option[Array[Byte]] = {
      val dst = new Array[Byte](n)
      var off = 0
      while (off < n) {
        if (!fill()) return None
        val take = math.min(n - off, len - pos)
        System.arraycopy(buf, pos, dst, off, take)
        pos += take; off += take
      }
      Some(dst)
    }
    /** Discard exactly n bytes; false if the stream ends first. */
    def skipFully(n: Long): Boolean = {
      var left = n
      while (left > 0) {
        if (!fill()) return false
        val take = math.min(left, (len - pos).toLong).toInt
        pos += take; left -= take
      }
      true
    }
  }

  /** CRLF (or bare-LF) terminated line starting at `p` within an
    * already-materialized block; returns (line, next offset). None at end.
    */
  private def line(b: Array[Byte], p: Int): Option[(String, Int)] = {
    if (p >= b.length) return None
    var i = p
    while (i < b.length && b(i) != '\n') i += 1
    val end = if (i > p && b(i - 1) == '\r') i - 1 else i
    Some((new String(b, p, end - p, UTF_8), math.min(i + 1, b.length)))
  }

  /** Header lines from `p0` until the blank separator. `terminated` is
    * false when the block ran out before the blank line — an HTTP header
    * section that never ends is malformed framing, not an empty body.
    */
  private def headerBlock(b: Array[Byte], p0: Int): (Map[String, String], Int, Boolean) = {
    var p = p0
    val m = Map.newBuilder[String, String]
    var done = false
    var terminated = false
    while (!done) line(b, p) match {
      case Some((l, np)) if l.nonEmpty =>
        val i = l.indexOf(':')
        if (i > 0) m += l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim
        p = np
      case Some((_, np)) => p = np; done = true; terminated = true
      case None => done = true
    }
    (m.result(), p, terminated)
  }

  /** De-chunk an HTTP/1.1 chunked body: hex-size lines, each chunk
    * CRLF-terminated, a 0-size chunk ends the stream (trailers ignored).
    * Returns None on malformed framing (unparseable size line, a chunk
    * overrunning the Content-Length block, or input ending before the
    * 0-chunk terminator) — the caller quarantines; a silently-truncated
    * body must never flow downstream as ok=true.
    */
  private def dechunk(b: Array[Byte], p0: Int, end: Int): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(math.max(end - p0, 16))
    var p = p0
    while (true) line(b, p) match {
      case Some((sz, np)) if np <= end =>
        val n = try Integer.parseInt(sz.split(';')(0).trim, 16)
                catch { case _: NumberFormatException => -1 }
        if (n == 0) return Some(out.toByteArray) // terminator chunk
        if (n < 0 || np + n > end) return None   // malformed framing
        out.write(b, np, n)
        p = np + n
        // consume the chunk's trailing CRLF
        if (p + 1 < end && b(p) == '\r' && b(p + 1) == '\n') p += 2
        else if (p < end && b(p) == '\n') p += 1
      case _ => return None // ran out before the terminator
    }
    None // unreachable
  }

  private val CharsetParam =
    java.util.regex.Pattern.compile("(?i)charset\\s*=\\s*\"?([\\w.:+-]+)")
  private val MetaCharset =
    java.util.regex.Pattern.compile("(?i)<meta[^>]{0,512}?charset\\s*=\\s*['\"]?([\\w.:+-]+)")

  /** Resolve a charset label to a JVM Charset; unknown / unsupported
    * labels fall back to ISO-8859-1 (which decodes any byte sequence),
    * the same fallback as no label at all.
    */
  private def resolve(label: String): (Charset, String) =
    try { val cs = Charset.forName(label); (cs, cs.name.toLowerCase) }
    catch { case _: Exception => (ISO_8859_1, "iso-8859-1") }

  /** Charset-aware HTTP body decode, WHATWG sniffing precedence:
    * byte-order mark > transport-layer `Content-Type` charset parameter >
    * `<meta charset>` prescan of the first 1024 bytes > ISO-8859-1.
    * Returns (text, label); the label is the lowercase canonical name of
    * the charset actually used (the column value the oracle pins).
    */
  private[sources] def decodeBody(payload: Array[Byte], httpContentType: String): (String, String) = {
    val n = payload.length
    // 1. BOM wins over everything (it IS the document's first bytes)
    if (n >= 3 && (payload(0) & 0xff) == 0xef && (payload(1) & 0xff) == 0xbb &&
        (payload(2) & 0xff) == 0xbf)
      return (new String(payload, 3, n - 3, UTF_8), "utf-8")
    if (n >= 2 && (payload(0) & 0xff) == 0xfe && (payload(1) & 0xff) == 0xff)
      return (new String(payload, 2, n - 2, Charset.forName("UTF-16BE")), "utf-16be")
    if (n >= 2 && (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xfe)
      return (new String(payload, 2, n - 2, Charset.forName("UTF-16LE")), "utf-16le")
    // 2. transport layer
    val m = CharsetParam.matcher(httpContentType)
    if (m.find()) {
      val (cs, label) = resolve(m.group(1))
      return (new String(payload, cs), label)
    }
    // 3. in-document prescan (ASCII-superset assumption, per WHATWG): the
    // first 1024 bytes read as Latin-1 expose any <meta charset=...>
    val head = new String(payload, 0, math.min(1024, n), ISO_8859_1)
    val mm = MetaCharset.matcher(head)
    if (mm.find()) {
      val (cs, label) = resolve(mm.group(1))
      return (new String(payload, cs), label)
    }
    // 4. fallback: ISO-8859-1 never fails and round-trips bytes 1:1
    (new String(payload, ISO_8859_1), "iso-8859-1")
  }

  /** Decode an HTTP `Content-Encoding`d payload: gzip / x-gzip
    * (GZIPInputStream), deflate (zlib per RFC 9110 — with the
    * raw-deflate retry every browser applies, since real servers ship
    * both), identity/empty pass-through. Output is bounded by
    * [[MaxRecordBytes]]; corrupt compressed bodies and unknown codings
    * quarantine rather than flowing downstream as mojibake "text".
    */
  private[sources] def contentDecode(p: Array[Byte],
                                     encoding: String): Either[String, Array[Byte]] = {
    val enc = encoding.trim.toLowerCase
    // mk is BY-NAME: GZIPInputStream's constructor already reads (and
    // throws on) the member header, and that failure must land on this
    // record's quarantine lane, not escape as an IOException that
    // halts the whole file
    def drain(mk: => InputStream): Either[String, Array[Byte]] = {
      var in: InputStream = null
      try {
        in = mk
        val out = new java.io.ByteArrayOutputStream(math.min(p.length * 4, 1 << 20))
        val buf = new Array[Byte](64 << 10)
        var n = in.read(buf)
        while (n > 0) {
          out.write(buf, 0, n)
          if (out.size > MaxRecordBytes)
            return Left(s"content-encoding $enc: inflates past cap $MaxRecordBytes")
          n = in.read(buf)
        }
        Right(out.toByteArray)
      } catch {
        case e: Exception =>
          Left(s"content-encoding $enc: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}")
      } finally { if (in != null) { try in.close() catch { case _: Exception => } } }
    }
    enc match {
      case "" | "identity" => Right(p)
      case "gzip" | "x-gzip" =>
        if (p.isEmpty) Right(p)
        else drain(new GZIPInputStream(new ByteArrayInputStream(p), 64 << 10))
      case "deflate" =>
        if (p.isEmpty) Right(p)
        else drain(new java.util.zip.InflaterInputStream(
            new ByteArrayInputStream(p), new java.util.zip.Inflater(false), 64 << 10))
          .left.flatMap(_ => // raw-deflate servers: retry nowrap
            drain(new java.util.zip.InflaterInputStream(
              new ByteArrayInputStream(p), new java.util.zip.Inflater(true), 64 << 10)))
      case other => Left(s"content-encoding $other unsupported")
    }
  }

  /** Parse one record's already-materialized block (bounded: every scan
    * below is over this array alone, so a malformed HTTP section can never
    * read past the record's Content-Length framing).
    */
  private def parseBlock(fileId: Long, idx: Int, h: Map[String, String],
                         block: Array[Byte]): WarcRecord = {
    val ct = h.getOrElse("content-type", "")
    val isHttpResp = ct.replace(" ", "").toLowerCase.startsWith("application/http") &&
      h.getOrElse("warc-type", "") == "response"
    val parsed: Either[String, (Int, String, Array[Byte], String, String)] =
      if (isHttpResp) {
        val st = line(block, 0).map(_._1).getOrElse("")
        val code = st.split(" ").lift(1).flatMap(_.toIntOption).getOrElse(-1)
        val (hh, hp, terminated) = headerBlock(block, line(block, 0).map(_._2).getOrElse(0))
        if (!terminated) Left("unterminated HTTP headers")
        else {
          val chunked = hh.getOrElse("transfer-encoding", "").toLowerCase.contains("chunked")
          val httpCt = hh.getOrElse("content-type", "")
          val framed: Either[String, Array[Byte]] =
            if (chunked) dechunk(block, hp, block.length)
              .toRight("malformed chunked framing")
            else Right(java.util.Arrays.copyOfRange(block, hp, block.length))
          // real crawl captures store bodies AS TRANSMITTED, so
          // Content-Encoding survives into the archive — decode it
          // (after dechunking, per the HTTP layering) or downstream
          // text stages see compressed bytes as mojibake
          val payload = framed.flatMap(p =>
            contentDecode(p, hh.getOrElse("content-encoding", "")))
          payload.map { p =>
            val (text, cs) = decodeBody(p, httpCt)
            (code, httpCt, p, text, cs)
          }
        }
      } else Right((-1, "", block, new String(block, UTF_8), "utf-8"))
    parsed match {
      case Right((status, httpCt, payload, text, cs)) =>
        WarcRecord(fileId, idx,
          h.getOrElse("warc-type", ""), h.getOrElse("warc-target-uri", ""),
          h.getOrElse("warc-record-id", ""), ct, status, httpCt,
          payload.length.toLong, text, cs, ok = true, err = "")
      case Left(msg) =>
        WarcRecord(fileId, idx, "", "", "", "", -1, "", -1L, "", "",
          ok = false, err = msg)
    }
  }

  /** Streaming record iterator over an open byte stream: each `next()`
    * consumes exactly one record off the reader. Heap held at any moment
    * is one record block (≤ maxRecordBytes) — never the whole archive.
    * Framing errors quarantine; errors that lose synchronization
    * (negative / missing Content-Length, truncation, a non-WARC line,
    * gzip corruption) also halt the file, while bounded ones (oversized
    * record — skippable by length; a malformed HTTP section inside an
    * intact block) let the next record parse.
    */
  private[graft] def parseRecords(fileId: Long, in: InputStream,
                                  maxRecordBytes: Long = MaxRecordBytes): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private val reader = new ByteReader(in)
      private var idx = 0
      private var halted = false
      private var pending: WarcRecord = _

      private def quarantine(msg: String): WarcRecord =
        WarcRecord(fileId, idx, "", "", "", "", -1, "", -1L, "", "",
          ok = false, err = msg)

      /** Read WARC headers until the blank separator; EOF first is a torn
        * record.
        */
      private def readWarcHeaders(): Map[String, String] = {
        val m = Map.newBuilder[String, String]
        var going = true
        while (going) reader.readLine() match {
          case Some(l) if l.nonEmpty =>
            val i = l.indexOf(':')
            if (i > 0) m += l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim
          case Some(_) => going = false
          case None => throw new Malformed("truncated record headers", halt = true)
        }
        m.result()
      }

      private def advance(): WarcRecord = {
        while (!halted) {
          val made: Option[WarcRecord] =
            try {
              reader.readLine() match {
                case None => halted = true; None // clean EOF
                case Some(l) if l.isEmpty => None // inter-record padding
                case Some(ver) if ver.startsWith("WARC/") =>
                  val h = readWarcHeaders()
                  h.get("content-length").flatMap(_.toLongOption) match {
                    case None =>
                      throw new Malformed("missing Content-Length", halt = true)
                    case Some(len) if len < 0 =>
                      // "-5".toLongOption parses; a negative length makes
                      // the framing unknowable — quarantine, stop the file
                      throw new Malformed(s"negative Content-Length: $len", halt = true)
                    case Some(len) if len > maxRecordBytes =>
                      // length known → skippable: the file keeps parsing
                      if (!reader.skipFully(len))
                        throw new Malformed(s"truncated block: need $len bytes", halt = true)
                      throw new Malformed(
                        s"record block $len bytes exceeds cap $maxRecordBytes", halt = false)
                    case Some(len) =>
                      reader.readFully(len.toInt) match {
                        case None =>
                          throw new Malformed(s"truncated block: need $len bytes", halt = true)
                        case Some(block) => Some(parseBlock(fileId, idx, h, block))
                      }
                  }
                case Some(other) =>
                  throw new Malformed(
                    s"expected WARC/ version line, got '${other.take(40)}'", halt = true)
              }
            } catch {
              case e: Malformed =>
                halted = halted || e.halt
                val r = quarantine(e.msg); idx += 1
                return r
              case e: java.io.IOException => // gzip corruption / short stream
                halted = true
                val r = quarantine(s"gzip: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}")
                idx += 1
                return r
            }
          made match {
            case Some(r) => idx += 1; return r
            case None => // padding line or EOF: loop
          }
        }
        null
      }

      def hasNext: Boolean = {
        if (pending == null) pending = advance()
        pending != null
      }
      def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException("warc records")
        val r = pending; pending = null; r
      }
    }

  /** Lazy record iterator over one stored file's (possibly gzipped)
    * bytes. The compressed source column is the only whole-file
    * allocation; decompression streams through [[parseRecords]] one
    * record at a time, so a 1 GiB-compressed / 5 GiB-decompressed crawl
    * shard parses in record-sized heap.
    */
  private[graft] def parseStream(fileId: Long, raw: Array[Byte],
                                 maxRecordBytes: Long = MaxRecordBytes): Iterator[WarcRecord] = {
    val in: InputStream =
      try {
        if (isGzip(raw)) new GZIPInputStream(new ByteArrayInputStream(raw), 64 << 10)
        else new ByteArrayInputStream(raw)
      } catch {
        case e: Exception => // corrupt gzip header at construction
          return Iterator.single(WarcRecord(fileId, 0, "", "", "", "", -1, "",
            -1L, "", "", ok = false,
            err = s"gzip: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}"))
      }
    parseRecords(fileId, in, maxRecordBytes)
  }

  /** Parse every record of one WARC file (materialized convenience over
    * [[parseStream]] — tests and small callers; the distributed path
    * stays lazy).
    */
  private[graft] def parseFile(fileId: Long, raw: Array[Byte]): Seq[WarcRecord] =
    parseStream(fileId, raw).toVector

  object WarcDecoder extends Decoder[WarcRecord] {
    def decode(rows: Iterator[MediaRow]): Iterator[WarcRecord] =
      rows.flatMap(r => parseStream(r.media_id, r.media))
  }

  /** Parse a frame of WARC files — (media_id, kind, media, n_bytes) as
    * produced by [[readFiles]] or [[syntheticWarcFromDocuments]] — into one
    * row per record, byte-volume partitioned.
    */
  def records(files: DataFrame, targetBytesPerPartition: Long = 128L << 20): DataFrame =
    Multimodal.decodeBatched(files, WarcDecoder, targetBytesPerPartition)(
      Encoders.product[WarcRecord]).toDF()

  /** WARC files from disk via the binaryFile source. `media_id` is the
    * path hash; the (media_id → kind) column carries the path for
    * join-back, so no driver-side file listing beyond the scan's own.
    * The COMPRESSED file rides as one binary column value (binaryFile's
    * JVM-array bound is ~2 GiB — Common Crawl's ~1 GiB-compressed shard
    * convention fits); decompression then streams record-at-a-time, so
    * that column is the task's only whole-file allocation. Kept for
    * frame-shaped composition (join-back on media_id etc.); prefer
    * [[readRecordsStreamed]] when the goal is records — it never
    * materializes the file at all and has no size ceiling.
    */
  def readFiles(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)
      .select(xxhash64(col("path")).as("media_id"),
        col("path").as("kind"),
        col("content").as("media"),
        col("length").as("n_bytes"))

  /** One record of [[readRecordsStreamed]] — [[WarcRecord]] plus the
    * source file's fully-qualified path (`file_id` is `xxhash64(path)`
    * with Spark's default seed, so ids line up with a
    * `xxhash64(col("path"))` join key computed anywhere else).
    */
  case class StreamedWarcRecord(path: String, file_id: Long, rec_idx: Int,
                                warc_type: String, target_uri: String,
                                record_id: String, content_type: String,
                                http_status: Int, http_content_type: String,
                                payload_len: Long, body: String,
                                charset: String, ok: Boolean, err: String)

  /** Hadoop `Configuration` is not `Serializable`; this is the standard
    * `write`/`readFields` wrapper so tasks can open `FileSystem` streams
    * with the driver's configuration (credentials, fs.defaultFS, etc.).
    */
  private final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new Configuration(false); value.readFields(in)
    }
  }

  /** Task-side record iterator over ONE file path: `FileSystem.open` →
    * gzip sniff → [[parseRecords]] straight off the stream. Heap held at
    * any moment is the 64 KiB read buffer plus ONE record block — the
    * file is NEVER materialized, compressed or decompressed, so archive
    * size is unbounded (no `binaryFile` 2 GiB ceiling). The stream closes
    * on iterator exhaustion and again on task completion (whichever
    * comes first — a downstream `limit` can abandon the iterator early).
    * An unopenable path quarantines as a single `ok=false` row rather
    * than failing the task: at 100 TB a file deleted between listing and
    * read is routine, not fatal.
    */
  private[graft] def parsePath(conf: Configuration, path: String,
                               maxRecordBytes: Long = MaxRecordBytes): Iterator[WarcRecord] = {
    val fileId = XXH64.hashUTF8String(UTF8String.fromString(path), 42L)
    def msg(e: Exception) = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
    def lone(err: String) = Iterator.single(WarcRecord(fileId, 0, "", "", "",
      "", -1, "", -1L, "", "", ok = false, err = err))
    val raw: InputStream =
      try { val hp = new HadoopPath(path); hp.getFileSystem(conf).open(hp) }
      catch { case e: Exception => return lone(s"open: ${msg(e)}") }
    val in: InputStream =
      try {
        val pb = new java.io.PushbackInputStream(raw, 2)
        val head = new Array[Byte](2)
        // InputStream.read may SHORT-read even mid-stream (network FS
        // first-byte reads do) — loop to 2 bytes or EOF, or the sniff
        // would misread a gzip file as plain
        var n = 0
        var r = 0
        while (n < 2 && { r = pb.read(head, n, 2 - n); r > 0 }) n += r
        if (n > 0) pb.unread(head, 0, n)
        // GZIPInputStream reads and validates the member header here, so
        // a corrupt header quarantines on the gzip lane, not "open"
        if (n == 2 && isGzip(head)) new GZIPInputStream(pb, 64 << 10) else pb
      } catch {
        case e: Exception =>
          try raw.close() catch { case _: Exception => }
          return lone(s"gzip: ${msg(e)}")
      }
    Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
      try in.close() catch { case _: Exception => }
    })
    val it = parseRecords(fileId, in, maxRecordBytes)
    new Iterator[WarcRecord] {
      private var closed = false
      def hasNext: Boolean = {
        val h = it.hasNext
        if (!h && !closed) { closed = true; try in.close() catch { case _: Exception => } }
        h
      }
      def next(): WarcRecord = it.next()
    }
  }

  /** Longest-processing-time bin-pack of (path, bytes, hosts) files
    * into partitions: bin count = max(⌈Σ/target⌉, parallelism floor)
    * capped at the file count, files sorted size-descending, each
    * assigned to the least-loaded bin via a heap — O(n log n) over the
    * LISTING (the r15 self-review replaced first-fit's O(n·bins) scan,
    * which goes quadratic on a 100k-shard listing). Every bin lands
    * ≈ Σ/bins ≤ target; a file larger than that is indivisible and
    * dominates its bin under any scheme. Deterministic: ties break on
    * bin index. Per-bin hosts are the union of member files' block
    * hosts (locality hints for `makeRDD`; empty on object stores,
    * harmless locally).
    */
  private[graft] def planBins(files: Seq[(String, Long, Seq[String])],
                                target: Long, parallelism: Int): Seq[(Seq[String], Seq[String])] = {
    if (files.isEmpty) return Nil
    val total = files.map(_._2).sum
    val byTarget = (total + math.max(target, 1L) - 1) / math.max(target, 1L)
    val nBins = math.min(files.size.toLong,
      math.max(byTarget, math.min(parallelism.toLong, files.size.toLong))).toInt
    val sorted = files.sortBy(f => (-f._2, f._1))
    val paths = Array.fill(nBins)(scala.collection.mutable.ArrayBuffer.empty[String])
    val hosts = Array.fill(nBins)(scala.collection.mutable.LinkedHashSet.empty[String])
    // min-heap of (load, binIdx): Ordering reversed for PriorityQueue
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Int)](
      Ordering.Tuple2[Long, Int].reverse)
    for (i <- 0 until nBins) heap.enqueue((0L, i))
    for ((p, len, hs) <- sorted) {
      val (load, i) = heap.dequeue()
      paths(i) += p; hosts(i) ++= hs
      heap.enqueue((load + len, i))
    }
    paths.indices.map(i => (paths(i).toSeq, hosts(i).toSeq))
  }

  /** WARC records from disk with task heap bounded by ONE RECORD — the
    * scale successor to [[readFiles]]+[[records]] (which materializes
    * each COMPRESSED file as one `binaryFile` byte array, capping
    * archives at 2 GiB and task heap at ~file size). Here the driver
    * lists the glob (names and sizes only), bin-packs files into
    * partitions by COMPRESSED byte volume via [[planBins]] (sizes are
    * free from the listing — no sizing job), and each task opens its
    * files one at a time with `FileSystem.open`, feeding the gunzipping
    * stream straight through [[parseRecords]]. A 50 GiB archive ingests
    * in the same task heap as a 50 MiB one. Block-location hints ride
    * `makeRDD`'s preferred-locations seq, so on HDFS-like stores tasks
    * land data-local; on object stores the hint list is empty.
    */
  def readRecordsStreamed(spark: SparkSession, pathGlob: String,
                          targetBytesPerPartition: Long = 512L << 20,
                          maxRecordBytes: Long = MaxRecordBytes): DataFrame = {
    val sc = spark.sparkContext
    val hconf = sc.hadoopConfiguration
    val glob = new HadoopPath(pathGlob)
    val fs = glob.getFileSystem(hconf)
    val statuses: Array[FileStatus] =
      Option(fs.globStatus(glob)).getOrElse(Array.empty[FileStatus])
        .flatMap(st =>
          if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile)
          else if (st.isFile) Array(st) else Array.empty[FileStatus])
    val enc = Encoders.product[StreamedWarcRecord]
    if (statuses.isEmpty) return spark.emptyDataset(enc).toDF()
    val files = statuses.map { st =>
      val hs = try fs.getFileBlockLocations(st, 0L, st.getLen)
          .flatMap(_.getHosts).distinct.toSeq
        catch { case _: Exception => Seq.empty[String] }
      (st.getPath.toString, st.getLen, hs)
    }.toSeq
    val bins = planBins(files, targetBytesPerPartition, sc.defaultParallelism)
    val bcConf = sc.broadcast(new SerializableHadoopConf(hconf))
    val cap = maxRecordBytes
    val rdd = sc.makeRDD(bins).flatMap { paths =>
      paths.iterator.flatMap { p =>
        parsePath(bcConf.value.value, p, cap).map(r =>
          StreamedWarcRecord(p, r.file_id, r.rec_idx, r.warc_type,
            r.target_uri, r.record_id, r.content_type, r.http_status,
            r.http_content_type, r.payload_len, r.body, r.charset, r.ok, r.err))
      }
    }
    spark.createDataset(rdd)(enc).toDF()
  }

  /** Write an extraction frame as WET — WARC `conversion` records
    * (ISO 28500 §6.8), the interchange format Common Crawl publishes
    * extracted text in and downstream pipelines actually consume. Each
    * row becomes one record (CRLF framing, byte-exact Content-Length
    * over the UTF-8 payload); files land gzip-compressed through
    * Spark's distributed text sink, so the writer scales like any other
    * write (`nFiles` shapes output parallelism; 0 keeps the input
    * partitioning). `date` is caller-fixed rather than wall-clock —
    * deterministic output is worth more to a pipeline than a timestamp,
    * and re-runs byte-match. Round-trip contract: [[records]] /
    * [[readRecordsStreamed]] re-read the written WET to exactly the
    * input frame (pinned by `q_wet_roundtrip` and WarcIngestSpec).
    */
  def writeWet(docs: DataFrame, dir: String, nFiles: Int = 0,
               date: String = "2025-01-01T00:00:00Z",
               idCol: String = "doc_id", urlCol: String = "url",
               textCol: String = "text"): Unit = {
    val payload = encode(col(textCol), "UTF-8")
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Record-ID: <urn:graft:doc:"),
      col(idCol).cast("string"),
      lit(">\r\nWARC-Target-URI: "), col(urlCol),
      lit(s"\r\nWARC-Date: $date"),
      lit("\r\nContent-Type: text/plain\r\nContent-Length: "),
      octet_length(payload).cast("string"),
      lit("\r\n\r\n"), col(textCol), lit("\r\n"))
    val out = docs.select(rec.as("value"))
    val shaped = if (nFiles > 0) out.repartition(nFiles) else out
    shaped.write.mode("overwrite").option("compression", "gzip").text(dir)
  }

  /** CDX capture index over a parsed-records frame — the third Common
    * Crawl artifact beside WARC and WET: one row per response record,
    * keyed by the [[graft.operators.UrlOps.surt]] of its target URI so
    * a byte sort clusters same-site captures. `length` is the payload
    * byte count; `(file_id, rec_idx)` is the capture's address in the
    * archive (this engine's record identity — the role byte offsets
    * play in classic CDX).
    */
  def cdxIndex(records: DataFrame): DataFrame =
    records.filter(col("ok"))
      .select(graft.operators.UrlOps.surt(col("target_uri")).as("surt"),
        col("target_uri").as("url"),
        col("http_status").cast("long").as("status"),
        regexp_extract(col("http_content_type"), "^([^;]*)", 1).as("mime"),
        col("payload_len").as("length"),
        col("file_id"), col("rec_idx").cast("long").as("rec_idx"))

  /** Write [[cdxIndex]] rows as CDXJ lines (`surt timestamp {json}`)
    * GLOBALLY sorted: range-partitioned by the SURT key then sorted
    * within partitions, so file k's every line precedes file k+1's —
    * the layout that lets an index consumer binary-search a shard list.
    * `ts` is caller-fixed (14-digit CDX convention) for deterministic
    * re-runs.
    */
  /** Escape `\` then `"` for embedding a string column in concatenated
    * JSON: captured crawl URIs and Content-Type values routinely carry
    * both (r15 ADVICE — unescaped they produce invalid JSON lines that
    * from_json silently nulls on re-read). Order matters: backslash
    * first, or the escape characters themselves get re-escaped.
    */
  private def jsonEsc(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    replace(replace(c, lit("\\"), lit("\\\\")), lit("\""), lit("\\\""))

  def writeCdxj(records: DataFrame, dir: String, nFiles: Int = 8,
                ts: String = "20250101000000"): Unit = {
    val line = concat(col("surt"), lit(s" $ts "),
      lit("{\"url\":\""), jsonEsc(col("url")),
      lit("\",\"status\":\""), col("status").cast("string"),
      lit("\",\"mime\":\""), jsonEsc(col("mime")),
      lit("\",\"length\":\""), col("length").cast("string"),
      lit("\",\"file\":\""), col("file_id").cast("string"),
      lit("\",\"idx\":\""), col("rec_idx").cast("string"), lit("\"}"))
    cdxIndex(records)
      .repartitionByRange(math.max(nFiles, 1), col("surt"), col("url"), col("rec_idx"))
      .sortWithinPartitions("surt", "url", "rec_idx")
      .select(line.as("value"))
      .write.mode("overwrite").option("compression", "gzip").text(dir)
  }

  /** Write a parsed-records frame as WAT — WARC `metadata` records
    * whose JSON payload describes each response (the Common Crawl
    * metadata sidecar): target URI + type under `WARC-Header-Metadata`,
    * payload length / HTTP status / Content-Type under
    * `Payload-Metadata`. The JSON is built by explicit concatenation
    * (fixed key order — byte-deterministic re-runs, and the round-trip
    * oracle can replay it). Same distributed gzip text sink as
    * [[writeWet]].
    */
  def writeWat(records: DataFrame, dir: String, nFiles: Int = 0,
               date: String = "2025-01-01T00:00:00Z"): Unit = {
    val body = concat(
      lit("{\"Envelope\":{\"WARC-Header-Metadata\":{\"WARC-Target-URI\":\""),
      jsonEsc(col("target_uri")), lit("\",\"WARC-Type\":\""), jsonEsc(col("warc_type")),
      lit("\"},\"Payload-Metadata\":{\"Actual-Content-Length\":"),
      col("payload_len").cast("string"),
      lit(",\"HTTP-Response-Metadata\":{\"Response-Message\":{\"Status\":"),
      col("http_status").cast("string"),
      lit("},\"Headers\":{\"Content-Type\":\""), jsonEsc(col("http_content_type")),
      lit("\"}}}}}"))
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Record-ID: <urn:graft:wat:"),
      col("file_id").cast("string"), lit(":"), col("rec_idx").cast("string"),
      lit(">\r\nWARC-Target-URI: "), col("target_uri"),
      lit(s"\r\nWARC-Date: $date"),
      lit("\r\nContent-Type: application/json\r\nContent-Length: "),
      octet_length(body).cast("string"),
      lit("\r\n\r\n"), body, lit("\r\n"))
    val out = records.filter(col("ok")).select(rec.as("value"))
    val shaped = if (nFiles > 0) out.repartition(nFiles) else out
    shaped.write.mode("overwrite").option("compression", "gzip").text(dir)
  }

  /** Deterministic id-derived WARC files over the documents table (the
    * [[Multimodal]] synthetic-fixture pattern): each doc becomes one HTTP
    * response record whose body is a small HTML page wrapping the doc
    * text; `perFile` consecutive docs concatenate into one file. Records
    * on the `doc_id % 5 == 0` schedule ship chunked transfer-encoding so
    * the dechunker is exercised under the oracle. All column arithmetic —
    * the DuckDB oracle replays the expected parse output directly from
    * `documents`.
    */
  def syntheticWarcFromDocuments(docs: DataFrame, perFile: Int = 4): DataFrame = {
    val id = col("doc_id")
    // a caller-supplied url column becomes the Target-URI (the crawl
    // pipeline fixture routes UrlOps.syntheticUrls through here)
    val uri = if (docs.columns.contains("url")) col("url")
      else concat(lit("https://example.com/doc/"), id.cast("string"))
    val page = concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>"))
    val chunked = id % 5 === 0
    // chunked framing: 16-byte chunks ("10\r\n" + bytes + "\r\n"), then the
    // remainder chunk, then the "0" terminator. Corpus text is ASCII, so
    // substring (chars) == bytes and hex sizes stay 2-digit.
    val bodyLen = octet_length(page)
    val nFull = floor(bodyLen / 16).cast("int")
    val rem = bodyLen % 16
    val chunkedBody = concat(
      array_join(transform(sequence(lit(0), nFull - 1),
        i => concat(lit("10\r\n"), substring(page, i * 16 + 1, lit(16)), lit("\r\n"))), ""),
      when(rem > 0, concat(lower(hex(rem)), lit("\r\n"),
        substring(page, nFull * 16 + 1, lit(16)), lit("\r\n"))).otherwise(lit("")),
      lit("0\r\n\r\n"))
    val httpHead = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"),
      when(chunked, lit("Transfer-Encoding: chunked\r\n")).otherwise(lit("")),
      lit("\r\n"))
    val http = concat(httpHead, when(chunked, chunkedBody).otherwise(page))
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:doc:"),
      id.cast("string"),
      lit(">\r\nWARC-Target-URI: "), uri,
      lit("\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
      octet_length(http).cast("string"), lit("\r\n\r\n"), http, lit("\r\n\r\n"))
    docs.select(floor(id / perFile).cast("long").as("media_id"),
        id.as("ord"), rec.as("rec"))
      .groupBy("media_id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("ord"), col("rec")))),
        e => e.getField("rec")), "").as("text_file"))
      .select(col("media_id"), lit("warc").as("kind"),
        encode(col("text_file"), "UTF-8").as("media"))
      .withColumn("n_bytes", octet_length(col("media")).cast("long"))
  }

  /** Charset-sniffing fixture: id-derived WARC response records whose
    * bodies carry non-UTF-8 encodings, cycling five variants on
    * `doc_id % 5`:
    *
    *   0 — `charset=utf-8` in the HTTP header (the r13 baseline shape);
    *   1 — `charset=windows-1252`, body wrapped in C1-range 0x93/0x94
    *       (→ U+201C/U+201D — bytes where 1252 DIFFERS from Latin-1, so
    *       the row proves real 1252 decoding, not the fallback);
    *   2 — `charset=shift_jis`, body prefixed with 0x93 0xFA (→ U+65E5
    *       日, a lead/trail pair — proves multi-byte decode);
    *   3 — NO transport charset; `<meta charset="windows-1252">` inside
    *       the page plus a 0x93 byte — proves the in-document prescan;
    *   4 — UTF-8 BOM prefix while the header CLAIMS iso-8859-1 — proves
    *       BOM precedence (a Latin-1 decode would leak "ï»¿" into text).
    *
    * The whole file string is encoded ISO-8859-1 (all chars ≤ U+00FF map
    * 1:1 to bytes, so the planted `chr(0x93)`-style code points become
    * the exact raw bytes) and Content-Length counts CHARS == bytes under
    * that encoding. Corpus text is ASCII, identical in every charset
    * involved. The DuckDB oracle replays the expected decoded text with
    * plain Unicode literals.
    */
  def syntheticCharsetWarc(docs: DataFrame, perFile: Int = 4): DataFrame = {
    val id = col("doc_id")
    val v = id % 5
    val c93 = lit("\u0093"); val c94 = lit("\u0094")
    val cFA = lit("\u00fa"); val bom = lit("\u00ef\u00bb\u00bf")
    val page = concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>"))
    val metaPage = concat(lit("<html><head><meta charset=\"windows-1252\"></head><body><p>"),
      c93, col("text"), lit("</p></body></html>"))
    val body =
      when(v === 1, concat(c93, page, c94))
        .when(v === 2, concat(c93, cFA, page))
        .when(v === 3, metaPage)
        .when(v === 4, concat(bom, page))
        .otherwise(page)
    val ctHeader =
      when(v === 1, lit("text/html; charset=windows-1252"))
        .when(v === 2, lit("text/html; charset=shift_jis"))
        .when(v === 3, lit("text/html"))
        .when(v === 4, lit("text/html; charset=iso-8859-1"))
        .otherwise(lit("text/html; charset=utf-8"))
    val http = concat(lit("HTTP/1.1 200 OK\r\nContent-Type: "), ctHeader,
      lit("\r\n\r\n"), body)
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:doc:"),
      id.cast("string"),
      lit(">\r\nWARC-Target-URI: https://example.com/doc/"), id.cast("string"),
      lit("\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
      length(http).cast("string"), lit("\r\n\r\n"), http, lit("\r\n\r\n"))
    docs.select(floor(id / perFile).cast("long").as("media_id"),
        id.as("ord"), rec.as("rec"))
      .groupBy("media_id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("ord"), col("rec")))),
        e => e.getField("rec")), "").as("text_file"))
      .select(col("media_id"), lit("warc").as("kind"),
        encode(col("text_file"), "ISO-8859-1").as("media"))
      .withColumn("n_bytes", octet_length(col("media")).cast("long"))
  }
}
