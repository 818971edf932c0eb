package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPInputStream

import graft.operators.Multimodal
import graft.operators.Multimodal.{Decoder, MediaRow}
import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) ingestion — the container format crawl corpora ship in
  * (Common Crawl et al.), i.e. the byte format the 100 TB story actually
  * starts from. The reader is a pure-JVM record parser run through
  * [[Multimodal.decodeBatched]]'s byte-volume partitioning: WARC files are
  * the indivisible work unit (gzip members abut with no sync marks usable
  * without an index), so files hash-spread across tasks sized by Σ bytes,
  * never by file count — a directory of one 10 GB file and ten thousand
  * 1 MB files schedules the same either way.
  *
  * Supported per the spec: WARC/1.0 and 1.1 version lines, case-insensitive
  * named fields, Content-Length-delimited blocks (binary-safe), per-record
  * or whole-file gzip (concatenated members — the standard .warc.gz
  * layout), HTTP response blocks (status line + headers + body) including
  * chunked transfer-encoding dechunking. Malformed records quarantine as
  * `ok=false` rows with the error; a torn tail never throws the task.
  */
object WarcIngest {

  /** One parsed record. `body` is the HTTP payload decoded as UTF-8 for
    * `application/http` response blocks, else the raw block; `payload_len`
    * is its pre-decode byte length.
    */
  case class WarcRecord(file_id: Long, rec_idx: Int, warc_type: String,
                        target_uri: String, record_id: String,
                        content_type: String, http_status: Int,
                        http_content_type: String, payload_len: Long,
                        body: String, ok: Boolean, err: String)

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Hard cap on a file's decompressed size. A JVM byte array tops out
    * at ~2 GiB anyway; past the cap the file quarantines LOUDLY instead
    * of dying on an uncatchable OutOfMemoryError mid-grow — at crawl
    * scale the fix for bigger archives is smaller files, not bigger
    * heaps. (Real .warc.gz shards are ~1 GiB compressed and well under
    * this decompressed per-file.)
    */
  private[sources] val MaxGunzipBytes: Long = 1L << 30

  private def gunzipAll(b: Array[Byte]): Array[Byte] = {
    // GZIPInputStream consumes concatenated members (the .warc.gz layout:
    // one member per record) into one logical stream; records stay
    // self-delimiting via Content-Length, so member boundaries are noise.
    // The initial buffer sizing must stay in Int range (b.length * 4
    // overflows for inputs past 512 MB).
    val in = new GZIPInputStream(new ByteArrayInputStream(b), 64 << 10)
    val out = new java.io.ByteArrayOutputStream(
      math.min(b.length.toLong * 4, 16L << 20).toInt)
    val buf = new Array[Byte](64 << 10)
    var total = 0L
    var n = in.read(buf)
    while (n >= 0) {
      total += n
      if (total > MaxGunzipBytes)
        throw new java.util.zip.ZipException(
          s"decompressed size exceeds $MaxGunzipBytes bytes")
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }

  /** CRLF (or bare-LF, tolerated) terminated line starting at `p`; returns
    * (line-without-terminator, next offset). None at end of input.
    */
  private def line(b: Array[Byte], p: Int): Option[(String, Int)] = {
    if (p >= b.length) return None
    var i = p
    while (i < b.length && b(i) != '\n') i += 1
    val end = if (i > p && b(i - 1) == '\r') i - 1 else i
    Some((new String(b, p, end - p, UTF_8), math.min(i + 1, b.length)))
  }

  private def headerBlock(b: Array[Byte], p0: Int): (Map[String, String], Int) = {
    var p = p0
    val m = Map.newBuilder[String, String]
    var done = false
    while (!done) line(b, p) match {
      case Some((l, np)) if l.nonEmpty =>
        val i = l.indexOf(':')
        if (i > 0) m += l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim
        p = np
      case Some((_, np)) => p = np; done = true
      case None => done = true
    }
    (m.result(), p)
  }

  /** De-chunk an HTTP/1.1 chunked body: hex-size lines, each chunk
    * CRLF-terminated, a 0-size chunk ends the stream (trailers ignored).
    * Returns None on malformed framing (unparseable size line, a chunk
    * overrunning the Content-Length block, or input ending before the
    * 0-chunk terminator) — the caller quarantines; a silently-truncated
    * body must never flow downstream as ok=true.
    */
  private def dechunk(b: Array[Byte], p0: Int, end: Int): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(end - p0)
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

  /** Parse every record of one (decompressed-if-needed) WARC file. */
  private[graft] def parseFile(fileId: Long, raw: Array[Byte]): Seq[WarcRecord] = {
    def quarantine(idx: Int, msg: String) =
      WarcRecord(fileId, idx, "", "", "", "", -1, "", -1L, "", ok = false, err = msg)
    val b =
      try { if (isGzip(raw)) gunzipAll(raw) else raw }
      catch { case e: Exception => return Seq(quarantine(0, s"gzip: ${e.getMessage}")) }
    val out = Seq.newBuilder[WarcRecord]
    var idx = 0
    var p = 0
    var halted = false
    while (!halted && p < b.length) {
      // tolerate blank padding between records
      line(b, p) match {
        case Some((l, np)) if l.isEmpty => p = np
        case Some((ver, np)) if ver.startsWith("WARC/") =>
          val (h, bp) = headerBlock(b, np)
          h.get("content-length").flatMap(_.toLongOption) match {
            case None =>
              out += quarantine(idx, "missing Content-Length"); halted = true
            case Some(len) if bp + len > b.length =>
              out += quarantine(idx, s"truncated block: need $len bytes"); halted = true
            case Some(len) =>
              val blockEnd = bp + len.toInt
              val ct = h.getOrElse("content-type", "")
              val isHttpResp = ct.replace(" ", "").toLowerCase
                .startsWith("application/http") &&
                h.getOrElse("warc-type", "") == "response"
              val parsed: Either[String, (Int, String, Array[Byte])] =
                if (isHttpResp) {
                  val st = line(b, bp).map(_._1).getOrElse("")
                  val code = st.split(" ").lift(1).flatMap(_.toIntOption).getOrElse(-1)
                  val (hh, hp) = headerBlock(b, line(b, bp).map(_._2).getOrElse(bp))
                  val chunked = hh.getOrElse("transfer-encoding", "")
                    .toLowerCase.contains("chunked")
                  if (chunked) dechunk(b, hp, blockEnd) match {
                    case Some(body) => Right((code, hh.getOrElse("content-type", ""), body))
                    case None => Left("malformed chunked framing")
                  }
                  else Right((code, hh.getOrElse("content-type", ""),
                    java.util.Arrays.copyOfRange(b, hp, blockEnd)))
                } else Right((-1, "", java.util.Arrays.copyOfRange(b, bp, blockEnd)))
              parsed match {
                case Right((status, httpCt, payload)) =>
                  out += WarcRecord(fileId, idx,
                    h.getOrElse("warc-type", ""), h.getOrElse("warc-target-uri", ""),
                    h.getOrElse("warc-record-id", ""), ct, status, httpCt,
                    payload.length.toLong, new String(payload, UTF_8),
                    ok = true, err = "")
                case Left(msg) => out += quarantine(idx, msg)
              }
              idx += 1
              p = blockEnd
          }
        case Some((other, _)) =>
          out += quarantine(idx, s"expected WARC/ version line, got '${other.take(40)}'")
          halted = true
        case None => halted = true
      }
    }
    out.result()
  }

  object WarcDecoder extends Decoder[WarcRecord] {
    def decode(rows: Iterator[MediaRow]): Iterator[WarcRecord] =
      rows.flatMap(r => parseFile(r.media_id, r.media))
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
    */
  def readFiles(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)
      .select(xxhash64(col("path")).as("media_id"),
        col("path").as("kind"),
        col("content").as("media"),
        col("length").as("n_bytes"))

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
}
