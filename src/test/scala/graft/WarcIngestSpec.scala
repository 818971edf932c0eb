package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import graft.sources.WarcIngest
import org.apache.spark.sql.functions._

class WarcIngestSpec extends SparkSuite {
  import spark.implicits._

  private def record(id: Int, body: String, typ: String = "response",
                     extra: String = ""): Array[Byte] = {
    val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n$extra\r\n$body"
    val block = if (typ == "response") http else body
    val ct = if (typ == "response") "application/http; msgtype=response" else "text/plain"
    (s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Record-ID: <urn:t:$id>\r\n" +
      s"WARC-Target-URI: https://t/$id\r\nContent-Type: $ct\r\n" +
      s"Content-Length: ${block.getBytes(UTF_8).length}\r\n\r\n$block\r\n\r\n")
      .getBytes(UTF_8)
  }

  private def gzipMember(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  test("plain multi-record file: framing, headers, http parse") {
    val f = record(1, "hello") ++ record(2, "world", typ = "metadata")
    val recs = WarcIngest.parseFile(7L, f)
    assert(recs.length == 2 && recs.forall(_.ok))
    assert(recs(0).warc_type == "response" && recs(0).body == "hello" &&
      recs(0).http_status == 200 && recs(0).target_uri == "https://t/1")
    // non-http record: raw block, no status
    assert(recs(1).warc_type == "metadata" && recs(1).http_status == -1 &&
      recs(1).body.contains("world"))
    assert(recs(0).rec_idx == 0 && recs(1).rec_idx == 1)
  }

  test("per-record gzip members (the .warc.gz layout) parse identically") {
    val plain = record(1, "alpha") ++ record(2, "beta")
    val gz = gzipMember(record(1, "alpha")) ++ gzipMember(record(2, "beta"))
    val a = WarcIngest.parseFile(1L, plain).map(r => (r.rec_idx, r.body, r.ok))
    val b = WarcIngest.parseFile(1L, gz).map(r => (r.rec_idx, r.body, r.ok))
    assert(a == b && a.length == 2)
  }

  test("chunked transfer-encoding dechunks to the original body") {
    val body = "0123456789abcdef0123456789ABCDEFtail"
    val chunked = "10\r\n" + body.substring(0, 16) + "\r\n" +
      "10\r\n" + body.substring(16, 32) + "\r\n" +
      "4\r\n" + body.substring(32) + "\r\n0\r\n\r\n"
    val rec = record(5, chunked, extra = "Transfer-Encoding: chunked\r\n")
    val recs = WarcIngest.parseFile(1L, rec)
    assert(recs.head.ok && recs.head.body == body &&
      recs.head.payload_len == body.length)
  }

  test("malformed input quarantines without throwing, keeps prior records") {
    // torn tail: second record claims more bytes than remain
    val torn = record(1, "ok") ++
      "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99999\r\n\r\nxx"
        .getBytes(UTF_8)
    val recs = WarcIngest.parseFile(1L, torn)
    assert(recs.length == 2 && recs(0).ok && !recs(1).ok &&
      recs(1).err.contains("truncated"))
    // not WARC at all
    val junk = WarcIngest.parseFile(2L, "HTTP/1.1 200 OK\r\n\r\n".getBytes(UTF_8))
    assert(junk.length == 1 && !junk.head.ok)
    // corrupt gzip
    val bad = WarcIngest.parseFile(3L, Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3))
    assert(junk.length == 1 && !bad.head.ok && bad.head.err.startsWith("gzip"))
  }

  test("malformed chunked framing quarantines instead of truncating silently") {
    // corrupt size line (non-hex)
    val badSize = record(1, "zz\r\nbody\r\n0\r\n\r\n",
      extra = "Transfer-Encoding: chunked\r\n")
    val r1 = WarcIngest.parseFile(1L, badSize)
    assert(r1.length == 1 && !r1.head.ok && r1.head.err.contains("chunked"))
    // declared chunk overruns the Content-Length block
    val overrun = record(2, "ff\r\nshort\r\n0\r\n\r\n",
      extra = "Transfer-Encoding: chunked\r\n")
    val r2 = WarcIngest.parseFile(1L, overrun)
    assert(!r2.head.ok && r2.head.err.contains("chunked"))
    // missing 0-terminator
    val noTerm = record(3, "5\r\nhello\r\n",
      extra = "Transfer-Encoding: chunked\r\n")
    assert(!WarcIngest.parseFile(1L, noTerm).head.ok)
    // and a bad chunked record doesn't halt the file: the NEXT record parses
    val mixed = badSize ++ record(4, "fine")
    val rs = WarcIngest.parseFile(1L, mixed)
    assert(rs.length == 2 && !rs(0).ok && rs(1).ok && rs(1).body == "fine")
  }

  test("binary-safe blocks: Content-Length framing survives CRLFs in the body") {
    val body = "line1\r\n\r\nWARC/1.0 fake\r\nline2"
    val recs = WarcIngest.parseFile(1L, record(9, body))
    assert(recs.length == 1 && recs.head.ok && recs.head.body == body)
  }

  test("negative Content-Length quarantines without throwing or spinning") {
    // "-5".toLongOption parses — the r13 parser underflowed blockEnd here
    val neg = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: -5\r\n\r\n" +
      "xxxxx\r\n\r\n").getBytes(UTF_8)
    val recs = WarcIngest.parseFile(1L, neg)
    assert(recs.length == 1 && !recs.head.ok &&
      recs.head.err.contains("negative Content-Length"))
  }

  test("unterminated HTTP headers inside an intact block quarantine, file continues") {
    // Content-Length frames exactly a status line + one header with NO
    // blank separator — the r13 parser scanned past blockEnd here
    val block = "HTTP/1.1 200 OK\r\nContent-Type: text/html"
    val rec1 = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${block.length}\r\n\r\n$block\r\n\r\n").getBytes(UTF_8)
    val rs = WarcIngest.parseFile(1L, rec1 ++ record(2, "after"))
    assert(rs.length == 2 && !rs(0).ok && rs(0).err.contains("unterminated") &&
      rs(1).ok && rs(1).body == "after")
  }

  test("a record above the per-record cap is skipped by length, file continues") {
    val big = record(1, "x" * 200)
    val rs = WarcIngest.parseStream(1L, big ++ record(2, "small"),
      maxRecordBytes = 100L).toVector
    assert(rs.length == 2 && !rs(0).ok && rs(0).err.contains("exceeds cap") &&
      rs(1).ok && rs(1).body == "small")
  }

  test("records stream off the input: one record consumed ≈ one record read") {
    // three ~100 KiB records; after pulling only the first, the reader
    // must not have drained the stream (proves record-at-a-time memory)
    val bodies = Seq("a", "b", "c").map(_ * (100 << 10))
    val bytes = bodies.zipWithIndex
      .map { case (b, i) => record(i, b) }.reduce(_ ++ _)
    var readSoFar = 0L
    val counting = new java.io.InputStream {
      private val in = new java.io.ByteArrayInputStream(bytes)
      def read(): Int = { val c = in.read(); if (c >= 0) readSoFar += 1; c }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val n = in.read(b, off, len); if (n > 0) readSoFar += n; n
      }
    }
    val it = WarcIngest.parseRecords(7L, counting)
    val first = it.next()
    assert(first.ok && first.body == bodies.head)
    assert(readSoFar < bytes.length / 2,
      s"read $readSoFar of ${bytes.length} bytes after one record")
    assert(it.toVector.map(_.body) == bodies.tail)
  }

  test("charset sniffing: transport header, multi-byte, meta prescan, BOM precedence") {
    def http(ct: String, body: Array[Byte]): Array[Byte] = {
      val head = s"HTTP/1.1 200 OK\r\nContent-Type: $ct\r\n\r\n".getBytes(UTF_8)
      val block = head ++ body
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${block.length}\r\n\r\n").getBytes(UTF_8) ++
        block ++ "\r\n\r\n".getBytes(UTF_8)
    }
    // windows-1252: C1-range bytes where 1252 differs from Latin-1
    val w = WarcIngest.parseFile(1L, http("text/html; charset=windows-1252",
      Array(0x93, 'h', 0x94).map(_.toByte))).head
    assert(w.ok && w.body == "“h”" && w.charset == "windows-1252")
    // shift_jis lead/trail pair
    val s = WarcIngest.parseFile(1L, http("text/html; charset=shift_jis",
      Array(0x93, 0xfa, 'o', 'k').map(_.toByte))).head
    assert(s.ok && s.body == "日ok" && s.charset == "shift_jis")
    // meta prescan when the transport layer is silent
    val m = WarcIngest.parseFile(1L, http("text/html",
      "<meta charset='windows-1252'>".getBytes(UTF_8) ++
        Array(0x93.toByte))).head
    assert(m.ok && m.body == "<meta charset='windows-1252'>“" &&
      m.charset == "windows-1252")
    // BOM beats a (wrong) transport declaration, and is stripped
    val bomBody = Array(0xef, 0xbb, 0xbf).map(_.toByte) ++
      "café".getBytes(UTF_8)
    val b = WarcIngest.parseFile(1L, http("text/html; charset=iso-8859-1", bomBody)).head
    assert(b.ok && b.body == "café" && b.charset == "utf-8" &&
      b.payload_len == bomBody.length)
    // no signal at all: ISO-8859-1 fallback decodes any bytes
    val f = WarcIngest.parseFile(1L, http("application/octet-stream",
      Array(0xe9.toByte))).head
    assert(f.ok && f.body == "é" && f.charset == "iso-8859-1")
    // an unknown label falls back rather than throwing
    val u = WarcIngest.parseFile(1L, http("text/html; charset=x-no-such-cs",
      "plain".getBytes(UTF_8))).head
    assert(u.ok && u.body == "plain" && u.charset == "iso-8859-1")
  }

  test("charset fixture round-trips: planted bytes decode to the pinned code points") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val recs = WarcIngest.records(WarcIngest.syntheticCharsetWarc(docs))
      .filter(col("ok")).cache()
    try {
      assert(recs.count() == docs.count())
      val byVariant = recs.select(
          regexp_extract(col("record_id"), "urn:doc:([0-9]+)", 1)
            .cast("long").as("doc_id"),
          col("charset"), col("body"))
        .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      val page = concat(lit("<html><body><p>"), col("text"), lit("</p></body></html>"))
      val expected = when(col("doc_id") % 5 === 1,
          concat(lit("“"), page, lit("”")))
        .when(col("doc_id") % 5 === 2, concat(lit("日"), page))
        .when(col("doc_id") % 5 === 3,
          concat(lit("<html><head><meta charset=\"windows-1252\"></head><body><p>“"),
            col("text"), lit("</p></body></html>")))
        .otherwise(page)
      assert(byVariant.filter(col("body") =!= expected).count() == 0)
      val cs = byVariant.groupBy(col("doc_id") % 5).agg(
        collect_set(col("charset")).as("cs")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      assert(cs(0L) == Set("utf-8") && cs(1L) == Set("windows-1252") &&
        cs(2L) == Set("shift_jis") && cs(3L) == Set("windows-1252") &&
        cs(4L) == Set("utf-8"))
    } finally recs.unpersist()
  }

  test("synthetic fixture round-trips through the distributed parser") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val recs = WarcIngest.records(WarcIngest.syntheticWarcFromDocuments(docs))
      .filter(col("ok")).cache()
    try {
      assert(recs.count() == docs.count())
      // every body is exactly the page the fixture wrapped the doc in
      val back = recs.select(
        regexp_extract(col("record_id"), "urn:doc:([0-9]+)", 1)
          .cast("long").as("doc_id"),
        expr("substring(body, 16, length(body) - 33)").as("parsed_text"))
      val diff = back.join(docs.select("doc_id", "text"), Seq("doc_id"))
        .filter(col("parsed_text") =!= col("text"))
      assert(diff.count() == 0)
      // the chunked schedule really took the chunked path: payload_len of
      // a %5 doc equals the unchunked page length (dechunk happened)
      val five = recs.filter(col("record_id") === "<urn:doc:5>").head()
      val text5 = docs.filter(col("doc_id") === 5).head().getAs[String]("text")
      assert(five.getAs[Long]("payload_len") == text5.length + 33L)
    } finally recs.unpersist()
  }

  test("records() decodes a STREAMING frame of WARC files (micro-batch crawl ingest)") {
    // the established file-stream pattern: two parquet files +
    // maxFilesPerTrigger=1, so the parse runs across micro-batches
    val dir = java.nio.file.Files.createTempDirectory("warc_stream").toFile
    try {
      val f1 = record(1, "stream-one") ++ record(2, "stream-two")
      val f2 = gzipMember(record(3, "stream-three"))
      for ((fid, bytes, name) <- Seq((7L, f1, "a"), (8L, f2, "b"))) {
        val tmp = java.nio.file.Files.createTempDirectory("warc_split").toString
        Seq((fid, "warc", bytes, bytes.length.toLong))
          .toDF("media_id", "kind", "media", "n_bytes")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$dir/$name.parquet"))
      }
      val schema = Seq((0L, "", Array.emptyByteArray, 0L))
        .toDF("media_id", "kind", "media", "n_bytes").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(dir.toString)
      val q = WarcIngest.records(stream).writeStream
        .format("memory").queryName("warc_stream").outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000L))
      val got = spark.table("warc_stream")
        .select("file_id", "rec_idx", "body", "ok")
        .as[(Long, Int, String, Boolean)].collect().sortBy(r => (r._1, r._2))
      assert(got.forall(_._4))
      assert(got.map(r => (r._1, r._2, r._3)).toSeq == Seq(
        (7L, 0, "stream-one"), (7L, 1, "stream-two"), (8L, 0, "stream-three")))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  test("readFiles round-trips through the binaryFile source") {
    val dir = java.nio.file.Files.createTempDirectory("warc_t").toFile
    try {
      val f = new java.io.File(dir, "a.warc.gz")
      val fos = new java.io.FileOutputStream(f)
      fos.write(gzipMember(record(1, "from-disk")) ++ gzipMember(record(2, "two")))
      fos.close()
      val recs = WarcIngest.records(WarcIngest.readFiles(spark, f.getAbsolutePath))
      assert(recs.count() == 2)
      assert(recs.filter(col("body") === "from-disk").count() == 1)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  private def writeFile(dir: java.io.File, name: String, bytes: Array[Byte]): java.io.File = {
    val f = new java.io.File(dir, name)
    val fos = new java.io.FileOutputStream(f)
    fos.write(bytes); fos.close()
    f
  }

  test("readRecordsStreamed matches the materialized parse across gzip layouts") {
    val dir = java.nio.file.Files.createTempDirectory("warc_s").toFile
    try {
      // three layouts: whole-file gzip, per-record gzip members, plain
      val contents = Map(
        "whole.warc.gz" -> gzipMember(record(1, "alpha") ++ record(2, "beta")),
        "members.warc.gz" -> (gzipMember(record(3, "gamma")) ++ gzipMember(record(4, "delta"))),
        "plain.warc" -> (record(5, "epsilon") ++ record(6, "zeta")))
      contents.foreach { case (n, b) => writeFile(dir, n, b) }
      val got = WarcIngest.readRecordsStreamed(spark, dir.getAbsolutePath + "/*")
        .collect().map(r => (new java.io.File(r.getAs[String]("path")).getName,
          r.getAs[Int]("rec_idx"), r.getAs[String]("body"), r.getAs[Boolean]("ok")))
        .toSet
      val want = contents.flatMap { case (n, b) =>
        WarcIngest.parseFile(0L, b).map(r => (n, r.rec_idx, r.body, r.ok))
      }.toSet
      assert(got == want && got.size == 6 && got.forall(_._4))
    } finally { dir.listFiles().foreach(_.delete()); dir.delete() }
  }

  test("readRecordsStreamed file_id equals Spark's xxhash64 over the path") {
    val dir = java.nio.file.Files.createTempDirectory("warc_id").toFile
    try {
      writeFile(dir, "one.warc.gz", gzipMember(record(1, "idcheck")))
      val row = WarcIngest.readRecordsStreamed(spark, dir.getAbsolutePath + "/*")
        .select(col("path"), col("file_id")).head()
      val expected = spark.range(1)
        .select(xxhash64(lit(row.getAs[String]("path")))).head().getLong(0)
      assert(row.getAs[Long]("file_id") == expected)
    } finally { dir.listFiles().foreach(_.delete()); dir.delete() }
  }

  test("readRecordsStreamed quarantines a corrupt file, parses the rest") {
    val dir = java.nio.file.Files.createTempDirectory("warc_q").toFile
    try {
      // gzip magic then garbage: construction succeeds, inflate fails
      writeFile(dir, "bad.warc.gz",
        Array[Byte](0x1f, 0x8b.toByte, 9, 9, 9, 9, 9, 9, 9, 9))
      writeFile(dir, "good.warc.gz", gzipMember(record(1, "survivor")))
      val rows = WarcIngest.readRecordsStreamed(spark, dir.getAbsolutePath + "/*")
        .collect()
      val (ok, bad) = rows.partition(_.getAs[Boolean]("ok"))
      assert(ok.length == 1 && ok.head.getAs[String]("body") == "survivor")
      assert(bad.length == 1 && bad.head.getAs[String]("err").startsWith("gzip:"))
    } finally { dir.listFiles().foreach(_.delete()); dir.delete() }
  }

  test("readRecordsStreamed per-record cap skips by length, keeps parsing") {
    val dir = java.nio.file.Files.createTempDirectory("warc_c").toFile
    try {
      val big = record(1, "x" * 4096)
      val small = record(2, "small")
      writeFile(dir, "mix.warc.gz", gzipMember(big) ++ gzipMember(small))
      val rows = WarcIngest.readRecordsStreamed(spark, dir.getAbsolutePath + "/*",
          maxRecordBytes = 1024L).collect().sortBy(_.getAs[Int]("rec_idx"))
      assert(rows.length == 2)
      assert(!rows(0).getAs[Boolean]("ok") &&
        rows(0).getAs[String]("err").contains("exceeds cap"))
      assert(rows(1).getAs[Boolean]("ok") && rows(1).getAs[String]("body") == "small")
    } finally { dir.listFiles().foreach(_.delete()); dir.delete() }
  }

  test("writeWet round-trips: conversion records re-read to the input frame") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("wet_rt").toFile
    try {
      val docs = Seq(
        (1L, "https://a.com/x", "plain text"),
        (2L, "https://b.org/y", "two lines\nof body text"),
        (3L, "https://c.net/z", "unicode: café 日本"))
        .toDF("doc_id", "url", "text")
      WarcIngest.writeWet(docs, dir.getAbsolutePath, nFiles = 2)
      val got = WarcIngest.readRecordsStreamed(spark, dir.getAbsolutePath + "/*.gz")
        .filter(col("ok"))
        .select(
          regexp_extract(col("record_id"), "urn:graft:doc:([0-9]+)", 1)
            .cast("long").as("doc_id"),
          col("warc_type"), col("target_uri"), col("body"), col("payload_len"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSet
      val want = docs.collect().map { r =>
        val t = r.getString(2)
        (r.getLong(0), "conversion", r.getString(1), t,
          t.getBytes(UTF_8).length.toLong)
      }.toSet
      assert(got == want) // incl. multi-line body and UTF-8 byte lengths
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir)
    }
  }

  test("Content-Encoding bodies decode: gzip, deflate (zlib + raw), quarantine") {
    def deflate(b: Array[Byte], nowrap: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, nowrap)
      d.setInput(b); d.finish()
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val body = "compressed page body".getBytes(UTF_8)
    def rec(enc: String, payload: Array[Byte]): Array[Byte] = {
      val head = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        s"Content-Encoding: $enc\r\n\r\n").getBytes(UTF_8)
      val http = head ++ payload
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:ce:1>\r\n" +
        s"WARC-Target-URI: https://t/ce\r\n" +
        s"Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes(UTF_8) ++
        http ++ "\r\n\r\n".getBytes(UTF_8)
    }
    for ((enc, payload) <- Seq(
      ("gzip", gzipMember(body)), ("x-gzip", gzipMember(body)),
      ("deflate", deflate(body, nowrap = false)), // zlib-wrapped
      ("deflate", deflate(body, nowrap = true)))) { // raw (the browser retry)
      val r = WarcIngest.parseFile(1L, rec(enc, payload)).head
      assert(r.ok && r.body == "compressed page body", s"$enc: ${r.err}")
      assert(r.payload_len == body.length) // decoded length, like body
    }
    // chunked + gzip compose: dechunk first, then content-decode
    val gz = gzipMember(body)
    val chunked = f"${gz.length}%x\r\n".getBytes(UTF_8) ++ gz ++
      "\r\n0\r\n\r\n".getBytes(UTF_8)
    val head = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "Transfer-Encoding: chunked\r\nContent-Encoding: gzip\r\n\r\n").getBytes(UTF_8)
    val http = head ++ chunked
    val cRec = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:ce:2>\r\n" +
      s"WARC-Target-URI: https://t/ce2\r\n" +
      s"Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes(UTF_8) ++
      http ++ "\r\n\r\n".getBytes(UTF_8)
    val cr = WarcIngest.parseFile(2L, cRec).head
    assert(cr.ok && cr.body == "compressed page body", cr.err)
    // corrupt gzip body and unknown coding quarantine, next record parses
    val bad = rec("gzip", Array[Byte](1, 2, 3)) ++ rec("br", body) ++
      record(9, "survivor")
    val rs = WarcIngest.parseFile(3L, bad)
    assert(rs.length == 3)
    assert(!rs(0).ok && rs(0).err.startsWith("content-encoding gzip:"))
    assert(!rs(1).ok && rs(1).err.contains("br unsupported"))
    assert(rs(2).ok && rs(2).body == "survivor")
  }

  test("writeCdxj emits a GLOBALLY sorted index across output files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdx_t").toFile
    try {
      // enough distinct hosts that range partitioning has real splits
      val recs = (0 until 200).map { i =>
        (i.toLong / 4, i % 4, "response", s"https://h${i % 37}.example/p/$i",
          s"<urn:t:$i>", "application/http; msgtype=response", 200,
          "text/html; charset=utf-8", 10L + i, "body", "utf-8", true, "")
      }.toDF("file_id", "rec_idx", "warc_type", "target_uri", "record_id",
        "content_type", "http_status", "http_content_type", "payload_len",
        "body", "charset", "ok", "err")
      WarcIngest.writeCdxj(recs, dir.getAbsolutePath, nFiles = 4)
      // gzip part files in NAME order must concatenate to a sorted stream
      val parts = dir.listFiles().filter(_.getName.endsWith(".gz")).sortBy(_.getName)
      assert(parts.length > 1, "need multiple files to prove GLOBAL order")
      val lines = parts.flatMap { f =>
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          new java.util.zip.GZIPInputStream(new java.io.FileInputStream(f)), "UTF-8"))
        Iterator.continually(in.readLine()).takeWhile(_ != null).toVector
      }
      assert(lines.length == 200)
      val keys = lines.map(_.split(" ")(0))
      assert(keys.sameElements(keys.sorted), "CDXJ lines not globally sorted")
      // lines parse: "surt ts {json}" with the record address inside
      assert(lines.forall(_.matches("""\S+ 20250101000000 \{"url":.*"idx":"\d"\}""")))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("planBins: byte-volume LPT, oversized file isolated, parallelism floor") {
    def f(n: String, len: Long) = (n, len, Seq.empty[String])
    // one oversized + small fillers at capacity 100
    val bins = WarcIngest.planBins(
      Seq(f("huge", 350L), f("a", 60L), f("b", 50L), f("c", 40L), f("d", 10L)),
      target = 100L, parallelism = 1)
    val byName = bins.map(_._1.toSet)
    assert(byName.contains(Set("huge"))) // indivisible, own bin
    // every non-oversized bin is within capacity
    val sizes = Map("huge" -> 350L, "a" -> 60L, "b" -> 50L, "c" -> 40L, "d" -> 10L)
    for (b <- byName if b != Set("huge")) assert(b.toSeq.map(sizes).sum <= 130L)
    // parallelism floor: 4 one-byte files at huge target still spread to 4 bins
    val spread = WarcIngest.planBins(
      Seq(f("a", 1L), f("b", 1L), f("c", 1L), f("d", 1L)),
      target = 1L << 30, parallelism = 8)
    assert(spread.length == 4 && spread.forall(_._1.length == 1))
    // least-loaded assignment balances: 100 unit files over 10 bins
    val many = WarcIngest.planBins(
      (0 until 100).map(i => f(f"m$i%03d", 1L)), target = 10L, parallelism = 4)
    assert(many.length == 10 && many.forall(_._1.length == 10))
    // deterministic under input order
    val again = WarcIngest.planBins(
      (0 until 100).reverse.map(i => f(f"m$i%03d", 1L)), target = 10L, parallelism = 4)
    assert(again.map(_._1) == many.map(_._1))
  }
}
