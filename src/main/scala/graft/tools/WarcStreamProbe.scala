package graft.tools

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.GZIPOutputStream

import graft.sources.WarcIngest

/** Proof that WARC ingestion memory is bounded by RECORD size, not
  * archive size (VERDICT r13 item 1): builds an in-memory .warc.gz whose
  * DECOMPRESSED size exceeds the r13 whole-file limit (1 GiB) by 20%,
  * then parses it record-at-a-time inside a deliberately small heap.
  *
  * Run forked with a capped heap — the probe is pure JVM (no Spark):
  *
  * {{{
  * sbt compile
  * java -Xmx512m -cp target/scala-2.13/classes:/opt/spark/jars/'*' \
  *   graft.tools.WarcStreamProbe
  * }}}
  *
  * The r13 parser held the whole decompressed archive (plus the
  * compressed copy) in byte arrays — 1.2 GiB decompressed either tripped
  * the `MaxGunzipBytes` quarantine or needed a multi-GiB heap. The
  * streaming parser's working set is the compressed array (repetitive
  * bodies, a few MiB here) + one 1 MiB record, so -Xmx512m is ample.
  * Result is recorded in SCALE.md.
  */
object WarcStreamProbe {

  /** `big` mode (r14 verdict item 1): proof that the streaming FILE
    * source has no archive-size ceiling. Writes a >2 GiB-COMPRESSED
    * .warc.gz to disk — random bodies, so deflate can't shrink them and
    * the file genuinely exceeds the `binaryFile` source's 2 GiB
    * byte-array limit — then parses it through [[WarcIngest.parsePath]]
    * (the exact code the `readRecordsStreamed` tasks run: FileSystem.open
    * → gunzip → record iterator) inside the same -Xmx512m heap. The r14
    * reader could not ingest this file AT ALL; here it parses in
    * record-sized memory.
    *
    * {{{
    * java -Xmx512m -cp target/scala-2.13/classes:/opt/spark/jars/'*' \
    *   graft.tools.WarcStreamProbe big
    * }}}
    */
  private def bigFileProbe(): Unit = {
    val bodyBytes = 1 << 20 // 1 MiB random body per record
    val nRecords = 2200     // ≈ 2.2 GiB compressed (random ⇒ stored-size)
    val tmp = java.io.File.createTempFile("warc_big_probe_", ".warc.gz")
    tmp.deleteOnExit()
    val rnd = new java.util.Random(42)
    val body = new Array[Byte](bodyBytes)
    val head = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: application/octet-stream\r\n\r\n").getBytes(UTF_8)
    val t0 = System.nanoTime()
    val fos = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(tmp), 1 << 20)
    var i = 0
    while (i < nRecords) {
      rnd.nextBytes(body)
      val warc = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:probe:$i>\r\nWARC-Target-URI: https://example.com/$i\r\n" +
        s"Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${head.length + bodyBytes}\r\n\r\n").getBytes(UTF_8)
      val g = new GZIPOutputStream(fos, 1 << 16) // one member per record
      g.write(warc); g.write(head); g.write(body); g.write("\r\n\r\n".getBytes(UTF_8))
      g.finish()
      i += 1
    }
    fos.close()
    val gb = tmp.length / 1073741824.0
    println(f"wrote ${tmp.getPath}: $gb%.2f GiB COMPRESSED " +
      f"(binaryFile ceiling is 2 GiB) in ${(System.nanoTime() - t0) / 1e9}%.1f s; " +
      f"heap max ${Runtime.getRuntime.maxMemory / 1048576} MiB")
    require(tmp.length > (2L << 30), "probe file must exceed 2 GiB compressed")
    val conf = new org.apache.hadoop.conf.Configuration()
    val t1 = System.nanoTime()
    var ok = 0L; var bad = 0L; var bytes = 0L
    WarcIngest.parsePath(conf, tmp.toURI.toString).foreach { r =>
      if (r.ok) { ok += 1; bytes += r.payload_len } else bad += 1
    }
    val sec = (System.nanoTime() - t1) / 1e9
    val peak = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      .stream().filter(_.getType == java.lang.management.MemoryType.HEAP)
      .mapToLong(_.getPeakUsage.getUsed).sum()
    println(f"parsed ok=$ok bad=$bad payload=${bytes / 1073741824.0}%.2f GiB " +
      f"in $sec%.1f s; peak heap ${peak / 1048576}%d MiB")
    tmp.delete()
    assert(bad == 0 && ok == nRecords, s"expected $nRecords ok records, got $ok ok / $bad bad")
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("big")) { bigFileProbe(); return }
    val bodyBytes = 1 << 20 // 1 MiB per record
    val nRecords = 1229     // ≈ 1.2 GiB decompressed
    val unit = "the quick brown fox jumps over the lazy dog 0123456789 "
    val body = (unit * (bodyBytes / unit.length + 1)).substring(0, bodyBytes)
    // one gzip member per record — the standard .warc.gz layout
    val member: Array[Byte] = {
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/plain; charset=utf-8\r\n\r\n$body"
      val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Record-ID: <urn:probe:0>\r\nWARC-Target-URI: https://example.com/p\r\n" +
        s"Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${http.getBytes(UTF_8).length}\r\n\r\n$http\r\n\r\n").getBytes(UTF_8)
      val bos = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(bos)
      g.write(rec); g.close()
      bos.toByteArray
    }
    val archive = new Array[Byte](member.length * nRecords)
    var i = 0
    while (i < nRecords) {
      System.arraycopy(member, 0, archive, i * member.length, member.length)
      i += 1
    }
    val decompressed = (bodyBytes.toLong + 200) * nRecords
    println(f"archive: ${archive.length / 1048576.0}%.1f MiB compressed, " +
      f"~${decompressed / 1073741824.0}%.2f GiB decompressed, " +
      f"heap max ${Runtime.getRuntime.maxMemory / 1048576} MiB")

    val t0 = System.nanoTime()
    var ok = 0L; var bad = 0L; var bytes = 0L
    WarcIngest.parseStream(1L, archive).foreach { r =>
      if (r.ok) { ok += 1; bytes += r.payload_len } else bad += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    val peak = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      .stream().filter(_.getType == java.lang.management.MemoryType.HEAP)
      .mapToLong(_.getPeakUsage.getUsed).sum()
    println(f"parsed ok=$ok bad=$bad payload=${bytes / 1073741824.0}%.2f GiB " +
      f"in $sec%.1f s; peak heap ${peak / 1048576}%d MiB")
    assert(bad == 0 && ok == nRecords, s"expected $nRecords ok records, got $ok ok / $bad bad")
  }
}
