package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.HeaderDecoder
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  lazy val docs = Seq(
    (0L, "an image payload"), (1L, "an audio payload"), (2L, "a video payload"),
    (3L, "another image")).toDF("doc_id", "text")

  // hand-built real headers (independent of the column-expression builder)
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(33)
    bb.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes).putInt(w).putInt(h)
    bb.put(Array(8, 6, 0, 0, 0).map(_.toByte)).putInt(0x1234)
    bb.array()
  }
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(41)
    bb.put(Array(0xff, 0xd8).map(_.toByte)) // SOI
    bb.put(Array(0xff, 0xe0).map(_.toByte)).putShort(16) // APP0
    bb.put("JFIF".getBytes).put(Array(0, 1, 1, 0, 0, 1, 0, 1, 0, 0).map(_.toByte))
    bb.put(Array(0xff, 0xc2).map(_.toByte)).putShort(11) // SOF2 (progressive)
    bb.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    bb.put(Array(1, 1, 17, 0).map(_.toByte))
    bb.array()
  }
  private def gifBytes(w: Int, h: Int, frames: Int = 1): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(13 + 14 * frames + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF89a".getBytes).putShort(w.toShort).putShort(h.toShort)
    bb.put(Array(0, 0, 0).map(_.toByte)) // no GCT
    (1 to frames).foreach { _ =>
      bb.put(0x2c.toByte).putShort(0).putShort(0).putShort(1).putShort(1)
      bb.put(0.toByte) // no LCT
      bb.put(Array(2, 1, 0, 0).map(_.toByte)) // LZW min + 1 sub-block + term
    }
    bb.put(0x3b.toByte) // trailer
    bb.array()
  }

  test("header parse: real PNG/JPEG/GIF bytes round-trip the dimensions") {
    assert(HeaderDecoder.parse(pngBytes(640, 480)) == Some(("png", 640, 480, 1)))
    assert(HeaderDecoder.parse(jpegBytes(1920, 1080)) == Some(("jpeg", 1920, 1080, 1)))
    assert(HeaderDecoder.parse(gifBytes(320, 200)) == Some(("gif", 320, 200, 1)))
    // marker walk: SOF behind APP0 was found, not assumed at a fixed offset
    assert(HeaderDecoder.parse(jpegBytes(1, 65535)) == Some(("jpeg", 1, 65535, 1)))
  }

  test("GIF block walk counts animation frames, tolerates extensions + trailing junk") {
    assert(HeaderDecoder.parse(gifBytes(320, 200, frames = 7)) == Some(("gif", 320, 200, 7)))
    // a graphic-control extension before each frame must be stepped over
    val ext = Array(0x21, 0xf9, 0x04, 0, 0, 0, 0, 0).map(_.toByte) // 4-byte sub-block + term
    val g = gifBytes(8, 8, frames = 2)
    val withExt = g.take(13) ++ ext ++ g.drop(13)
    assert(HeaderDecoder.parse(withExt) == Some(("gif", 8, 8, 2)))
    // bytes after the trailer are ignored, not parsed as blocks
    assert(HeaderDecoder.parse(gifBytes(8, 8, 3) ++ "junk after trailer".getBytes) ==
      Some(("gif", 8, 8, 3)))
    // truncated mid-frame-3: the two complete frames counted, no crash
    assert(HeaderDecoder.parse(gifBytes(8, 8, 4).dropRight(16)) == Some(("gif", 8, 8, 2)))
  }

  test("GIF global color table and JPEG APP1/EXIF segments are stepped over") {
    // GIF with a GCT: packed flags 0x80|size=1 → 4-entry table, 12 bytes
    val g = gifBytes(31, 17, frames = 2)
    val withGct = {
      val bb = java.nio.ByteBuffer.allocate(g.length + 12)
      bb.put(g.take(10)).put(0x81.toByte).put(g.slice(11, 13))
      bb.put(new Array[Byte](12)) // 4 RGB entries
      bb.put(g.drop(13))
      bb.array()
    }
    assert(HeaderDecoder.parse(withGct) == Some(("gif", 31, 17, 2)))
    // JPEG with an APP1 (EXIF) segment between APP0 and SOF
    val j = jpegBytes(800, 600)
    val app1 = {
      val bb = java.nio.ByteBuffer.allocate(12)
      bb.put(Array(0xff, 0xe1).map(_.toByte)).putShort(10)
      bb.put("Exif".getBytes).put(Array[Byte](0, 0, 1, 2))
      bb.array()
    }
    val withExif = j.take(20) ++ app1 ++ j.drop(20) // after APP0 (ends at 20)
    assert(HeaderDecoder.parse(withExif) == Some(("jpeg", 800, 600, 1)))
  }

  test("header parse: truncated and malformed payloads quarantine (None)") {
    assert(HeaderDecoder.parse(pngBytes(640, 480).take(20)) == None) // truncated IHDR
    assert(HeaderDecoder.parse(jpegBytes(640, 480).take(21)) == None) // truncated pre-SOF
    assert(HeaderDecoder.parse(gifBytes(320, 200).take(8)) == None)
    assert(HeaderDecoder.parse("not an image at all".getBytes) == None)
    assert(HeaderDecoder.parse(Array[Byte]()) == None)
    // JPEG reaching SOS/EOI without a frame header
    assert(HeaderDecoder.parse(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) == None)
    // corrupt marker stream (no FF where a marker must start)
    assert(HeaderDecoder.parse(Array(0xff, 0xd8, 0x00, 0x11).map(_.toByte)) == None)
    // GIF header + immediate garbage: zero parseable image descriptors
    // must quarantine like the comparably malformed JPEG/PNG above (r6;
    // previously floored to a bogus ok=true n_frames=1)
    assert(HeaderDecoder.parse(gifBytes(320, 200).take(13) ++
      "garbage, no descriptors".getBytes) == None)
    // header + trailer but no frames: structurally "empty GIF" → quarantine
    assert(HeaderDecoder.parse(gifBytes(320, 200).take(13) :+ 0x3b.toByte) == None)
  }

  test("resize kernel: aspect fit, no upscale, 1px floor, frames multiply bytes") {
    def rows(items: (Long, Array[Byte])*) = items.iterator.map { case (id, b) =>
      Multimodal.MediaRow(id, "image", b, b.length.toLong)
    }
    val k = new Multimodal.ResizePlanKernel(224, 224)
    val out = k.decode(rows(
      1L -> pngBytes(448, 224),   // downscale ×0.5 on the wide axis
      2L -> jpegBytes(100, 50),   // already fits: scale 1, no upscale
      3L -> gifBytes(2240, 10, frames = 3), // extreme aspect: height floors at 1
      4L -> "not an image".getBytes)        // unparseable: dropped
    ).toList
    assert(out.map(_.media_id) == List(1L, 2L, 3L))
    val r1 = out(0)
    assert((r1.out_w, r1.out_h, r1.scale) == ((224L, 112L, 0.5)))
    assert(r1.out_bytes == 224L * 112L * 3)
    val r2 = out(1)
    assert((r2.out_w, r2.out_h, r2.scale) == ((100L, 50L, 1.0)))
    val r3 = out(2)
    assert(r3.out_w == 224L && r3.out_h == 1L) // floor(10 * 0.1) = 1
    assert(r3.out_bytes == 224L * 1L * 3 * 3)  // 3 GIF frames
  }

  test("media table: opaque binary + typed metadata, kind cycles by id") {
    val m = Multimodal.mediaFromDocuments(docs)
    assert(m.columns.toSeq == Seq("media_id", "kind", "media", "n_bytes"))
    assert(m.schema("media").dataType.typeName == "binary")
    val kinds = m.select("media_id", "kind").as[(Long, String)].collect().toMap
    assert(kinds == Map(0L -> "image", 1L -> "audio", 2L -> "video", 3L -> "image"))
    val nb = m.filter($"media_id" === 0L).select("n_bytes").as[Long].head()
    assert(nb == "an image payload".getBytes("UTF-8").length)
  }

  test("synthetic media carries REAL headers the decoder recovers exactly") {
    val ids = ((0L to 20L) :+ 999L :+ 123456L).map(i => (i, s"body of $i"))
    val media = Multimodal.syntheticMediaFromDocuments(ids.toDF("doc_id", "text"))
    val meta = Multimodal.decodeHeaders(media)
    assert(meta.filter(!col("ok")).count() == 0)
    val rows = meta.select("media_id", "format", "width", "height", "n_frames")
      .as[(Long, String, Int, Int, Int)].collect()
    rows.foreach { case (id, fmt, w, h, f) =>
      assert(fmt == Seq("png", "jpeg", "gif")((id % 3).toInt), s"id=$id")
      assert(w == 16 + id % 1000, s"id=$id")
      assert(h == 16 + (id / 1000) % 1000, s"id=$id")
      assert(f == (if (id % 3 == 2) 1 + id % 8 else 1), s"id=$id")
    }
    // the payload really is header + body bytes
    val m0 = media.filter($"media_id" === 0L).select("media").as[Array[Byte]].head()
    assert(m0.length == 33 + "body of 0".getBytes.length)
    // gif payload: full stream (header + k frames + trailer) + body junk
    val m2 = media.filter($"media_id" === 2L).select("media").as[Array[Byte]].head()
    assert(m2.length == 13 + 14 * 3 + 1 + "body of 2".getBytes.length)
  }

  test("decode is deterministic and partitioning-invariant; quarantine flows as data") {
    val media = Multimodal.syntheticMediaFromDocuments(docs.limit(3))
      .unionByName(Multimodal.mediaFromDocuments(docs.filter($"doc_id" === 3L))) // text bytes: unparseable
    val f1 = Multimodal.decodeHeaders(media).orderBy("media_id").collect()
    val f2 = Multimodal.decodeHeaders(media, targetBytesPerPartition = 16L)
      .orderBy("media_id").collect()
    assert(f1.sameElements(f2)) // partitioning must not change results
    val bad = f1.filter(!_.getBoolean(7))
    assert(bad.map(_.getLong(0)).toSeq == Seq(3L))
    assert(bad.head.getString(3) == "unknown" && bad.head.getInt(4) == -1)
  }

  test("decodeHeaders sizes the shuffle by byte volume and spreads it") {
    // skewed corpus: 200 small payloads + one 50x outlier
    val skew = ((0 until 200).map(i => (i.toLong, "x" * 1000)) :+ (999L, "y" * 50000))
      .toDF("doc_id", "text")
    val media = Multimodal.syntheticMediaFromDocuments(skew)
    val target = 16384L
    val total = media.agg(sum("n_bytes")).as[Long].head()
    val expectParts = ((total + target - 1) / target).toInt
    val feats = Multimodal.decodeHeaders(media, targetBytesPerPartition = target)
    assert(feats.rdd.getNumPartitions == expectParts)
    // actual per-partition byte sums: bounded by the indivisible max payload
    // plus a small multiple of the target (hash spread, not bin packing)
    val sums = feats.withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(sum("n_bytes").as("b")).select("b").as[Long].collect()
    val maxPayload = 50039L
    assert(sums.max <= maxPayload + 4 * target,
      s"worst partition ${sums.max} bytes of target $target")
    // hash spread leaves at most a few partitions empty
    assert(sums.length >= expectParts - 3 && sums.length <= expectParts)
  }

  private def rawPayload(id: Long, w: Int, h: Int)(v: (Int, Int, Int) => Int): Array[Byte] = {
    val b = new Array[Byte](8 + w * h * 3)
    b(0) = 'R'; b(1) = 'A'; b(2) = 'W'; b(3) = '0'
    b(4) = (w >> 8).toByte; b(5) = w.toByte; b(6) = (h >> 8).toByte; b(7) = h.toByte
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      b(8 + (y * w + x) * 3 + c) = v(x, y, c).toByte
    b
  }

  test("pixel kernel: raw lane NN-resample matches a naive reference") {
    // 8x6 image, every pixel distinct -> fit into 4x4 = 4x3, scale 0.5
    val src = rawPayload(1L, 8, 6)((x, y, c) => x * 13 + y * 29 + c * 31)
    val k = new Multimodal.PixelResizeKernel(4, 4)
    val out = k.decode(Iterator(Multimodal.MediaRow(1L, "raw", src, src.length.toLong))).toList
    assert(out.length == 1)
    val r = out.head
    assert((r.format, r.width, r.height, r.out_w, r.out_h) == (("raw", 8L, 6L, 4L, 3L)))
    assert(r.out_bytes == 4L * 3L * 3L)
    // naive reference: sx = x*w/ow, sy = y*h/oh, checksum over bytes
    var expect = 0L; var pos = 0L
    for (y <- 0 until 3; x <- 0 until 4; c <- 0 until 3) {
      val sx = x * 8 / 4; val sy = y * 6 / 3
      val v = (sx * 13 + sy * 29 + c * 31) & 0xff
      expect += v.toLong * (1L + pos % 97L); pos += 1
    }
    assert(r.pix_sum == expect)
  }

  test("pixel kernel: no upscale, 1px floor, malformed raw payloads drop") {
    val small = rawPayload(2L, 2, 2)((x, y, c) => x + y + c) // fits: untouched
    val k = new Multimodal.PixelResizeKernel(224, 224)
    val r = k.decode(Iterator(Multimodal.MediaRow(2L, "raw", small, small.length.toLong))).toList.head
    assert((r.out_w, r.out_h, r.out_bytes) == ((2L, 2L, 12L)))
    // truncated body, zero dims, bad magic: all drop
    val bad = Seq(
      rawPayload(3L, 4, 4)((_, _, _) => 0).dropRight(1),
      Array[Byte]('R', 'A', 'W', '0', 0, 0, 0, 0),
      "RAWX plus whatever".getBytes)
    assert(k.decode(bad.zipWithIndex.iterator.map { case (b, i) =>
      Multimodal.MediaRow(10L + i, "raw", b, b.length.toLong)
    }).isEmpty)
  }

  test("pixel kernel: GIF animation decodes via LZW, per-frame checksums accumulate") {
    // two 1x1 frames with distinct palette colors, hand-assembled like the
    // synthetic corpus (clear, idx, EOI at width 3)
    val pal = Array[Byte](11, 22, 33, 44, 55, 66, 77, 88, 99, 110, 121, -124)
    def frame(idx: Int) =
      Seq[Int](0x2c, 0, 0, 0, 0, 1, 0, 1, 0, 0, 0x02, 0x02, 0x44 | (idx << 3), 0x01, 0x00).map(_.toByte)
    val g = ("GIF89a".getBytes.toSeq ++ Seq[Int](1, 0, 1, 0, 0x81, 0, 0).map(_.toByte) ++
      pal.toSeq ++ frame(1) ++ frame(3) ++ Seq(0x3b.toByte)).toArray
    val k = new Multimodal.PixelResizeKernel(4, 4)
    val r = k.decode(Iterator(Multimodal.MediaRow(5L, "gif", g, g.length.toLong))).toList.head
    assert((r.format, r.n_frames, r.out_bytes) == (("gif", 2L, 6L)))
    val bytes = Seq(44, 55, 66, 110, 121, 132) // frame idx1 RGB then idx3 RGB
    val expect = bytes.zipWithIndex.map { case (v, p) => v.toLong * (1L + p % 97L) }.sum
    assert(r.pix_sum == expect)
  }

  test("syntheticPixelMedia: all three lanes decode end-to-end; partitioning-invariant") {
    val ids = ((0L to 17L) :+ 999L :+ 123456L).map(i => (i, s"junk body $i"))
    val media = Multimodal.syntheticPixelMedia(ids.toDF("doc_id", "text"))
    val out = Multimodal.resizePixels(media, 4, 4).orderBy("media_id")
    val rows = out.collect()
    assert(rows.length == ids.length) // nothing quarantined
    rows.foreach { r =>
      val id = r.getLong(0)
      if (id % 3 == 0) {
        assert(r.getString(1) == "gif")
        assert(r.getLong(6) == id % 8 + 1, s"id=$id frames")
        assert(r.getLong(7) == (id % 8 + 1) * 3, s"id=$id bytes") // 1x1 RGB per frame
      } else {
        assert(r.getString(1) == (if (id % 3 == 1) "raw" else "png"), s"id=$id")
        assert(r.getLong(2) == 2 + id % 7 && r.getLong(3) == 2 + (id / 7) % 5, s"id=$id dims")
      }
    }
    // checksum spot-check for one gif id against the palette formula
    val id6 = rows.find(_.getLong(0) == 6L).get
    val px = (0L until 6L % 8L + 1L).flatMap { j =>
      val i = j % 4
      Seq((6 + 17 * i) % 256, (2 * 6 + 29 * i) % 256, (3 * 6 + 43 * i) % 256)
    }
    assert(id6.getLong(8) == px.zipWithIndex.map { case (v, p) => v * (1L + p % 97L) }.sum)
    // checksum spot-check for a PNG id against a naive reference: the
    // Spark-assembled container round-trips through the REAL chunk walk /
    // CRC verify / inflate / defilter to the formula pixels. id=2: 4x2,
    // fits 4x4 untouched.
    val id2 = rows.find(_.getLong(0) == 2L).get
    assert((id2.getString(1), id2.getLong(2), id2.getLong(3),
      id2.getLong(4), id2.getLong(5)) == (("png", 4L, 2L, 4L, 2L)))
    var expect = 0L; var pos = 0L
    for (y <- 0 until 2; x <- 0 until 4; c <- 0 until 3) {
      val v = (7 * 2 + 13 * x + 29 * y + 31 * c) % 256
      expect += v.toLong * (1L + pos % 97L); pos += 1
    }
    assert(id2.getLong(8) == expect)
    // raw and png lanes agree pixel-for-pixel when fed the same id (the
    // container is the only difference): compare a forced-raw id 1 vs its
    // png twin via the shared formula — both must equal their references,
    // which the asserts above and below pin
    // partitioning must not change results
    val tiny = Multimodal.resizePixels(media, 4, 4, targetBytesPerPartition = 64L)
      .orderBy("media_id").collect()
    assert(rows.sameElements(tiny))
  }

  test("frame sample plan strides over the parsed frame counts") {
    val feats = Seq((1L, "gif", 25L), (2L, "png", 1L), (3L, "gif", 95L))
      .toDF("media_id", "kind", "n_frames")
    val plan = Multimodal.frameSamplePlan(feats, stride = 10)
    val idx = plan.select("frame_indices").as[Seq[Long]].collect()
    assert(idx.length == 2)
    assert(idx.forall(s => s.head == 0L && s.zip(s.tail).forall { case (a, b) => b - a == 10 }))
  }

  test("WAV decode: hand-built PCM16 with an unknown chunk and trailing junk") {
    // RIFF → junk "LIST" chunk (odd size: exercises the pad rule) → fmt →
    // data with samples [100, -100, 32767, -32768] @ 8kHz mono → junk tail
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = le16(v & 0xffff) ++ le16((v >> 16) & 0xffff)
    val fmtC = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val dataC = "data".getBytes ++ le32(8) ++
      le16(100) ++ le16(-100 & 0xffff) ++ le16(32767) ++ le16(-32768 & 0xffff)
    val junk = "LIST".getBytes ++ le32(3) ++ Array[Byte](1, 2, 3, 0) // padded
    val body = "WAVE".getBytes ++ junk ++ fmtC ++ dataC
    val wav = "RIFF".getBytes ++ le32(body.length) ++ body ++ "tail-junk".getBytes
    val m = Multimodal.WavDecoder.parse(
      Multimodal.MediaRow(7L, "audio", wav, wav.length.toLong)).get
    assert(m.channels == 1L && m.sample_rate == 8000L && m.n_frames == 4L)
    assert(m.duration_us == 500L && m.peak_abs == 32768L)
    assert(m.sum_abs == 100L + 100L + 32767L + 32768L)
    assert(m.sum_sq == 100L * 100 * 2 + 32767L * 32767 + 32768L * 32768)
    assert(m.clipped == 2L)
  }

  test("WAV decode: compressed, truncated, and wrong-magic payloads quarantine") {
    def r(b: Array[Byte]) = Multimodal.MediaRow(1L, "audio", b, b.length.toLong)
    assert(Multimodal.WavDecoder.parse(r("not audio at all".getBytes)).isEmpty)
    assert(Multimodal.WavDecoder.parse(r("RIFF   WAVE".getBytes)).isEmpty)
    // a COMPRESSED format (2 = ADPCM) must quarantine, as must widths
    // the formats don't come in (12-bit PCM, 16-bit float) and unknown
    // codes (6 = A-law)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = le16(v & 0xffff) ++ le16((v >> 16) & 0xffff)
    for ((code, bits) <- Seq((2, 4), (3, 16), (1, 12), (6, 8))) {
      val fmtF = "fmt ".getBytes ++ le32(16) ++ le16(code) ++ le16(1) ++
        le32(8000) ++ le32(32000) ++ le16(4) ++ le16(bits)
      val body = "WAVE".getBytes ++ fmtF ++ "data".getBytes ++ le32(0)
      val wav = "RIFF".getBytes ++ le32(body.length) ++ body
      assert(Multimodal.WavDecoder.parse(r(wav)).isEmpty, s"($code,$bits)")
    }
    // adversarial chunk size near Int.MaxValue: `o + 8 + size` wraps
    // negative in Int arithmetic — the Long-math guard must quarantine
    // instead of letting the sample loop run off the array (r7 advice)
    val fmtOk = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val bomb = "data".getBytes ++ le32(0x7ffffff0) ++ le16(1) ++ le16(2)
    val body2 = "WAVE".getBytes ++ fmtOk ++ bomb
    val wav2 = "RIFF".getBytes ++ le32(body2.length) ++ body2
    assert(Multimodal.WavDecoder.parse(r(wav2)).isEmpty)
    // and through decode(): the poisoned row flows as ok=false data
    val out = Multimodal.WavDecoder.decode(Iterator(r(wav2))).toList
    assert(out.length == 1 && !out.head.ok)
  }

  test("WAV decode: 8/24/32-bit PCM, IEEE float and EXTENSIBLE map to the 16-bit stats domain") {
    def r(b: Array[Byte]) = Multimodal.MediaRow(1L, "audio", b, b.length.toLong)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = le16(v & 0xffff) ++ le16((v >> 16) & 0xffff)
    def le24(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte)
    def le64(v: Long) = le32((v & 0xffffffffL).toInt) ++ le32((v >>> 32).toInt)
    def wav(code: Int, bits: Int, data: Array[Byte], ext: Boolean = false): Array[Byte] = {
      val fmtC =
        if (ext) "fmt ".getBytes ++ le32(40) ++ le16(0xfffe) ++ le16(1) ++
          le32(8000) ++ le32(8000 * bits / 8) ++ le16(bits / 8) ++ le16(bits) ++
          le16(22) ++ le16(bits) ++ le32(0) ++ // cbSize, validBits, channelMask
          le16(code) ++ Array.fill(14)(0.toByte) // GUID: code in the first 2 bytes
        else "fmt ".getBytes ++ le32(16) ++ le16(code) ++ le16(1) ++
          le32(8000) ++ le32(8000 * bits / 8) ++ le16(bits / 8) ++ le16(bits)
      val dataC = "data".getBytes ++ le32(data.length) ++ data
      val body = "WAVE".getBytes ++ fmtC ++ dataC
      "RIFF".getBytes ++ le32(body.length) ++ body
    }
    def fbits(f: Float) = le32(java.lang.Float.floatToIntBits(f))
    def dbits(d: Double) = le64(java.lang.Double.doubleToLongBits(d))

    // 8-bit unsigned [128,255,0,129] -> s16 [0,32512,-32768,256]; 0/255 clip
    val m8 = Multimodal.WavDecoder.parse(
      r(wav(1, 8, Array(128, 255, 0, 129).map(_.toByte)))).get
    assert(m8.ok && m8.n_frames == 4L && m8.peak_abs == 32768L && m8.clipped == 2L)
    assert(m8.sum_abs == 32512L + 32768L + 256L)
    assert(m8.sum_sq == 32512L * 32512 + 32768L * 32768 + 256L * 256)
    // 24-bit: top 16 bits survive; native full scale clips
    val m24 = Multimodal.WavDecoder.parse(r(wav(1, 24,
      le24(0x7fffff) ++ le24(-0x800000) ++ le24(0x000100) ++ le24(-0x000100)))).get
    assert(m24.ok && m24.peak_abs == 32768L && m24.clipped == 2L)
    assert(m24.sum_abs == 32767L + 32768L + 1L + 1L)
    // 32-bit
    val m32 = Multimodal.WavDecoder.parse(r(wav(1, 32,
      le32(0x7fffffff) ++ le32(Int.MinValue) ++ le32(0x00010000) ++ le32(-0x00010000)))).get
    assert(m32.ok && m32.peak_abs == 32768L && m32.clipped == 2L)
    assert(m32.sum_abs == 32767L + 32768L + 1L + 1L)
    // float32: clamp to [-1,1], scale 32767, half-up; NaN contributes 0;
    // |f| >= 1.0 is native clipping
    val mf = Multimodal.WavDecoder.parse(r(wav(3, 32,
      fbits(1.0f) ++ fbits(-1.0f) ++ fbits(0.5f) ++ fbits(2.0f) ++ fbits(Float.NaN)))).get
    assert(mf.ok && mf.n_frames == 5L && mf.clipped == 3L)
    assert(mf.peak_abs == 32767L)
    assert(mf.sum_abs == 32767L + 32767L + 16384L + 32767L)
    // float64
    val md = Multimodal.WavDecoder.parse(r(wav(3, 64,
      dbits(0.25) ++ dbits(-0.25) ++ dbits(1.5)))).get
    assert(md.ok && md.clipped == 1L && md.peak_abs == 32767L)
    assert(md.sum_abs == 8192L + 8192L + 32767L)
    // EXTENSIBLE wrapping float32 decodes identically to plain format 3
    val me = Multimodal.WavDecoder.parse(r(wav(3, 32,
      fbits(1.0f) ++ fbits(-1.0f) ++ fbits(0.5f) ++ fbits(2.0f) ++ fbits(Float.NaN),
      ext = true))).get
    assert(me.ok && me.sum_abs == mf.sum_abs && me.sum_sq == mf.sum_sq &&
      me.clipped == mf.clipped)
    // EXTENSIBLE wrapping a compressed sub-format still quarantines
    assert(Multimodal.WavDecoder.parse(r(wav(2, 4, Array.empty, ext = true))).isEmpty)
  }

  test("synthetic audio round-trips through the real RIFF walk exactly") {
    val audio = Multimodal.syntheticAudioFromDocuments(docs)
    val out = Multimodal.decodeAudio(audio)
    assert(out.filter(!col("ok")).count() == 0)
    val row = out.filter(col("media_id") === 3L).head()
    // doc 3: channels 2, rate 8000, frames 19
    assert(row.getLong(2) == 2L && row.getLong(3) == 8000L && row.getLong(4) == 19L)
    assert(row.getLong(5) == 19L * 1000000L / 8000L)
    // spot-check sum_abs against the sample formula on the driver
    val n = 19 * 2
    val ref = (0 until n).map { k =>
      val m = (3L * 31 + k * 17) % 65536
      math.abs(if (m >= 32768) m - 65536 else m)
    }.sum
    assert(row.getLong(7) == ref)
  }

  test("synthetic JPEG lane: the kernel decodes real entropy-coded streams to the id formula") {
    import spark.implicits._
    // ids 0..17 cover every (bw, bh) pair in both gray and color variants
    val jdocs = (0L to 17L).map(i => (i, s"junk text $i")).toDF("doc_id", "text")
    val out = Multimodal.resizePixels(Multimodal.syntheticJpegMedia(jdocs), 12, 12)
      .orderBy("media_id").collect()
    assert(out.length == 18, "every payload must decode (none quarantined)")
    out.foreach { row =>
      val id = row.getLong(0)
      val bw = 1 + (id % 3).toInt; val bh = 1 + ((id / 3) % 3).toInt
      val w = 8 * bw; val h = 8 * bh
      val sc = math.min(math.min(12.0 / w, 12.0 / h), 1.0)
      val ow = math.max(math.floor(w * sc).toInt, 1)
      val oh = math.max(math.floor(h * sc).toInt, 1)
      assert(row.getString(1) == "jpeg")
      assert(row.getLong(2) == w && row.getLong(3) == h)
      assert(row.getLong(4) == ow && row.getLong(5) == oh)
      assert(row.getLong(6) == 1L && row.getLong(7) == ow.toLong * oh * 3)
      var want = 0L; var pos = 0L
      for (y <- 0 until oh; x <- 0 until ow; _ <- 0 until 3) {
        val sx = x * w / ow; val sy = y * h / oh
        val blk = (sy / 8) * bw + (sx / 8)
        val v = 128L + (if (blk % 2 == 0) 8 + (7 * id + 13 * blk) % 8 else 0L)
        want += v * (1 + pos % 97); pos += 1
      }
      assert(row.getLong(8) == want, s"pix_sum mismatch for id=$id")
    }
  }
}
