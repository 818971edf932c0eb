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
    val k = new Multimodal.StubResizeKernel(224, 224)
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

  test("frame sample plan strides over the parsed frame counts") {
    val feats = Seq((1L, "gif", 25L), (2L, "png", 1L), (3L, "gif", 95L))
      .toDF("media_id", "kind", "n_frames")
    val plan = Multimodal.frameSamplePlan(feats, stride = 10)
    val idx = plan.select("frame_indices").as[Seq[Long]].collect()
    assert(idx.length == 2)
    assert(idx.forall(s => s.head == 0L && s.zip(s.tail).forall { case (a, b) => b - a == 10 }))
  }
}
