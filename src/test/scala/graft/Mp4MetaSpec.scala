package graft

import java.io.ByteArrayOutputStream

import graft.operators.Mp4Meta
import org.apache.spark.sql.functions._

class Mp4MetaSpec extends SparkSuite {
  import spark.implicits._

  // -- a tiny independent muxer (not the fixture's hex-Column assembly) --
  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xffffffffL)
  private def cc(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  private def mkBox(typ: String, payload: Array[Byte], large: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    if (large) { out.write(be32(1)); out.write(cc(typ)); out.write(be64(16L + payload.length)) }
    else { out.write(be32(8L + payload.length)); out.write(cc(typ)) }
    out.write(payload)
    out.toByteArray
  }

  private def fullBox(typ: String, version: Int, body: Array[Byte]): Array[Byte] =
    mkBox(typ, Array[Byte](version.toByte, 0, 0, 0) ++ body)

  private def mvhdV1(timescale: Long, duration: Long): Array[Byte] =
    fullBox("mvhd", 1, be64(0) ++ be64(0) ++ be32(timescale) ++ be64(duration) ++
      Array.fill[Byte](80)(0))

  private def mdhdV1(timescale: Long, duration: Long, lang: Int): Array[Byte] =
    fullBox("mdhd", 1, be64(0) ++ be64(0) ++ be32(timescale) ++ be64(duration) ++
      be16(lang) ++ be16(0))

  private def tkhdV1(trackId: Long, w: Int, h: Int): Array[Byte] =
    fullBox("tkhd", 1, be64(0) ++ be64(0) ++ be32(trackId) ++ be32(0) ++ be64(0) ++
      // reserved(8) + layer/group/volume/reserved(8) + matrix(36)
      Array.fill[Byte](52)(0) ++ be32(w.toLong << 16) ++ be32(h.toLong << 16))

  private def hdlr(handler: String): Array[Byte] =
    fullBox("hdlr", 0, be32(0) ++ cc(handler) ++ Array.fill[Byte](12)(0) ++ Array[Byte](0))

  private def stsd(codec: String): Array[Byte] =
    fullBox("stsd", 0, be32(1) ++ be32(16) ++ cc(codec) ++ Array.fill[Byte](8)(0))

  private def stsz(n: Long): Array[Byte] = fullBox("stsz", 0, be32(0) ++ be32(n))
  private def stss(samples: Seq[Long]): Array[Byte] =
    fullBox("stss", 0, be32(samples.length.toLong) ++ samples.flatMap(be32).toArray)

  private def track(trackId: Long, handler: String, codec: String, w: Int, h: Int,
                    nSamples: Long, sync: Option[Seq[Long]],
                    mediaScale: Long = 90000, mediaDur: Long = 900000,
                    lang: Int = 0x55C4): Array[Byte] = {
    val stbl = mkBox("stbl", stsd(codec) ++ stsz(nSamples) ++
      sync.map(stss).getOrElse(Array.empty[Byte]))
    val minf = mkBox("minf", stbl)
    val mdia = mkBox("mdia", mdhdV1(mediaScale, mediaDur, lang) ++ hdlr(handler) ++ minf)
    mkBox("trak", tkhdV1(trackId, w, h) ++ mdia)
  }

  private def mp4(tracks: Array[Byte]*): Array[Byte] =
    mkBox("ftyp", cc("mp41") ++ be32(0)) ++
      mkBox("moov", mvhdV1(1000, 12000) ++ tracks.flatten.toArray) ++
      mkBox("mdat", "payload-bytes".getBytes("UTF-8"))

  test("two-track v1 file: geometry, codecs, language, durations") {
    val f = mp4(
      track(1, "vide", "avc1", 1920, 1080, 300, Some(Seq(1, 31, 61))),
      track(2, "soun", "mp4a", 0, 0, 4000, None, mediaScale = 48000,
        mediaDur = 480000, lang = (5 << 10) | (14 << 5) | 7)) // "eng"
    val rows = Mp4Meta.parse(9L, f)
    assert(rows.length == 2 && rows.forall(_.ok))
    val v = rows.find(_.handler == "vide").get
    assert(v.brand == "mp41" && v.movie_duration_us == 12000000L)
    assert(v.track_id == 1L && v.codec == "avc1" && v.width == 1920 && v.height == 1080)
    assert(v.n_samples == 300 && v.n_keyframes == 3 && v.keyframes == Seq(1L, 31L, 61L))
    assert(v.duration_us == 10000000L && v.lang == "und")
    val a = rows.find(_.handler == "soun").get
    assert(a.codec == "mp4a" && a.duration_us == 10000000L && a.lang == "eng")
    // no stss ⇒ every sample is sync (spec 8.6.2)
    assert(a.n_keyframes == 4000 && a.keyframes.isEmpty)
  }

  test("64-bit largesize boxes and size==0 (to end) parse") {
    val inner = mvhdV1(1000, 7000) ++ track(1, "vide", "hvc1", 640, 480, 10, None)
    val moovLarge = mkBox("moov", inner, large = true)
    // size==0 mdat must terminate at end-of-file without looping
    val zeroSize = be32(0) ++ cc("mdat") ++ "tail".getBytes("UTF-8")
    val f = mkBox("ftyp", cc("isom") ++ be32(0)) ++ moovLarge ++ zeroSize
    val rows = Mp4Meta.parse(1L, f)
    assert(rows.length == 1 && rows.head.ok)
    assert(rows.head.codec == "hvc1" && rows.head.movie_duration_us == 7000000L)
  }

  test("malformed files quarantine: no moov, truncated, junk") {
    assert(Mp4Meta.parse(1L, "notanmp4".getBytes("UTF-8")).forall(!_.ok))
    val noMoov = mkBox("ftyp", cc("isom") ++ be32(0))
    assert(Mp4Meta.parse(1L, noMoov).head.err == "no moov box")
    val torn = mp4(track(1, "vide", "avc1", 64, 64, 5, None)).dropRight(40)
    // either parses what remains or quarantines — must not throw
    Mp4Meta.parse(1L, torn)
    // an stss count overrunning its box must quarantine, not fabricate
    // keyframes from sibling-box bytes
    val lying = mp4(track(1, "vide", "avc1", 64, 64, 9,
      Some(Seq(1L, 4L, 7L))))
    val at = {
      // locate the stss box and corrupt its entry count to 9999
      val idx = (0 until lying.length - 4)
        .find(i => new String(lying.slice(i, i + 4), "ISO-8859-1") == "stss").get
      idx + 8 // version/flags(4) then count
    }
    val corrupt = lying.clone()
    corrupt(at) = 0; corrupt(at + 1) = 0; corrupt(at + 2) = 0x27; corrupt(at + 3) = 0x0f.toByte
    val rows = Mp4Meta.parse(1L, corrupt)
    assert(rows.forall(!_.ok) && rows.head.err.contains("stss"))
    // a tiny stsd as the LAST bytes of the file (header only, no entry —
    // and no mdat after it) must yield the per-field codec default, not
    // an out-of-bounds entry-count read that the blanket catch would
    // downgrade to a whole-file quarantine
    val tinyStsd = {
      val stblT = mkBox("stbl", stsz(5) ++ fullBox("stsd", 0, Array.emptyByteArray))
      val minfT = mkBox("minf", stblT)
      val mdiaT = mkBox("mdia", mdhdV1(90000, 900000, 0x55C4) ++ hdlr("vide") ++ minfT)
      mkBox("ftyp", cc("mp41") ++ be32(0)) ++
        mkBox("moov", mvhdV1(1000, 12000) ++ mkBox("trak", tkhdV1(1, 64, 64) ++ mdiaT))
    }
    val tiny = Mp4Meta.parse(1L, tinyStsd)
    assert(tiny.nonEmpty && tiny.head.ok && tiny.head.codec == "",
      s"tiny stsd: ok=${tiny.headOption.map(_.ok)} err=${tiny.headOption.map(_.err)}")
  }

  test("keyframe sample plan: stride filters the sync table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val meta = Mp4Meta.videoMeta(Mp4Meta.syntheticMp4FromDocuments(docs)).cache()
    try {
      assert(meta.filter(!col("ok")).count() == 0)
      assert(meta.count() == docs.count())
      // fixture arithmetic: n_keyframes = ceil(n_samples / 12)
      val bad = meta.filter(col("n_keyframes") =!=
        floor((col("n_samples") + 11) / 12).cast("long"))
      assert(bad.count() == 0)
      val plan = Mp4Meta.keyframeSamplePlan(meta, stride = 2)
      val full = Mp4Meta.keyframeSamplePlan(meta, stride = 1)
      val nPlan = plan.count()
      val nFull = full.count()
      assert(nPlan > 0 && nPlan == full.filter(col("k_idx") % 2 === 0).count())
      assert(nFull == meta.agg(sum("n_keyframes")).as[Long].head())
      // sample numbers are the 1, 13, 25, … schedule
      assert(full.filter((col("sample_no") - 1) % 12 =!= 0).count() == 0)
    } finally meta.unpersist()
  }

  test("synthetic fixture is spec-valid through the distributed walker") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val meta = Mp4Meta.videoMeta(Mp4Meta.syntheticMp4FromDocuments(docs))
      .filter(col("ok"))
    val m = meta.filter(col("media_id") === 7).collect().head
    assert(m.getAs[String]("brand") == "isom" && m.getAs[String]("codec") == "avc1")
    assert(m.getAs[Long]("movie_duration_us") == (5000L + 7 % 20 * 1000L) * 1000L)
    assert(m.getAs[Int]("width") == 320 + (7 % 8) * 16)
    assert(m.getAs[Int]("height") == 240 + (7 % 6) * 16)
    assert(m.getAs[String]("handler") == "vide" && m.getAs[String]("lang") == "und")
  }
}
