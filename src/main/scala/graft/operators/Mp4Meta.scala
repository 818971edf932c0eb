package graft.operators

import graft.operators.Multimodal.{Decoder, MediaRow}
import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** MP4 / ISO Base Media File Format (ISO/IEC 14496-12) metadata extraction
  * — the video lane of the multimodal tier. A training pipeline's video
  * stage needs exactly what the moov box already carries: duration, track
  * geometry, codec fourcc, sample count, and the sync-sample (keyframe)
  * table that drives frame sampling — none of which requires touching the
  * mdat payload. The walker is a pure-JVM box parser run through
  * [[Multimodal.decodeBatched]]'s byte-volume partitioning, so a shard of
  * fat videos costs what its bytes cost, not its row count.
  *
  * Spec coverage: 32-bit and 64-bit (`size==1` largesize) boxes,
  * `size==0` (to end-of-enclosure), version 0/1 mvhd/tkhd/mdhd, 16.16
  * fixed-point track geometry, packed ISO-639 mdhd language, stsd codec
  * entries, constant- and table-form stsz, stts run-length sample timing,
  * and stss sync tables (absent table = every sample is sync, per
  * §8.6.2). Unknown/free boxes skip by size. Malformed files quarantine
  * as `ok=false` rows; a torn box never throws the task.
  */
object Mp4Meta {

  /** One row per track, movie-level fields repeated (brand, movie
    * duration). `keyframes` carries the sample numbers of the sync table
    * capped at `maxKeyframes` (the frame-sample plan explodes it).
    */
  case class Mp4Track(media_id: Long, brand: String, movie_duration_us: Long,
                      track_id: Long, handler: String, codec: String,
                      width: Int, height: Int, lang: String,
                      n_samples: Long, n_keyframes: Long,
                      keyframes: Seq[Long], duration_us: Long,
                      ok: Boolean, err: String)

  private val MaxKeyframes = 4096

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** (type, payloadStart, payloadEnd, nextBox) of the box at `p`, bounded
    * by `end`. None when fewer than 8 readable header bytes or the size
    * is inconsistent.
    */
  private def boxAt(b: Array[Byte], p: Int, end: Int): Option[(String, Int, Int, Int)] = {
    if (p + 8 > end) return None
    val size32 = be32(b, p)
    val typ = fourcc(b, p + 4)
    val (payload, boxEnd) =
      if (size32 == 1L) {
        if (p + 16 > end) return None
        val sz = be64(b, p + 8)
        if (sz < 16 || p + sz > end) return None
        (p + 16, p + sz.toInt)
      } else if (size32 == 0L) (p + 8, end) // to end of enclosure
      else {
        if (size32 < 8 || p + size32 > end) return None
        (p + 8, p + size32.toInt)
      }
    Some((typ, payload, boxEnd, boxEnd))
  }

  private def children(b: Array[Byte], from: Int, end: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var p = from
    var ok = true
    while (ok && p < end) boxAt(b, p, end) match {
      case Some((t, s, e, n)) => out += ((t, s, e)); p = n
      case None => ok = false
    }
    out.result()
  }

  private def child(b: Array[Byte], from: Int, end: Int, typ: String): Option[(Int, Int)] =
    children(b, from, end).collectFirst { case (t, s, e) if t == typ => (s, e) }

  /** µs from (duration, timescale) in integer math — duration·1e6 first
    * would overflow a 64-bit µs count only past ~584 kyears of video.
    */
  private def toUs(dur: Long, scale: Long): Long =
    if (scale <= 0) -1L else dur * 1000000L / scale

  private[graft] def parse(mediaId: Long, b: Array[Byte]): Seq[Mp4Track] = {
    def fail(msg: String) = Seq(Mp4Track(mediaId, "", -1L, -1L, "", "", -1, -1,
      "", -1L, -1L, Nil, -1L, ok = false, err = msg))
    try {
      val top = children(b, 0, b.length)
      if (top.isEmpty) return fail("no boxes")
      val brand = top.collectFirst { case ("ftyp", s, e) if e - s >= 4 => fourcc(b, s) }
        .getOrElse("")
      val moov = top.collectFirst { case ("moov", s, e) => (s, e) }
        .getOrElse(return fail("no moov box"))

      val movieUs = child(b, moov._1, moov._2, "mvhd").map { case (s, e) =>
        val v = b(s) & 0xff
        // every fixed-layout read is bounds-checked against the BOX end:
        // reads past a box land in sibling bytes and fabricate silent
        // garbage long before they ever leave the file array
        require(e - s >= (if (v == 1) 32 else 20), "mvhd too short")
        if (v == 1) toUs(be64(b, s + 24), be32(b, s + 20))
        else toUs(be32(b, s + 16), be32(b, s + 12))
      }.getOrElse(-1L)

      val traks = children(b, moov._1, moov._2).filter(_._1 == "trak")
      if (traks.isEmpty) return fail("no trak boxes")
      traks.map { case (_, ts, te) =>
        val (trackId, w, h) = child(b, ts, te, "tkhd").map { case (s, e) =>
          val v = b(s) & 0xff
          require(e - s >= (if (v == 1) 96 else 84), "tkhd too short")
          val idOff = if (v == 1) s + 20 else s + 12
          // width/height are the LAST 8 payload bytes (16.16 fixed)
          val geomOff = if (v == 1) s + 88 else s + 76
          (be32(b, idOff), (be32(b, geomOff) >> 16).toInt,
            (be32(b, geomOff + 4) >> 16).toInt)
        }.getOrElse((-1L, -1, -1))

        val mdia = child(b, ts, te, "mdia")
        val (trackUs, lang) = mdia.flatMap { case (ms, me) =>
          child(b, ms, me, "mdhd").map { case (s, e) =>
            val v = b(s) & 0xff
            require(e - s >= (if (v == 1) 36 else 24), "mdhd too short")
            val (scale, dur, langOff) =
              if (v == 1) (be32(b, s + 20), be64(b, s + 24), s + 32)
              else (be32(b, s + 12), be32(b, s + 16), s + 20)
            val packed = be16(b, langOff)
            val l = new String(Array(
              ('`' + ((packed >> 10) & 0x1f)).toChar,
              ('`' + ((packed >> 5) & 0x1f)).toChar,
              ('`' + (packed & 0x1f)).toChar))
            (toUs(dur, scale), if (l == "```") "" else l)
          }
        }.getOrElse((-1L, ""))

        val handler = mdia.flatMap { case (ms, me) =>
          child(b, ms, me, "hdlr").map { case (s, e) =>
            require(e - s >= 12, "hdlr too short"); fourcc(b, s + 8) }
        }.getOrElse("")

        val stbl = mdia.flatMap { case (ms, me) => child(b, ms, me, "minf") }
          .flatMap { case (ns, ne) => child(b, ns, ne, "stbl") }

        val codec = stbl.flatMap { case (ss, se) =>
          child(b, ss, se, "stsd").collect {
            // bounds BEFORE the entry-count read: a truncated stsd at
            // end-of-file must yield the per-field default, not ride the
            // blanket AIOOBE catch into a whole-file quarantine
            case (s, e) if s + 16 <= e && be32(b, s + 4) > 0 => fourcc(b, s + 12)
          }
        }.getOrElse("")

        val nSamples = stbl.flatMap { case (ss, se) =>
          child(b, ss, se, "stsz").map { case (s, e) =>
            require(e - s >= 12, "stsz too short"); be32(b, s + 8) }
        }.getOrElse(-1L)

        val keyframes = stbl.flatMap { case (ss, se) =>
          child(b, ss, se, "stss").map { case (s, e) =>
            val n = be32(b, s + 4).toInt
            // a count overrunning the box would read sibling bytes as
            // sample numbers — fabricated keyframes with ok=true
            require(n >= 0 && 8L + 4L * n <= e - s, "stss count overruns box")
            (0 until math.min(n, MaxKeyframes)).map(i => be32(b, s + 8 + 4 * i))
          }
        }
        val nKey = stbl.flatMap { case (ss, se) => child(b, ss, se, "stss") }
          .map { case (s, _) => be32(b, s + 4) }
          .getOrElse(nSamples) // no stss ⇒ every sample is a sync sample

        Mp4Track(mediaId, brand, movieUs, trackId, handler, codec, w, h, lang,
          nSamples, nKey,
          keyframes.getOrElse(Nil).map(_.toLong), trackUs, ok = true, err = "")
      }
    } catch {
      case e: ArrayIndexOutOfBoundsException => fail(s"truncated box: ${e.getMessage}")
      case e: Exception => fail(s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  object Mp4Decoder extends Decoder[Mp4Track] {
    def decode(rows: Iterator[MediaRow]): Iterator[Mp4Track] =
      rows.flatMap(r => parse(r.media_id, r.media))
  }

  /** Track metadata for every payload, byte-volume partitioned;
    * `ok=false` rows are the quarantine lane.
    */
  def videoMeta(media: DataFrame,
                targetBytesPerPartition: Long = 128L << 20): DataFrame =
    Multimodal.decodeBatched(media, Mp4Decoder, targetBytesPerPartition)(
      Encoders.product[Mp4Track]).toDF()

  /** The video frame-sample plan: one row per kept keyframe — every
    * `stride`-th entry of each video track's sync table. Pure explode on
    * the parsed rows; downstream GPU decode reads ONLY these samples.
    */
  def keyframeSamplePlan(meta: DataFrame, stride: Int = 1): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    meta.filter(col("ok") && col("handler") === "vide")
      .select(col("media_id"), col("track_id"),
        posexplode(col("keyframes")).as(Seq("pos", "sample_no")))
      .filter(col("pos") % stride === 0)
      .select(col("media_id"), col("track_id"),
        (col("pos") / stride).cast("long").as("k_idx"), col("sample_no"))
  }

  // ---- synthetic fixture -------------------------------------------------

  private def hexBe32(v: Column): Column = lpad(hex(v.cast("long")), 8, "0")
  private def hexBe16(v: Column): Column = lpad(hex(v.cast("long")), 4, "0")
  private def hex4cc(s: String): String =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
      .map(x => f"$x%02X").mkString

  /** A full box as hex: 32-bit size computed from the payload. */
  private def box(typ: String, payloadHex: Column): Column =
    concat(hexBe32(length(payloadHex) / 2 + 8), lit(hex4cc(typ)), payloadHex)

  /** Deterministic id-derived MP4 files over the documents table (the
    * established synthetic-fixture pattern): a spec-valid isom file with
    * one video track — ftyp, mvhd (movie duration in ms ticks), tkhd
    * (16.16 geometry), mdhd (und language, 90kHz ticks), hdlr(vide),
    * stsd(avc1 stub entry), stts, constant-size stsz, stsc/stco, and an
    * every-12th-sample stss sync table whose length varies by id. The
    * doc text trails INSIDE mdat so the walker must skip by size, and
    * every numeric field is id arithmetic the oracle can replay.
    */
  def syntheticMp4FromDocuments(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val durMs = lit(5000L) + (id % 20L) * 1000L      // movie duration, ms ticks
    val w = lit(320L) + (id % 8L) * 16L
    val h = lit(240L) + (id % 6L) * 16L
    val nSamples = lit(24L) + id % 48L
    val nKey = floor((nSamples + 11L) / 12L).cast("long") // samples 1, 13, 25, …

    val ftyp = box("ftyp", concat(lit(hex4cc("isom")), hexBe32(lit(512L)),
      lit(hex4cc("isom")), lit(hex4cc("mp42"))))

    val mvhd = box("mvhd", concat(
      hexBe32(lit(0L)),            // version 0, flags
      hexBe32(lit(0L)), hexBe32(lit(0L)), // creation, modification
      hexBe32(lit(1000L)),         // timescale: ms
      hexBe32(durMs),              // duration
      hexBe32(lit(0x00010000L)), hexBe16(lit(0x0100L)), hexBe16(lit(0L)), // rate, volume, reserved
      hexBe32(lit(0L)), hexBe32(lit(0L)), // reserved
      // unity matrix
      hexBe32(lit(0x00010000L)), hexBe32(lit(0L)), hexBe32(lit(0L)),
      hexBe32(lit(0L)), hexBe32(lit(0x00010000L)), hexBe32(lit(0L)),
      hexBe32(lit(0L)), hexBe32(lit(0L)), hexBe32(lit(0x40000000L)),
      concat_ws("", (1 to 6).map(_ => hexBe32(lit(0L))): _*), // pre_defined
      hexBe32(lit(2L))))           // next track id

    val tkhd = box("tkhd", concat(
      hexBe32(lit(7L)),            // version 0, flags: enabled|movie|preview
      hexBe32(lit(0L)), hexBe32(lit(0L)),
      hexBe32(lit(1L)),            // track id
      hexBe32(lit(0L)), hexBe32(durMs), // reserved, duration (movie ticks)
      hexBe32(lit(0L)), hexBe32(lit(0L)), // reserved
      hexBe16(lit(0L)), hexBe16(lit(0L)), hexBe16(lit(0L)), hexBe16(lit(0L)), // layer, group, volume, reserved
      hexBe32(lit(0x00010000L)), hexBe32(lit(0L)), hexBe32(lit(0L)),
      hexBe32(lit(0L)), hexBe32(lit(0x00010000L)), hexBe32(lit(0L)),
      hexBe32(lit(0L)), hexBe32(lit(0L)), hexBe32(lit(0x40000000L)),
      hexBe32(shiftleft(w, 16)), hexBe32(shiftleft(h, 16)))) // 16.16

    // 90 kHz media ticks: duration = durMs * 90
    val mdhd = box("mdhd", concat(
      hexBe32(lit(0L)), hexBe32(lit(0L)), hexBe32(lit(0L)),
      hexBe32(lit(90000L)), hexBe32(durMs * 90L),
      hexBe16(lit(0x55C4L)), hexBe16(lit(0L)))) // 'und', pre_defined

    val hdlr = box("hdlr", concat(
      hexBe32(lit(0L)), hexBe32(lit(0L)), lit(hex4cc("vide")),
      concat_ws("", (1 to 3).map(_ => hexBe32(lit(0L))): _*),
      lit(hex4cc("vhdl")), lit("00"))) // name: "vhdl\0"

    // minimal avc1 entry: 8-byte entry header + 78-byte sample-entry body
    val avc1Body = concat(lit(hex4cc("avc1")),
      concat_ws("", (1 to 19).map(_ => hexBe32(lit(0L))): _*), hexBe16(lit(0L)))
    val stsd = box("stsd", concat(
      hexBe32(lit(0L)), hexBe32(lit(1L)),
      // sample-entry size field covers itself (4) + the entry incl. 4cc
      hexBe32(length(avc1Body) / 2 + 4), avc1Body))

    val stts = box("stts", concat(hexBe32(lit(0L)), hexBe32(lit(1L)),
      hexBe32(nSamples), hexBe32(durMs * 90L / nSamples)))
    val stsz = box("stsz", concat(hexBe32(lit(0L)),
      hexBe32(lit(4096L)), hexBe32(nSamples))) // constant sample size
    val stsc = box("stsc", concat(hexBe32(lit(0L)), hexBe32(lit(1L)),
      hexBe32(lit(1L)), hexBe32(nSamples), hexBe32(lit(1L))))
    val stco = box("stco", concat(hexBe32(lit(0L)), hexBe32(lit(1L)),
      hexBe32(lit(0L))))
    val stss = box("stss", concat(hexBe32(lit(0L)), hexBe32(nKey),
      array_join(transform(sequence(lit(0L), nKey - 1L),
        i => hexBe32(i * 12L + 1L)), "")))

    val stbl = box("stbl", concat(stsd, stts, stsc, stsz, stco, stss))
    val vmhd = box("vmhd", concat(hexBe32(lit(1L)), hexBe32(lit(0L)), hexBe32(lit(0L))))
    val minf = box("minf", concat(vmhd, stbl))
    val mdia = box("mdia", concat(mdhd, hdlr, minf))
    val trak = box("trak", concat(tkhd, mdia))
    val moov = box("moov", concat(mvhd, trak))

    docs.select(id.as("media_id"), lit("video").as("kind"),
      concat(unhex(concat(ftyp, moov)),
        // mdat payload: the doc text — the walker must skip it by size
        unhex(hexBe32(octet_length(col("text")) + 8)), unhex(lit(hex4cc("mdat"))),
        encode(col("text"), "UTF-8")).as("media"))
      .withColumn("n_bytes", octet_length(col("media")).cast("long"))
  }
}
