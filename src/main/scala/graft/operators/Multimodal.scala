package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (driver north star): media as opaque BINARY
  * plus typed metadata, with batch-shaped decode/feature-extract hooks.
  *
  * The image/audio codecs are NOT in this container, so the decode kernel is
  * a clearly-marked STUB (deterministic fake derived from the bytes). The
  * Spark-side plumbing — schema, partition-sized batching, decode signature,
  * columnar handoff — is real and tested; swapping `StubDecoder` for a
  * JNI/FFmpeg/ImageIO-backed decoder changes no plan shape.
  */
object Multimodal {

  /** Media row: opaque payload + source metadata. */
  case class MediaRow(media_id: Long, kind: String, media: Array[Byte], n_bytes: Long)

  /** Extracted features (what a real decoder would emit per item). */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           width: Int, height: Int, n_frames: Int,
                           embedding: Array[Float])

  /** Decoder contract: one batch of payloads in, one batch of features out.
    * Batch-shaped (Iterator→Iterator) so implementations can amortize
    * codec/context setup per partition — mapInPandas-style, JVM-native.
    */
  trait Decoder extends Serializable {
    def decode(rows: Iterator[MediaRow]): Iterator[MediaFeatures]
  }

  /** STUB: deterministic fake decode — dimensions and a tiny "embedding"
    * derived from byte statistics. Replace with a real codec off-container.
    * ??? -- real decode is stubbed; everything below this call is real.
    */
  object StubDecoder extends Decoder {
    def decode(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = rows.map { r =>
      val h = java.util.Arrays.hashCode(r.media)
      val w = 64 + math.abs(h % 1024)
      val ht = 64 + math.abs((h / 1024) % 1024)
      val frames = if (r.kind == "video") 1 + math.abs(h % 120) else 1
      val emb = Array.tabulate(8)(i => ((h >> i) & 0xff).toFloat / 255f)
      MediaFeatures(r.media_id, r.kind, r.n_bytes, w, ht, frames, emb)
    }
  }

  /** Build a media table from the documents corpus: the text bytes stand in
    * for an image/audio payload (same plumbing, fake modality).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("media"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))

  /** Decode/feature-extract over partition-sized batches. Repartitions by
    * byte volume first so one fat video can't skew a task — the knob that
    * matters at 100 TB where payloads are MBs not rows.
    */
  def extractFeatures(media: DataFrame, decoder: Decoder = StubDecoder,
                      targetPartitions: Int = 0): DataFrame = {
    val ds: Dataset[MediaRow] = {
      val base = media.as(Encoders.product[MediaRow])
      if (targetPartitions > 0) base.repartition(targetPartitions) else base
    }
    ds.mapPartitions(rows => decoder.decode(rows))(Encoders.product[MediaFeatures])
      .toDF()
  }

  /** Frame sampling plan for video payloads: every `stride`-th frame index,
    * computed from (stubbed) frame counts — pure column math, no decode.
    */
  def frameSamplePlan(features: DataFrame, stride: Int): DataFrame =
    features.filter(col("kind") === "video")
      .select(col("media_id"),
        sequence(lit(0), col("n_frames") - 1, lit(stride)).as("frame_indices"))
}
