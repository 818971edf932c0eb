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
    *
    * The fake is ORACLE-MIRRORABLE on purpose: h is plain integer
    * arithmetic over the unsigned byte sum and length (all values
    * non-negative, so % agrees across engines), which ANSI SQL can
    * replicate — that upgrades the features query from a rows-only check
    * to an exact hash-match.
    */
  object StubDecoder extends Decoder {
    def decode(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = rows.map { r =>
      var s = 0L
      var i = 0
      while (i < r.media.length) { s += (r.media(i) & 0xff); i += 1 }
      val h = s * 31L + r.n_bytes
      val w = (64L + h % 1024L).toInt
      val ht = (64L + (h / 1024L) % 1024L).toInt
      val frames = if (r.kind == "video") (1L + h % 120L).toInt else 1
      val emb = Array.tabulate(8)(i => ((h >> i) & 0xffL).toFloat / 255f)
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

  /** Decode/feature-extract over partition-sized batches, with the shuffle
    * SIZED BY BYTE VOLUME, not row count — the knob that matters at 100 TB
    * where payloads are MBs, not rows: a row-count repartition hands one
    * task a partition of fat videos while another gets thumbnails.
    *
    * Mechanics: one column-pruned scalar aggregate reads Σ n_bytes (the
    * same driver-side statistic AQE itself uses for sizing), the partition
    * count becomes ⌈Σ/targetBytesPerPartition⌉, and rows hash-spread by
    * media_id. With payload ≪ target the per-partition byte sums
    * concentrate tightly around the target (sum of many independent
    * payloads); a single payload larger than the target is indivisible and
    * bounds any scheme. Hash spread beats a range partition on a running
    * byte-sum here: it needs no global sort/prefix-scan pass and is
    * immune to size-clustered input layouts (all big videos adjacent).
    */
  def extractFeatures(media: DataFrame, decoder: Decoder = StubDecoder,
                      targetBytesPerPartition: Long = 128L << 20): DataFrame = {
    // a streaming frame can't run the sizing aggregate (and has no fixed
    // total anyway) — decode with the micro-batch's own partitioning
    val ds: Dataset[MediaRow] =
      if (media.isStreaming) media.as(Encoders.product[MediaRow])
      else {
        val totalBytes = media.agg(sum("n_bytes")).first() match {
          case r if r.isNullAt(0) => 0L
          case r => r.getLong(0)
        }
        // byte sizing gives the UPPER bound on bytes/partition; flooring
        // at cluster parallelism keeps every core busy when the corpus is
        // small (and avoids the degenerate repartition(1) → Exchange
        // SinglePartition that the PlanAuditSpec scale gate bans)
        val nParts = math.max(
          (totalBytes + targetBytesPerPartition - 1) / targetBytesPerPartition,
          media.sparkSession.sparkContext.defaultParallelism.toLong).toInt
        media.as(Encoders.product[MediaRow]).repartition(nParts, col("media_id"))
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
