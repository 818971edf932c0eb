package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup — keep the FIRST occurrence of each content
  * fingerprint (the streaming analog of `Dedup.exact`; what a continuous
  * ingest pipeline runs so duplicates never reach storage).
  *
  * `dropDuplicatesWithinWatermark` is the scale-bearing choice: state
  * holds a fingerprint only while a duplicate could still arrive within
  * the watermark delay, then expires it — so an unbounded-key stream
  * (100 TB of documents has ~billions of distinct fingerprints) cannot
  * accumulate unbounded dedup state, which plain `dropDuplicates` on a
  * stream would. Within-watermark duplicates are removed exactly; a
  * duplicate arriving after its original's state expired passes through —
  * the documented recall trade every bounded-state streaming dedup makes.
  * A periodic batch `Dedup.exact` compaction downstream closes that gap.
  */
object StreamDedup {

  /** Dedup a document stream by content hash. `eventTimeCol` must be a
    * timestamp column (the watermark clock).
    */
  def dedupByContent(stream: DataFrame, eventTimeCol: String,
                     textCol: String = "text",
                     watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
