package graft.streaming

import graft.operators.TextOps
import graft.sources.JsonlDocs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous document curation — the streaming face of the batch
  * pipeline (`Curation.report`): JSONL lines → parse/quarantine →
  * quality gate → bounded-state exact dedup. What a live ingest side of
  * a training-data platform runs so junk and duplicates never reach
  * storage; the batch operators (keep-lists, near-dup tiers, sampling)
  * run downstream over the stored corpus.
  *
  * Everything stateless is a scan-stage column expression (the native
  * TextSignalExpressions byte scans — identical arithmetic to the batch
  * quality score); the ONLY state is the watermark-bounded dedup
  * fingerprint table (see [[StreamDedup]] for why
  * `dropDuplicatesWithinWatermark`, and what recall it trades).
  */
object DocPipeline {

  /** Curate a stream of raw JSONL document lines.
    *
    * @param lines        streaming frame with a `line` STRING column and
    *                     an event-time column named `eventTimeCol`
    * @param minQuality   quality-score gate (same composite as batch)
    * @param watermark    dedup state horizon
    * @return the curated stream: canonical document columns + quality
    */
  def curate(lines: DataFrame, eventTimeCol: String,
             minQuality: Double = 0.5,
             watermark: String = "10 minutes"): DataFrame = {
    val parsed = JsonlDocs.fromLines(lines,
      passthrough = Seq(eventTimeCol),
      // stream-safe missing-id fallback: the batch default is a window
      // (unsupported on streams); content+arrival-time hash is stable
      // under replay of the same micro-batch
      idFallback = Some(xxhash64(col("text"), col(eventTimeCol).cast("long"))))
      .good // quarantine drops out of the stream; count it via the batch path
    val scored = TextOps.withQuality(parsed)
      .filter(col("quality") >= minQuality)
    StreamDedup.dedupByContent(scored, eventTimeCol, watermark = watermark)
      .drop("content_hash")
  }
}
