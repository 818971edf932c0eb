package graft.streaming

import graft.operators.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus monitoring — the drift report's ingestion half run
  * as a STREAM: per-(source, term) token counts accumulate as streaming
  * aggregation state across micro-batches (complete output mode emits
  * the full running table each trigger), and the final table feeds
  * [[TextOps.driftFromTermCounts]] — the identical capped-vocab matrix
  * the batch report computes, so the streaming path sits under the SAME
  * exact oracle as `q_drift`.
  *
  * This is the corpus-assembly monitoring loop a production pipeline
  * runs while a crawl lands: counts are exact integers however the
  * stream batches them (micro-batch boundaries are invisible to a sum),
  * so "stream result == batch result" is a bit-exact claim, not an
  * approximation.
  *
  * State bound: one row per live (source, term) pair — vocabulary-scale,
  * not corpus-scale (the same reason the batch report's matrix is
  * #sources × (V+1): token COUNTS compress the corpus by orders of
  * magnitude before anything expensive happens).
  */
object CorpusMonitor {

  /** Running `(src, term, c)` counts over a streaming documents frame —
    * complete-mode streaming aggregation, the canonical input of
    * [[TextOps.driftFromTermCounts]].
    */
  def runningTermCounts(stream: DataFrame, textCol: String = "text",
                        groupCol: String = "source"): DataFrame =
    stream
      .select(col(groupCol).as("src"),
        explode(TextOps.tokens(lower(col(textCol)))).as("term"))
      .groupBy("src", "term").agg(count(lit(1)).as("c"))
}
