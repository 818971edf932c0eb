package graft.streaming

import graft.model.Canon._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-Streaming windowed aggregation over the canonical stream —
  * the beyond-parity generalization of the reference's global aggregates
  * (the reference has no windows or late-data policy at all; its
  * overlap-merge compaction is effectively unbounded lateness,
  * SURVEY.md §2.10).
  *
  * Event time = timestamp_micros(ts_us); the watermark bounds state for
  * exactly-once windowed results under out-of-order arrival — the
  * principled replacement for the reference's "merge whatever overlaps"
  * approach, with state that is bounded instead of a full-store rewrite.
  */
object WindowedAggs {

  /** Session windows per key under a watermark — the streaming analog of
    * the batch 30-min-gap sessionization (q_sessionize). State per key is
    * one open session bounded by the watermark, not the full history.
    *
    * Gap semantics: the batch rule starts a new session when
    * `gap > gapUs` (an event EXACTLY gapUs later continues the session),
    * while `session_window` merges on STRICT `<` of the next event against
    * window end — so the window gap is gapUs + 1 µs to make the two rules
    * coincide.
    */
  def sessionsByKey(stream: DataFrame, keyCol: String,
                    gapUs: Long = 1800000000L,
                    watermark: String = "10 minutes"): DataFrame = {
    val withEventTime = stream
      .withColumn("event_time", timestamp_micros(col(TS_US)))
      .withWatermark("event_time", watermark)
    withEventTime
      .groupBy(col(keyCol),
        session_window(col("event_time"), s"${gapUs + 1} microseconds").as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col(VALUE)).as("sum_value"))
      .select(col(keyCol),
        unix_micros(col("w.start")).as("sess_start_us"),
        col("n_events"), col("sum_value"))
  }

  /** Tumbling/sliding per-series window counts+sums+means over a streaming
    * canonical DataFrame (works identically on a batch frame, Spark's
    * unified semantics — handy for tests and backfills).
    */
  def bySeriesWindow(stream: DataFrame, window_ : String, slide: Option[String] = None,
                     watermark: String = "10 minutes"): DataFrame = {
    val withEventTime = stream
      .withColumn("event_time", timestamp_micros(col(TS_US)))
      .withWatermark("event_time", watermark)
    val win = slide match {
      case Some(s) => window(col("event_time"), window_, s)
      case None    => window(col("event_time"), window_)
    }
    withEventTime
      .groupBy(col(SERIES), win.as("w"))
      .agg(count(lit(1)).as("n"), sum(col(VALUE)).as("sum"), avg(col(VALUE)).as("mean"))
      .select(col(SERIES), col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("n"), col("sum"), col("mean"))
  }
}
