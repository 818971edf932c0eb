package graft.streaming

import graft.operators.{TextOps, UrlOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming crawl ingestion — the crawl front half run as a STREAM: a
  * micro-batched frame of WARC files flows through the SAME record
  * parse ([[graft.sources.WarcIngest.records]] is streaming-safe: the
  * byte-volume sizing pass is skipped, the per-file record iterator is
  * identical) and the same extract → NFC/cleanup → quality scan stage
  * as the batch pipeline, accumulating a per-domain running rollup as
  * streaming aggregation state.
  *
  * Stream == batch is a BIT-EXACT claim, not an approximation: the
  * rollup is counts and LONG sums (quality in exact micro-units), all
  * order- and batching-invariant, so the `q_stream_crawl` oracle row is
  * the same DuckDB SQL a batch run would check against. The per-domain
  * CAP stays batch-only by design — a rank needs the whole corpus, a
  * running rollup doesn't (the [[CorpusMonitor]] precedent).
  *
  * State bound: one row per live registrable domain — domains-scale,
  * not pages-scale; the heavy lifting (parse, extraction regexes,
  * quality) happens map-side inside each micro-batch before anything
  * touches state.
  */
object CrawlIngest {

  /** Per-domain running `(n_docs, n_tokens, q_micro_sum)` over a
    * streaming [[graft.sources.WarcIngest.records]] frame —
    * complete-mode streaming aggregation.
    */
  def domainRollup(records: DataFrame, minQuality: Double = 0.3): DataFrame = {
    val extracted = records
      .filter(col("ok") && col("http_status") === 200)
      .select(col("target_uri").as("url"),
        TextOps.cleanupStages.foldLeft(TextOps.nfc(TextOps.stripHtml(col("body")))) {
          case (c, (p, r)) => regexp_replace(c, p, r)
        }.as("text"))
    TextOps.withQuality(extracted, tokenCountCol = Some("__graft_ntok"))
      .filter(col("quality") >= minQuality)
      .select(UrlOps.registrableDomain(UrlOps.host(col("url"))).as("domain"),
        col("__graft_ntok").cast("long").as("__graft_ntok"),
        round(col("quality") * 1000000).cast("long").as("__graft_qmicro"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        sum("__graft_ntok").as("n_tokens"),
        sum("__graft_qmicro").as("q_micro_sum"))
  }

  /** The final running table → report shape: exact micro-unit mean, the
    * same projection the batch rollup publishes.
    */
  def report(table: DataFrame): DataFrame =
    table.select(col("domain"), col("n_docs"), col("n_tokens"),
      round(col("q_micro_sum").cast("double") / (col("n_docs") * lit(1000000.0)), 4)
        .as("mean_quality"))
      .orderBy("domain")
}
