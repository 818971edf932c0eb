package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable sketch aggregates — the 100 TB shape for distinct counts.
  *
  * At scale one does NOT rescan raw data per distinct-count query: each
  * shard/day partition stores a tiny pre-aggregated sketch, and a query
  * merges sketches (associative, commutative) instead of touching rows —
  * turning a corpus-wide scan into a metadata-sized aggregation. Spark's
  * Datasketches HLL functions provide exactly this algebra; these
  * helpers pin the two halves of the pattern (pre-aggregate, then
  * merge-estimate) and the equivalence is unit-tested: sketches built on
  * disjoint splits and merged estimate IDENTICALLY to a sketch built in
  * one pass (`SketchesSpec`).
  */
object Sketches {

  /** Per-key HLL sketch (Datasketches binary) — what a shard would
    * persist next to its parquet at ingest time.
    */
  def hllByKey(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy(col(keyCol).as("key"))
      .agg(hll_sketch_agg(col(valCol)).as("sketch"))

  /** Merge per-shard sketches and estimate — the query-time path; never
    * touches the raw rows.
    */
  def hllMergeEstimate(sketches: DataFrame): DataFrame =
    sketches.groupBy(col("key"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("n_approx"))
}
