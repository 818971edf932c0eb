package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity QA for an id-aligned table pair — the check a
  * training-data pipeline runs before joining documents to their
  * embeddings (or captions to images): row counts, duplicate-id counts,
  * and orphans in each direction, as ONE summary row of plain integers.
  *
  * Scale shape: both sides reduce to (id, multiplicity) with map-side
  * partial aggregation BEFORE the join — the shuffle moves one slim row
  * per DISTINCT id, never payloads. The comparison is a single
  * full-outer merge on id (full outer cannot broadcast, so no AQE
  * surprise at any SF; on the bucketed production layout the exchanges
  * vanish entirely — BucketedLayoutSpec) followed by a global aggregate
  * whose SinglePartition exchange carries a handful of pre-aggregated
  * rows per partition.
  */
object Integrity {

  /** One row: n_left / n_left_ids / n_left_dup_ids / n_left_orphans and
    * the right-side mirror. `*_orphans` = distinct ids present on one
    * side only; `*_dup_ids` = distinct ids appearing more than once on
    * that side (a join against them would fan out).
    */
  def report(left: DataFrame, right: DataFrame,
             leftId: String, rightId: String): DataFrame = {
    val l = left.select(col(leftId).as("id")).groupBy("id")
      .agg(count(lit(1)).as("ln"))
    val r = right.select(col(rightId).as("id")).groupBy("id")
      .agg(count(lit(1)).as("rn"))
    l.join(r, Seq("id"), "full_outer")
      .agg(
        coalesce(sum(col("ln")), lit(0L)).as("n_left"),
        count(when(col("ln").isNotNull, lit(1))).as("n_left_ids"),
        count(when(col("ln") > 1, lit(1))).as("n_left_dup_ids"),
        count(when(col("ln").isNotNull && col("rn").isNull, lit(1)))
          .as("n_left_orphans"),
        coalesce(sum(col("rn")), lit(0L)).as("n_right"),
        count(when(col("rn").isNotNull, lit(1))).as("n_right_ids"),
        count(when(col("rn") > 1, lit(1))).as("n_right_dup_ids"),
        count(when(col("rn").isNotNull && col("ln").isNull, lit(1)))
          .as("n_right_orphans"))
  }
}
