package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: left rows whose timestamp falls inside a right-side
  * interval [startCol, endCol], per key.
  *
  * The naive formulation is a theta-join (`ts BETWEEN start AND end`) which
  * Spark plans as BroadcastNestedLoop / cartesian inside keys — O(n·m) in
  * hot keys. This implementation BUCKETIZES: each interval is exploded to
  * the time buckets it covers, each left row belongs to exactly one bucket,
  * and the join becomes an equi-join on (keys, bucket) + a residual BETWEEN
  * filter. Each (row, interval) pair meets in exactly one bucket, so no
  * dedup is needed. Bucket width trades explode factor vs join selectivity;
  * pick ~the median interval length.
  */
object RangeJoin {

  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           tsCol: String, startCol: String, endCol: String,
           bucketUs: Long): DataFrame = {
    val l = left.withColumn("__bucket", (col(tsCol).cast("long") / bucketUs).cast("long"))
    val r = right.withColumn("__bucket",
        explode(sequence((col(startCol).cast("long") / bucketUs).cast("long"),
          (col(endCol).cast("long") / bucketUs).cast("long"))))
    // the interval side is key-count-scale (per-user sessions at 100 TB
    // = billions of rows) — never a broadcast, and not a hash build
    // either; pin the spillable sort-merge join
    l.join(r.hint("merge"), keys :+ "__bucket")
      .filter(col(tsCol).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }
}
