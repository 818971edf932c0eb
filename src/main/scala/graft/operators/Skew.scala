package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives.
  *
  * AQE's skew-join split covers joins; for AGGREGATIONS over power-law keys
  * (the normal case for series ids, user ids, shingles at 100 TB) the
  * classic fix is two-phase salting: shuffle once on (key, salt) so one hot
  * key spreads over `saltFactor` reducers, then combine partials per key.
  * Only algebraic aggregates (sum/count/min/max, and mean via sum+count)
  * can be salted this way — that's inherent, not an implementation limit.
  */
object Skew {

  /** Two-phase salted aggregation: partial aggregate on (keys, salt),
    * final combine on keys. Results are EXACTLY the unsalted groupBy for
    * the supported algebraic aggregates.
    *
    * @param aggs (valueCol → agg) pairs: "sum" | "count" | "min" | "max" | "mean"
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String],
                      aggs: Seq[(String, String)], saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    // phase 1: partials per (keys, salt). mean decomposes into sum+count.
    val partialExprs = aggs.zipWithIndex.flatMap { case ((c, a), i) =>
      a match {
        case "sum"   => Seq(sum(col(c)).as(s"__p$i"))
        case "count" => Seq(count(col(c)).as(s"__p$i"))
        case "min"   => Seq(min(col(c)).as(s"__p$i"))
        case "max"   => Seq(max(col(c)).as(s"__p$i"))
        case "mean"  => Seq(sum(col(c)).as(s"__p${i}_s"), count(col(c)).as(s"__p${i}_c"))
        case other   => throw new IllegalArgumentException(s"not salt-able: $other")
      }
    }
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialExprs.head, partialExprs.tail: _*)
    // phase 2: combine partials per keys
    val finalExprs = aggs.zipWithIndex.map { case ((c, a), i) =>
      a match {
        case "sum"   => sum(col(s"__p$i")).as(s"${a}_$c")
        case "count" => sum(col(s"__p$i")).as(s"${a}_$c")
        case "min"   => min(col(s"__p$i")).as(s"${a}_$c")
        case "max"   => max(col(s"__p$i")).as(s"${a}_$c")
        case "mean"  => (sum(col(s"__p${i}_s")) / sum(col(s"__p${i}_c"))).as(s"${a}_$c")
      }
    }
    partial.groupBy(keys.map(col): _*).agg(finalExprs.head, finalExprs.tail: _*)
  }
}
