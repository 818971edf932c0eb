package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the canonical time-series operator Spark lacks natively:
  * for every left row, attach the value of the latest right row with
  * `right.ts <= left.ts` (optionally within a tolerance), per key.
  *
  * Implementation is COMPOSED (preference (a) of the custom-operator
  * ladder): tag both sides, union, and take a running `last(value,
  * ignoreNulls)` over (key, ts) ordering with right-before-left on ties.
  * That is ONE shuffle on the key — the same cost as the dedicated
  * merge-join a custom SparkPlan would buy — and it inherits AQE skew
  * handling for free, which is why no custom LogicalPlan/Strategy is
  * needed. The classic alternative (range/theta join) would be O(n·m)
  * inside hot keys.
  *
  * Right side must be unique per (keys, ts) for deterministic output —
  * pre-aggregate it (`reduceRight`) if it isn't.
  */
object AsofJoin {

  /** Deduplicate the right side to one row per (keys, ts): max value —
    * makes as-of output deterministic under timestamp ties.
    */
  def reduceRight(right: DataFrame, keys: Seq[String], tsCol: String,
                  valCol: String): DataFrame =
    right.groupBy((keys :+ tsCol).map(col): _*)
      .agg(max(col(valCol)).as(valCol))

  /** @param left       probe side (kept in full)
    * @param right      reference side: (keys, tsCol, valCol), unique per (keys, ts)
    * @param keys       equi-join key columns (present on both sides)
    * @param tsCol      event-time column (same name both sides)
    * @param valCol     right-side value column to attach
    * @param toleranceUs match only if left.ts - right.ts <= tolerance (None = unbounded)
    * @return left columns + `<valCol>_asof` (+ `<tsCol>_asof`), null when no match
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
           valCol: String, toleranceUs: Option[Long] = None): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(right.schema(valCol).dataType))
      .withColumn("__rt", lit(null).cast("long"))
    val r = right.select(
      (keys.map(col) :+ col(tsCol) :+ lit(0).as("__side") :+
        col(valCol).as("__rv") :+ col(tsCol).cast("long").as("__rt")) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val unioned = l.select(r.columns.map(col): _*).unionByName(
      r, allowMissingColumns = false)
    // right rows sort before left rows at equal ts → inclusive right.ts <= left.ts
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__asof_v", last(col("__rv"), ignoreNulls = true).over(w))
      .withColumn("__asof_t", last(col("__rt"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val withTol = toleranceUs match {
      case Some(tol) =>
        val ok = col("__asof_t").isNotNull &&
          (col(tsCol).cast("long") - col("__asof_t")) <= tol
        matched
          .withColumn("__asof_v", when(ok, col("__asof_v")))
          .withColumn("__asof_t", when(ok, col("__asof_t")))
      case None => matched
    }
    withTol.select(leftCols.map(col) :+
      col("__asof_v").as(s"${valCol}_asof") :+
      col("__asof_t").as(s"${tsCol}_asof"): _*)
  }
}
