package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed sliding-frame aggregation for LOW-CARDINALITY keys — the
  * two-pass prefix aggregation SCALE.md names for `q_moving_avg`-shaped
  * windows. `Window.partitionBy(key)` over a handful of keys serializes
  * each key's entire history through ONE task (1/5 of a 100 TB events
  * table per task); this operator keeps the same exact semantics with no
  * per-key task:
  *
  *  1. range-repartition on (key, order) so each partition holds a
  *     contiguous slice of each key's timeline;
  *  2. per-partition running rank + running prefix sum (windows keyed by
  *     the PARTITION ID — `parts` balanced groups, never one per key);
  *  3. broadcast the tiny per-(partition, key) count/sum table, cumulated
  *     per key, to turn local ranks/prefixes into global ones;
  *  4. the ROWS-frame sum at rank r is then P(r) − P(r−frame), fetched by
  *     a hash self-join on (key, r−frame) — (key, rank) is unique, so the
  *     join is shuffle-balanced regardless of key skew.
  *
  * The frame count is `least(r, frame)` (ranks are dense per key), so
  * `sum/count` reproduce `ROWS BETWEEN frame-1 PRECEDING AND CURRENT ROW`
  * exactly. `valueCol` must be non-null (feed integral micro-units for
  * engine-exact averages); an all-null-frame would return 0, not NULL.
  */
object Windowing {

  private def free(df: DataFrame, stem: String, reserved: Seq[String]): String =
    Iterator.from(0).map(i => s"$stem$i")
      .find(n => !df.columns.contains(n) && !reserved.contains(n)).get

  /** Adds `sumName` = sliding sum of `valueCol` and `cntName` = sliding
    * row count over the last `frame` rows per key (frame-1 preceding +
    * current), ordered by `orderCols` (must totally order rows within a
    * key). Input columns pass through unchanged.
    */
  def movingSumCount(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
                     valueCol: Column, frame: Int,
                     sumName: String, cntName: String,
                     numPartitions: Int = 0): DataFrame = {
    require(frame >= 1, s"frame must be >= 1, got $frame")
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // internal names must dodge the caller's output names too
    val reserved = Seq(sumName, cntName)
    val v = free(df, "__graft_v", reserved)
    val pid = free(df, "__graft_pid", reserved)
    val rnl = free(df, "__graft_rnl", reserved)
    val psl = free(df, "__graft_psl", reserved)
    val cOff = free(df, "__graft_coff", reserved)
    val sOff = free(df, "__graft_soff", reserved)
    val rn = free(df, "__graft_rn", reserved)
    val ps = free(df, "__graft_ps", reserved)
    val psPrev = free(df, "__graft_psprev", reserved)

    val sortAll: Seq[Column] = keyCols.map(col) ++ orderCols
    val ranged = df.withColumn(v, valueCol)
      .repartitionByRange(parts, sortAll: _*)
      .withColumn(pid, spark_partition_id())
    val grpCols = (pid +: keyCols).map(col)
    // pass 1: rank + prefix sum WITHIN the range partition (running frame)
    val wLocal = Window.partitionBy(grpCols: _*).orderBy(orderCols: _*)
    val local = ranged
      .withColumn(rnl, row_number().over(wLocal).cast("long"))
      .withColumn(psl, sum(col(v)).over(wLocal))
    // tiny per-(partition, key) totals → per-key cumulative offsets;
    // ≤ parts rows per key, windowed per key over aggregated input
    val wOff = Window.partitionBy(keyCols.map(col): _*).orderBy(col(pid))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(grpCols: _*)
      .agg(count(lit(1)).as(cOff), sum(col(v)).as(sOff))
      .select(grpCols :+
        coalesce(sum(col(cOff)).over(wOff), lit(0L)).as(cOff) :+
        coalesce(sum(col(sOff)).over(wOff), lit(0L)).as(sOff): _*)
    // pass 2: globalize rank and prefix via the broadcast offsets
    val globalized = local.join(broadcast(offsets), pid +: keyCols)
      .withColumn(rn, col(rnl) + col(cOff))
      .withColumn(ps, col(psl) + col(sOff))
    val cur = globalized.select(df.columns.map(col) :+ col(rn) :+ col(ps): _*)
    val prev = globalized.select(
      keyCols.map(col) :+ (col(rn) + frame).as(rn) :+ col(ps).as(psPrev): _*)
    cur.join(prev, keyCols :+ rn, "left")
      .withColumn(sumName, col(ps) - coalesce(col(psPrev), lit(0L)))
      .withColumn(cntName, least(col(rn), lit(frame.toLong)))
      .drop(rn, ps, psPrev)
  }
}
