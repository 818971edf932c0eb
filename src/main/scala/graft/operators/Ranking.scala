package graft.operators

import graft.CacheLedger.Tracked
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — corpus-wide `row_number`/`ntile` without
  * the `Exchange SinglePartition` that an unpartitioned window funnels
  * the whole input through (the textbook driver-of-one-task killer at
  * 100 TB).
  *
  * Shape: two-pass ranking. Range-repartition on the sort key (so
  * partition i holds a contiguous slice of the global order), rank
  * WITHIN each partition, and add the partition's global offset —
  * computed from the tiny per-partition row counts (≤ numPartitions
  * rows, aggregated map-side) and broadcast back. Both passes share the
  * one range exchange (ReuseExchange); the only single-partition work in
  * the plan is the cumulative-offset window over the ≤ numPartitions-row
  * count table, which is bounded by construction — the PlanAuditSpec
  * gate allows single-partition exchanges only over aggregated input.
  */
object Ranking {

  private def free(df: DataFrame, stem: String, reserved: Seq[String] = Nil): String =
    Iterator.from(0).map(i => s"$stem$i")
      .find(n => !df.columns.contains(n) && !reserved.contains(n)).get

  /** Adds `rankName` = global 1-based row_number under `sortExprs` (must
    * be a total order for deterministic ranks) and, if `totalName` is
    * set, the global row count — without any full-data single-partition
    * exchange.
    */
  def withGlobalRank(df: DataFrame, sortExprs: Seq[Column], rankName: String,
                     totalName: Option[String] = None,
                     numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // internal names must dodge the caller's output names too (a caller
    // passing rankName = "__graft_pid0" must not have it dropped)
    val reserved = rankName +: totalName.toSeq
    val pid = free(df, "__graft_pid", reserved)
    val cnt = free(df, "__graft_cnt", reserved)
    val off = free(df, "__graft_off", reserved)
    val tot = totalName.getOrElse(free(df, "__graft_tot", reserved))
    // PERSISTED: spark_partition_id() above a shared exchange is not
    // stable across consumer branches under AQE (coalescing/local reads
    // can differ between the counts branch and the rank branch) — see
    // Windowing.withRankAndRunningSum for the full story
    val ranged = df.repartitionByRange(parts, sortExprs: _*)
      .withColumn(pid, spark_partition_id())
      .trackedCache
    // per-partition counts: ≤ `parts` rows after a map-side partial agg
    val counts = ranged.groupBy(col(pid)).agg(count(lit(1)).as(cnt))
    // cumulative offsets over the tiny count table; its single-partition
    // window is over aggregated input, bounded by `parts`
    val wOff = Window.orderBy(col(pid)).rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.orderBy(col(pid))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts.select(col(pid),
      coalesce(sum(col(cnt)).over(wOff), lit(0L)).as(off),
      sum(col(cnt)).over(wTot).as(tot))
    // second pass: rank within the range partition + broadcast offset.
    // The pid window re-clusters by pid (hash), but every group is one
    // balanced range slice — no single task sees more than ~1/parts.
    val wLocal = Window.partitionBy(col(pid)).orderBy(sortExprs: _*)
    val out = ranged.join(broadcast(offsets), Seq(pid))
      .withColumn(rankName, row_number().over(wLocal).cast("long") + col(off))
      .drop(pid, off)
    if (totalName.isDefined) out else out.drop(tot)
  }

  /** Adds `bucketName` = exact SQL `ntile(n)` over the global `sortExprs`
    * order (first `total % n` buckets get `total/n + 1` rows, the rest
    * `total/n` — byte-identical to DuckDB/Postgres ntile), built on
    * [[withGlobalRank]] so the corpus never passes through one task.
    */
  def withNtile(df: DataFrame, n: Int, sortExprs: Seq[Column],
                bucketName: String, numPartitions: Int = 0): DataFrame = {
    require(n > 0, s"ntile bucket count must be positive, got $n")
    val rn = free(df, "__graft_rank", Seq(bucketName))
    val tot = free(df, "__graft_total", Seq(bucketName, rn))
    val ranked = withGlobalRank(df, sortExprs, rn, Some(tot), numPartitions)
    // CASE arms: when total < n, base = 0 and the first arm covers every
    // rank (rem = total), so the DIV-by-zero arm is never evaluated
    ranked.withColumn(bucketName, expr(
      s"""CASE WHEN $rn <= ($tot % $n) * ($tot DIV $n + 1)
         |     THEN ($rn - 1) DIV ($tot DIV $n + 1) + 1
         |     ELSE $tot % $n + ($rn - 1 - ($tot % $n) * ($tot DIV $n + 1)) DIV ($tot DIV $n) + 1
         |END""".stripMargin))
      .drop(rn, tot)
  }
}
