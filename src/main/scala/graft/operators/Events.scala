package graft.operators

import graft.CacheLedger.Tracked
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a (user, ts, type) stream — the funnel /
  * retention pair every product-analytics workload starts from, shared by
  * the benched queries and the scale probe.
  *
  * Scale shape: per-user aggregates and equi-joins on the user key only —
  * with a user-bucketed layout these co-partition and the joins are
  * shuffle-free; counts are partial-aggregated. Joins are PINNED
  * `shuffle_hash` (per-user stage tables are user-count-scale — not
  * broadcastable at 100 TB).
  */
object Events {

  /** Users reaching each stage IN ORDER: stage i counts users with an
    * event of type stages(i) strictly after their stage i-1 timestamp.
    * Output rows ("1_view", n), ("2_click", n), … via union — a 1-row
    * cross join of the counts would plan a CartesianProduct.
    */
  def funnelCounts(e: DataFrame, stages: Seq[String],
                   userCol: String = "user_id", tsCol: String = "ts_us",
                   typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var prev: Option[DataFrame] = None
    val counts = stages.zipWithIndex.map { case (st, i) =>
      val evs = e.filter(col(typeCol) === st)
      val cur = prev match {
        case None => evs.groupBy(userCol).agg(min(tsCol).as("__t"))
        case Some(p) => evs.join(p.hint("shuffle_hash"), Seq(userCol))
          .filter(col(tsCol) > col("__t"))
          .groupBy(userCol).agg(min(tsCol).as("__t"))
      }
      prev = Some(cur)
      cur.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("__stage_no"),
          lit(s"${i + 1}_$st").as("stage"), col("n_users"))
    }
    // order by the NUMERIC stage index: the lexicographic label would
    // misorder funnels with 10+ stages ("10_x" sorts before "2_x")
    counts.reduce(_ unionByName _).orderBy("__stage_no")
      .select("stage", "n_users")
  }

  /** Gap sessionization with NO per-user task — the hot-key-safe variant
    * of the lag + cumulative-flag window (`q_sessionize`). The windowed
    * formulation partitions by user: correct and cheap when users are
    * many and small, but one pathological user (a bot firing a large
    * share of all events) serializes through a single task. This path
    * range-partitions the timeline instead, so a hot user spreads across
    * partitions, and stitches the boundaries with per-(partition, user)
    * side tables that are user-count-scale (shuffle-joined, NEVER
    * broadcast — plan-gated):
    *
    *  1. range-repartition on (user, ts, id); local lag + local flag
    *     prefix sums via windows keyed by the PARTITION id;
    *  2. each partition's first row per user takes its lag from the
    *     previous partition's per-user tail timestamp (a tiny aggregate,
    *     laggged per user over partition ids);
    *  3. session ids = local flag prefix + the cumulated per-(partition,
    *     user) flag offsets.
    *
    * Every join keys on (partition id, user), which the window exchange
    * already satisfies on the big side — ONE corpus range shuffle + ONE
    * (pid, user) hash shuffle total. Same exact output as the window
    * (equivalence-tested under 9:1 user skew); prefer the plain window
    * until a single key can exceed one task's capacity.
    */
  def sessionizeScalable(e: DataFrame, gapUs: Long,
                         userCol: String = "user_id", tsCol: String = "ts_us",
                         idCol: String = "event_id", sessCol: String = "sess_id",
                         numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def free(stem: String): String = Iterator.from(0).map(i => s"$stem$i")
      .find(n => !e.columns.contains(n) && n != sessCol).get
    val parts =
      if (numPartitions > 0) numPartitions
      else e.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val pid = free("__graft_pid")
    val prevTs = free("__graft_prevts")
    val tailTs = free("__graft_tailts")
    val flag = free("__graft_flag")
    val lsum = free("__graft_lsum")
    val fOff = free("__graft_foff")

    // PERSISTED: spark_partition_id() above a shared exchange is not
    // stable across the three consumer branches (tails/window/offsets)
    // under AQE — see Windowing.withRankAndRunningSum. The persist is
    // output-width by construction (every input column passes through to
    // the result); ledger-tracked, released at CacheLedger scope exit.
    val ranged = e.repartitionByRange(parts,
        col(userCol).asc, col(tsCol).asc, col(idCol).asc)
      .withColumn(pid, spark_partition_id())
      .trackedCache
    val wLocal = Window.partitionBy(col(pid), col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    // previous partition's last ts per user (range slices are contiguous,
    // so "previous" = lag over pid within the tiny per-(pid,user) table)
    val tails = ranged.groupBy(col(pid), col(userCol)).agg(max(col(tsCol)).as(tailTs))
      .withColumn(tailTs,
        lag(col(tailTs), 1).over(Window.partitionBy(col(userCol)).orderBy(col(pid))))
      .select(col(pid), col(userCol), col(tailTs))
    val flagged = ranged
      .withColumn(prevTs, lag(col(tsCol), 1).over(wLocal))
      // tails/offs are user-count-scale: never broadcast, and sort-merge
      // rather than a hash build (a billion-user tail table split 32 ways
      // still outgrows a per-task hash relation)
      .join(tails.hint("merge"), Seq(pid, userCol), "left")
      // a partition's first user row falls back to the previous tail
      .withColumn(flag, when(coalesce(col(prevTs), col(tailTs)).isNull ||
        col(tsCol) - coalesce(col(prevTs), col(tailTs)) > gapUs, 1L).otherwise(0L))
    // per-user flag offsets over the same tiny aggregate shape
    val offs = flagged.groupBy(col(pid), col(userCol)).agg(sum(col(flag)).as(fOff))
      .withColumn(fOff, coalesce(sum(col(fOff)).over(Window.partitionBy(col(userCol))
        .orderBy(col(pid)).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(pid), col(userCol), col(fOff))
    flagged
      .withColumn(lsum, sum(col(flag)).over(wLocal))
      .join(offs.hint("merge"), Seq(pid, userCol), "left")
      .withColumn(sessCol, col(lsum) + coalesce(col(fOff), lit(0L)))
      .select(e.columns.map(col) :+ col(sessCol): _*) // input order preserved
  }

  /** Users active k weeks after their first event, per k — cohort
    * retention on integer epoch-week arithmetic (`DIV`, exact on any
    * engine; double division then cast can round UP across a week
    * boundary before truncation).
    */
  def weeklyRetention(e: DataFrame, weekUs: Long = 604800000000L,
                      userCol: String = "user_id", tsCol: String = "ts_us"): DataFrame = {
    val first = e.groupBy(userCol).agg(min(tsCol).as("__t0"))
      .select(col(userCol), expr(s"__t0 DIV $weekUs").as("__w0"))
    e.join(first.hint("shuffle_hash"), Seq(userCol))
      .select(col(userCol), (expr(s"$tsCol DIV $weekUs") - col("__w0")).as("weeks_since"))
      .distinct()
      .groupBy("weeks_since").agg(count(lit(1)).as("n_users"))
      .orderBy("weeks_since")
  }
}
