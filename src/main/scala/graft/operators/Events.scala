package graft.operators

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
    * routes both ORDER-dependent steps through the two-pass prefix
    * machinery instead:
    *
    *  1. global per-user event rank ([[Windowing.withGlobalRankByKey]]);
    *  2. the lag(ts) lookup as a self-join on the unique (user, rank−1);
    *  3. session ids as the per-user running sum of new-session flags
    *     ([[Windowing.withRankAndRunningSum]] over the rank order).
    *
    * Same exact output as the window (equivalence-tested under 9:1 user
    * skew); costs ~2× the shuffles, so prefer the plain window until a
    * single key can exceed one task's capacity.
    */
  def sessionizeScalable(e: DataFrame, gapUs: Long,
                         userCol: String = "user_id", tsCol: String = "ts_us",
                         idCol: String = "event_id", sessCol: String = "sess_id",
                         numPartitions: Int = 0): DataFrame = {
    def free(stem: String): String = Iterator.from(0).map(i => s"$stem$i")
      .find(n => !e.columns.contains(n) && n != sessCol).get
    val rn = free("__graft_srn")
    val rn2 = free("__graft_srn2")
    val prevTs = free("__graft_sprev")
    val flag = free("__graft_sflag")
    val order = Seq(col(tsCol).asc, col(idCol).asc)
    // user_id is HIGH-cardinality: the offset tables are user-count-scale
    // (not broadcastable at 100 TB) — pin the shuffle join
    val ranked = Windowing.withGlobalRankByKey(e, Seq(userCol), order, rn,
      numPartitions, broadcastOffsets = false)
    val prev = ranked.select(col(userCol), (col(rn) + 1).as(rn), col(tsCol).as(prevTs))
    val flagged = ranked.join(prev.hint("shuffle_hash"), Seq(userCol, rn), "left")
      .withColumn(flag,
        when(col(prevTs).isNull || col(tsCol) - col(prevTs) > gapUs, 1L).otherwise(0L))
      .drop(prevTs)
    Windowing.withRankAndRunningSum(flagged, Seq(userCol), Seq(col(rn).asc),
        col(flag), rn2, sessCol, numPartitions, broadcastOffsets = false)
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
