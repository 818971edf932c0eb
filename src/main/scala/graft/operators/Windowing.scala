package graft.operators

import graft.CacheLedger.Tracked
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ORDER-dependent window computation for LOW-CARDINALITY
  * keys — the two-pass prefix aggregation SCALE.md names for
  * `q_moving_avg`-shaped windows. `Window.partitionBy(key)` over a
  * handful of keys serializes each key's entire history through ONE task
  * (1/5 of a 100 TB events table per task); these operators keep the
  * same exact semantics with no per-key task:
  *
  *  1. range-repartition on (key, order) so each partition holds a
  *     contiguous slice of each key's timeline;
  *  2. per-partition running rank + running prefix sum (windows keyed by
  *     the PARTITION ID — `parts` balanced groups, never one per key);
  *  3. broadcast the tiny per-(partition, key) count/sum table, cumulated
  *     per key, to turn local ranks/prefixes into global ones;
  *  4. frame/lag lookups become hash self-joins on (key, rank) —
  *     (key, rank) is unique, so the join is shuffle-balanced regardless
  *     of key skew.
  *
  * `withRankAndRunningSum` is the shared pass (global rank + running
  * UNBOUNDED PRECEDING..CURRENT sum); `movingSumCount` adds the bounded
  * ROWS frame as P(r) − P(r−frame). `valueCol` must be non-null (feed
  * integral micro-units for engine-exact averages); an all-null frame
  * would return 0, not NULL. AQE stage reuse keeps all of this at ONE
  * physical corpus scan (gated in PlanAuditSpec).
  */
object Windowing {

  private def free(df: DataFrame, stem: String, reserved: Seq[String]): String =
    Iterator.from(0).map(i => s"$stem$i")
      .find(n => !df.columns.contains(n) && !reserved.contains(n)).get

  /** Adds `rankName` = global 1-based per-key rank under `orderCols`
    * (which must totally order rows within a key) and `sumName` = the
    * per-key running sum of `valueCol` (UNBOUNDED PRECEDING..CURRENT
    * ROW) — with no per-key task and no full-data single-partition
    * exchange. Input columns pass through unchanged.
    *
    * `broadcastOffsets`: the offset table has ~(numPartitions + distinct
    * keys) rows — each key's range slice is contiguous, so a key appears
    * in at most a couple of partitions. With LOW-cardinality keys (the
    * moving-average shape) that is ≈ numPartitions rows: broadcast it.
    * With HIGH-cardinality keys (sessionization by user) it is
    * key-count-scale — a fact-table broadcast in disguise; pass false to
    * pin a shuffle hash join instead (the pid column spreads any hot key
    * across reducers).
    */
  def withRankAndRunningSum(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
                            valueCol: Column, rankName: String, sumName: String,
                            numPartitions: Int = 0,
                            broadcastOffsets: Boolean = true): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // internal names must dodge the caller's output names too
    val reserved = Seq(rankName, sumName)
    val v = free(df, "__graft_v", reserved)
    val pid = free(df, "__graft_pid", reserved)
    val rnl = free(df, "__graft_rnl", reserved)
    val psl = free(df, "__graft_psl", reserved)
    val cOff = free(df, "__graft_coff", reserved)
    val sOff = free(df, "__graft_soff", reserved)

    val sortAll: Seq[Column] = keyCols.map(col) ++ orderCols
    // PERSIST the pid-bearing frame: spark_partition_id() above a shared
    // exchange is NOT stable across consumer branches — AQE may apply
    // different read strategies (partition coalescing, mapper-local
    // reads) to the offsets branch vs the window branch, giving the two
    // branches DIFFERENT partition identities and silently corrupting
    // the offsets join (caught as a nondeterministic q_text_pack row
    // count under Verify's AQE session). Materializing pins the pid in
    // the stored rows; every consumer reads identical values. The frame
    // persists ALL input columns (the result rows are read back from it),
    // so CALLERS MUST PRE-PROJECT to the columns the query needs before
    // invoking — every SparkEntry caller does. Spillable MEMORY_AND_DISK,
    // ledger-tracked: released at CacheLedger scope exit (footprint
    // probed under a capped heap in ScaleProbe).
    val ranged = df.withColumn(v, valueCol)
      .repartitionByRange(parts, sortAll: _*)
      .withColumn(pid, spark_partition_id())
      .trackedCache
    val grpCols = (pid +: keyCols).map(col)
    // pass 1: rank + prefix sum WITHIN the range partition
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
    // pass 2: globalize rank and prefix via the offsets join
    val offsetsSide =
      if (broadcastOffsets) broadcast(offsets) else offsets.hint("shuffle_hash")
    local.join(offsetsSide, pid +: keyCols)
      .withColumn(rankName, col(rnl) + col(cOff))
      .withColumn(sumName, col(psl) + col(sOff))
      .select(df.columns.map(col) :+ col(rankName) :+ col(sumName): _*)
  }

  /** Rank-only variant (global per-key `row_number`). */
  def withGlobalRankByKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
                          rankName: String, numPartitions: Int = 0,
                          broadcastOffsets: Boolean = true): DataFrame = {
    val tmp = free(df, "__graft_zsum", Seq(rankName))
    withRankAndRunningSum(df, keyCols, orderCols, lit(0L), rankName, tmp,
        numPartitions, broadcastOffsets)
      .drop(tmp)
  }

  /** Adds `sumName` = sliding sum of `valueCol` and `cntName` = sliding
    * row count over the last `frame` rows per key (frame-1 preceding +
    * current), ordered by `orderCols` (must totally order rows within a
    * key). Input columns pass through unchanged. The frame count is
    * `least(r, frame)` (ranks are dense per key), so `sum/count`
    * reproduce `ROWS BETWEEN frame-1 PRECEDING AND CURRENT ROW` exactly.
    */
  def movingSumCount(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
                     valueCol: Column, frame: Int,
                     sumName: String, cntName: String,
                     numPartitions: Int = 0): DataFrame = {
    require(frame >= 1, s"frame must be >= 1, got $frame")
    val reserved = Seq(sumName, cntName)
    val rn = free(df, "__graft_rn", reserved)
    val ps = free(df, "__graft_ps", reserved)
    val psPrev = free(df, "__graft_psprev", reserved)
    val globalized =
      withRankAndRunningSum(df, keyCols, orderCols, valueCol, rn, ps, numPartitions)
    // frame sum at rank r = P(r) − P(r−frame), via a self-join on the
    // UNIQUE (key, rank) — shuffle-balanced under any key skew
    val prev = globalized.select(
      keyCols.map(col) :+ (col(rn) + frame).as(rn) :+ col(ps).as(psPrev): _*)
    globalized.join(prev, keyCols :+ rn, "left")
      .withColumn(sumName, col(ps) - coalesce(col(psPrev), lit(0L)))
      .withColumn(cntName, least(col(rn), lit(frame.toLong)))
      .drop(rn, ps, psPrev)
  }

  /** Hot-key-safe `lag(1)`: appends each row's PREDECESSOR's
    * `carryCols` (per key, under `orderCols`, which must totally order
    * rows within a key) as `prefix`-renamed columns — null for the first
    * row of a key. The per-key-window formulation
    * (`Window.partitionBy(key)`) serializes a low-cardinality key
    * through one task; this uses the sessionizeScalable shape instead:
    * range-repartition the timeline, lag LOCALLY within each range
    * partition, and stitch partition boundaries with the previous
    * partition's per-key LAST row (a partition-count-scale aggregate,
    * sort-merge-joined back — never broadcast, the key may be
    * high-cardinality too).
    *
    * The boundary tail is `max(struct(orderCols ++ carryCols))`, so
    * every carried column must be PART OF the struct ordering's prefix:
    * orderCols lexicographically dominate, and since they totally order
    * rows per key the max IS the partition's last row. One corpus range
    * shuffle + one (pid, key) merge join — same cost model as
    * sessionizeScalable, equivalence-tested against the plain window.
    */
  def withPrevious(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
                   carryCols: Seq[String], prefix: String = "prev_",
                   numPartitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require((orderCols intersect carryCols).isEmpty,
      s"carryCols must not repeat orderCols (both are carried): " +
        s"${orderCols intersect carryCols}")
    val outNames = (orderCols ++ carryCols).map(prefix + _)
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val pid = free(df, "__graft_pid", outNames)
    val prevS = free(df, "__graft_prev", outNames)
    val tailS = free(df, "__graft_tail", outNames)
    // orderCols FIRST: struct comparison is lexicographic, so max() picks
    // the partition's last row per key
    val packed = struct((orderCols ++ carryCols).map(col): _*)
    // PERSISTED: pid above a shared exchange is not stable across AQE
    // consumer branches — see withRankAndRunningSum. Ledger-tracked.
    val ranged = df.repartitionByRange(parts,
        (keyCols ++ orderCols).map(c => col(c).asc): _*)
      .withColumn(pid, spark_partition_id())
      .trackedCache
    val wLocal = Window.partitionBy((pid +: keyCols).map(col): _*)
      .orderBy(orderCols.map(c => col(c).asc): _*)
    val tails = ranged.groupBy((pid +: keyCols).map(col): _*).agg(max(packed).as(tailS))
      .withColumn(tailS, lag(col(tailS), 1).over(
        Window.partitionBy(keyCols.map(col): _*).orderBy(col(pid).asc)))
      .select(col(pid) +: keyCols.map(col) :+ col(tailS): _*)
    ranged
      .withColumn(prevS, lag(packed, 1).over(wLocal))
      .join(tails.hint("merge"), pid +: keyCols, "left")
      .withColumn(prevS, coalesce(col(prevS), col(tailS)))
      .select(df.columns.map(col) ++
        (orderCols ++ carryCols).map(c => col(prevS).getField(c).as(prefix + c)): _*)
  }
}
