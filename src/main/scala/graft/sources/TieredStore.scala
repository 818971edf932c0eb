package graft.sources

import graft.functions.Tags
import graft.model.Canon
import graft.model.Canon._
import graft.operators.{TimeSeries => TS}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CheckpointBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** M1-M3 + I2: the dual-tier store — an in-memory arrival buffer layered
  * over a [[VersionedStore]] manifest-chain disk tier, replicating the
  * reference's membuf-plus-shards read semantics
  * (`/root/reference/src/timeseries.re:357-434`, `src/membufq.re:17-41`).
  *
  * The reference keeps a per-series FIFO of not-yet-spilled points and
  * answers reads by one of three paths:
  *  - **M1 fast path**: when the buffer is internally time-sorted AND lies
  *    entirely beyond the disk tier's cached bound, a `last n` that the
  *    buffer can satisfy alone never touches disk (`timeseries.re:363-382`);
  *  - **M2 memory-then-disk**: same qualification but the buffer is short
  *    of `n` — take all of memory, fill the leftover from disk
  *    (`timeseries.re:384-434`);
  *  - **M3 forced flush**: the buffer overlaps the disk range (out-of-order
  *    arrivals) — flush it to disk first, then read disk only
  *    (`timeseries.re:357-361`).
  *
  * Spark-first mapping: the memory tier is an eagerly LOCAL-CHECKPOINTED
  * DataFrame carrying an arrival-sequence column. Every buffer mutation
  * swaps in a fresh checkpoint, which (a) materializes the new content
  * immediately (decoupling it from non-replayable foreachBatch sources),
  * and (b) truncates the plan to one `LogicalRDD` leaf — plan depth and
  * block count stay CONSTANT over an unbounded micro-batch stream instead
  * of growing one union/filter layer per batch. Qualification is ONE
  * distributed aggregate over the buffer (a per-series lag(1) monotonicity
  * count + min-ts vs the disk upper bound); the M2 merge is `union` + the
  * same `WindowGroupLimit` top-n every flat read uses — Catalyst, not
  * hand-merging.
  *
  * **Durability protocol (unified, r13)**: every disk-tier mutation —
  * spill, sync, direct append, delete, compaction — commits a version on
  * the [[VersionedStore]] manifest chain. The manifest CAS is the single
  * commit point, so each mutation is all-or-nothing: a crash mid-write
  * leaves the chain at the previous version plus one inert orphan data
  * dir ([[VersionedStore.sweepOrphanData]] collects it at the next open).
  * This replaces the former marker-committed in-place dir swap and its
  * roll-forward machinery entirely, and gives the LIVE store time travel
  * ([[readDiskAt]]) and CDC ([[diskChanges]]) for free. Deletes stay
  * partition-scoped (manifest `skip` exclusions + one survivors dir —
  * the Iceberg partition-overwrite idea), so delete cost tracks the
  * affected partitions' data, not store size. [[compactDisk]] collapses
  * the live set to one dir and by default expires the superseded history
  * (the OPTIMIZE + VACUUM pairing), which is where space is reclaimed.
  *
  * **Snapshot contract**: every frame this class returns (readLast,
  * snapshot, lengthSplit) is built under the store lock from the
  * checkpointed buffer plus parquet relations whose file listing Spark
  * pins at construction — an immutable snapshot of the store at call time.
  * Committed data dirs are immutable, so a snapshot stays valid across
  * later mutations; only [[compactDisk]]'s history expiry removes files,
  * after which a stale reader fails LOUDLY (file-not-found) — never a
  * silently doubled or stale answer. Superseded buffer checkpoints are
  * kept alive for [[TieredStore.RetireDepth]] further mutations, same
  * contract.
  *
  * Driver-side state is the per-series disk bounds and qualification
  * verdicts — the metadata the reference's membuf holds
  * (`src/membufq.re:45-47`), bounded by series cardinality and CAPPED at
  * `maxTrackedSeries` entries: a store pointed at more series than the cap
  * stops tracking new bounds and conservatively degrades those series'
  * reads to the always-correct merge/flush paths (reads stay flat, memory
  * stays bounded, answers stay right).
  *
  * Scale notes (100 TB): the memory tier is an ingest BUFFER — bounded by
  * the spill threshold (reference `--shard-size`), not by corpus size; every
  * read-path aggregate runs over that bounded frame. The disk tier is the
  * partitioned ShardStore layout under manifest versioning, whose
  * series/day pruning does the heavy lifting; plan size is bounded by the
  * number of distinct skip sets (≈ deletes since the last compact), never
  * by spill count ([[VersionedStore.rawGroups]]). The M1 verdict's value
  * at scale is skipping the disk scan ENTIRELY for hot-tail reads (the
  * common monitoring access pattern). Divergences from the reference,
  * documented: (1) membufq's `is_ascending` compares only the NEWEST
  * buffered point against the disk bound (`src/membufq.re:23-27`), which
  * admits a buffer whose tail dips below it; we require the whole buffer
  * beyond the bound. (2) The bound check is STRICT
  * (`min(buffer ts) > disk max ts`): at a shared timestamp the
  * (ts desc, rid desc) order can rank a disk row above a buffered one, so a
  * tie must not qualify for the memory-only path — it degrades to the
  * merge/flush paths, never to a wrong answer.
  *
  * Mutations are serialized on the store instance — the concurrency model
  * the reference enforces globally (`src/main.re:225-227`) — and each
  * lands at cached-tip + 1, so the manifest CAS additionally rejects any
  * out-of-band writer racing the same root.
  *
  * @param seriesBuckets the layout a NEW store is created with: None =
  *   the reference-faithful `series=/day=` layout (one dir per series —
  *   perfect pruning, right for the reference's handful-of-series
  *   model); Some(b) = the bucketed high-cardinality layout
  *   (`bucket=/day=`, series as an ordinary column). Reads are
  *   layout-invisible (same rows, same order — property-tested). The
  *   layout is per-COMMIT manifest state: on reopen the persisted
  *   chain's tip is authoritative (a flat store may have been elected
  *   bucketed since), and this argument only seeds creation.
  * @param electBucketsAt automatic layout election (VERDICT r11/r12
  *   item 4): once a FLAT store's tracked series cardinality reaches
  *   this threshold, the next mutation migrates the disk tier to the
  *   bucketed layout ([[TieredStore.ElectedBuckets]] buckets) via one
  *   [[VersionedStore.compactAs]] commit + history expiry — past
  *   roughly [[TieredStore.BucketLayoutThreshold]] series the flat
  *   layout's per-series directory creation dominates sync cost
  *   (ManySeriesProbe: ~36ms/series/sync flat vs seconds/5k bucketed),
  *   and without election the store silently degrades. One-time cost =
  *   one disk-tier rewrite, measured in SCALE.md. Set Int.MaxValue to
  *   pin the flat layout forever.
  */
final class TieredStore(spark: SparkSession, val root: String,
                        val maxTrackedSeries: Int = TieredStore.DefaultMaxTrackedSeries,
                        val seriesBuckets: Option[Int] = None,
                        val electBucketsAt: Int = TieredStore.BucketLayoutThreshold) {
  import TieredStore._

  @volatile private var mem: DataFrame = emptyMem(spark)
  @volatile private var memEmpty = true
  /** Superseded buffer checkpoints, oldest first; see the snapshot
    * contract in the class doc. */
  private val retiredFrames = scala.collection.mutable.Queue.empty[DataFrame]
  /** Per-series (min ts, max ts) of everything flushed to disk; the analog
    * of the membuf's cached `disk_range` (`src/membufq.re:45-47`).
    */
  private val diskBounds = scala.collection.concurrent.TrieMap.empty[String, (Long, Long)]
  /** True once any series' bounds were dropped on the cap: an ABSENT
    * bounds entry then means "unknown", not "no disk data". */
  @volatile private var boundsOverflow = false
  @volatile private var diskNonEmpty = false
  /** Cached tip of the disk tier's manifest chain — refreshed after every
    * committed mutation, so reads plan without re-listing manifests. */
  @volatile private var tip: Option[VersionedStore.Commit] = None
  /** The disk tier's CURRENT physical layout — the tip manifest's, which
    * [[maybeElect]] can move from flat to bucketed (see `electBucketsAt`). */
  @volatile private var curLayout: Option[Int] = seriesBuckets

  // ---- open/reopen: collect any crashed writer's orphan data dirs, then
  // rebuild the reference's startup membuf metadata for a pre-existing
  // root: disk presence plus per-series bounds, via ONE column-pruned
  // (series, ts_us) aggregate whose output is series-cardinality-bounded
  // (and capped) — without it a reopened store would treat its disk tier
  // as empty and mis-qualify buffers for the M1 memory-only path. A fresh
  // scratch root (every streaming/test store) skips all of this on a
  // single manifest listing. No roll-forward exists to run: the manifest
  // CAS left every prior mutation either fully committed or fully absent.
  locally {
    refreshTip()
    tip.foreach { t =>
      // the persisted chain is authoritative on reopen: a store created
      // flat may have been elected bucketed since; the ctor arg only
      // seeds NEW stores
      curLayout = t.buckets
      VersionedStore.sweepOrphanData(spark, root)
      if (t.dirs.nonEmpty) hydrateBounds()
    }
  }

  /** The disk tier's current physical layout (None = flat `series=/day=`). */
  def layout: Option[Int] = curLayout

  private def refreshTip(): Unit =
    tip = VersionedStore.versions(spark, root).lastOption

  /** Cap-bounded reopen hydration: per-series bounds via one aggregate,
    * but the COLLECT is limited to maxTrackedSeries+1 rows — a store
    * holding millions of series must not pull one row per series to the
    * driver just to discard the overflow (every other bounds call
    * site is buffer- or ids-bounded). On overflow the untracked series
    * degrade to the conservative merge/flush paths via boundsOverflow,
    * exactly like cap eviction during normal operation. */
  private def hydrateBounds(): Unit = {
    // clamp before the +1 (Int.MaxValue would overflow to a negative
    // limit); the orderBy makes WHICH series get tracked bounds under a
    // partial cap deterministic (series order), not plan-order luck
    val cap = math.min(maxTrackedSeries, Int.MaxValue - 1)
    val rows = readStore.groupBy(SERIES)
      .agg(min(TS_US).as("lo"), max(TS_US).as("hi"))
      .orderBy(SERIES)
      .limit(cap + 1)
      .collect()
    if (rows.nonEmpty) diskNonEmpty = true
    rows.take(cap).foreach { r =>
      diskBounds.put(r.getString(0), (r.getLong(1), r.getLong(2)))
    }
    if (rows.length > cap) boundsOverflow = true
  }

  private def canonSel(df: DataFrame): DataFrame =
    df.select(col(SERIES), col(TS_US), col(TAG), col(VALUE), col(RID))

  /** Disk append as a manifest version (layout recorded per commit). */
  private def appendStore(df: DataFrame): Unit = {
    VersionedStore.append(df, root, curLayout)
    refreshTip()
  }

  /** Automatic bucketed-layout election (see `electBucketsAt`): called at
    * the end of every ingest-path mutation, under the store lock. One
    * [[VersionedStore.compactAs]] commit rewrites the live content
    * bucketed and flips the manifest layout marker; the superseded flat
    * history is expired (space reclaimed, same policy as [[compactDisk]]).
    * Reads before/after are property-identical — the layout is invisible
    * above the physical tier. */
  private def maybeElect(): Unit =
    if (curLayout.isEmpty && diskHasData && diskBounds.size >= electBucketsAt) {
      VersionedStore.compactAs(spark, root, Some(ElectedBuckets))
      VersionedStore.expire(spark, root, keepLast = 1)
      curLayout = Some(ElectedBuckets)
      refreshTip()
    }

  /** Whole disk tier at the cached tip, canonical form. */
  private def readStore: DataFrame =
    tip.fold(emptyCanon(spark))(c => VersionedStore.contentOf(spark, root, c))

  /** Swap the buffer to new content: eagerly local-checkpoint the plan
    * (materialized blocks, depth-1 `LogicalRDD` plan), then retire the
    * superseded frame. Checkpoints older than [[RetireDepth]] swaps have
    * their blocks dropped deterministically via [[CheckpointBridge]].
    */
  private def swapMem(plan: DataFrame): Unit = {
    val old = mem
    mem = plan.localCheckpoint(eager = true)
    // ALWAYS retire the superseded frame: a drained buffer's empty
    // checkpoint is still a checkpoint (skipping it when memEmpty leaked
    // one persisted-RDD registration per drain cycle); releasing the
    // pristine initial emptyMem frame is a harmless no-op (its RDD was
    // never persisted).
    retiredFrames.enqueue(old)
    while (retiredFrames.size > RetireDepth)
      CheckpointBridge.releaseCheckpoint(retiredFrames.dequeue())
  }

  /** Direct-to-disk append (the batch ingest path). An empty frame is a
    * no-op — no empty version bloating the chain. */
  def appendDisk(df: DataFrame): Unit = this.synchronized {
    val slice = canonSel(df)
    val bounds = collectBounds(slice)
    if (bounds.nonEmpty) { appendStore(slice); applyBounds(bounds); maybeElect() }
  }

  /** Buffer points in the memory tier. `seqCol` is the arrival order —
    * the FIFO position in the reference's membuf (`src/membufq.re:9`).
    */
  def appendMemory(df: DataFrame, seqCol: String): Unit = this.synchronized {
    val slice = df.select(col(SERIES), col(TS_US), col(TAG), col(VALUE),
      col(RID), col(seqCol).cast(LongType).as(SEQ))
    swapMem(if (memEmpty) slice else mem.unionByName(slice))
    memEmpty = false
  }

  /** M3 / S6: flush the named series' buffered points to the disk tier. */
  def flush(ids: Seq[String]): Unit = this.synchronized { flushLocked(ids) }

  /** S6 `ctl/ts/sync` (reference `src/main.re:188`, `timeseries_sync` →
    * `Timeseries.flush`): flush EVERY buffered series to disk. Idempotent —
    * a second sync on an empty buffer is a no-op.
    *
    * Flush-all is its OWN path, not `flush(allIds)`: collecting every
    * buffered series name to the driver and planning two `isin(<N
    * literals>)` filters is exactly the Catalyst plan-size pathology the
    * many-series probe exists to rule out (1M series → a
    * hundreds-of-MB expression tree pinning the driver). The whole
    * buffer moves as one unfiltered write; the bounds update reuses the
    * same aggregate that gates the (empty → no-commit) case.
    */
  def sync(): Unit = this.synchronized {
    if (!memEmpty) {
      val moving = canonSel(mem)
      val bounds = collectBounds(moving)
      if (bounds.nonEmpty) { appendStore(moving); applyBounds(bounds); maybeElect() }
      swapMem(emptyMem(spark))
      memEmpty = true
    }
  }

  private def flushLocked(ids: Seq[String]): Unit = if (!memEmpty) {
    val moving = canonSel(mem.filter(col(SERIES).isin(ids: _*)))
    val bounds = collectBounds(moving)
    if (bounds.nonEmpty) { appendStore(moving); applyBounds(bounds); maybeElect() }
    swapMem(mem.filter(!col(SERIES).isin(ids: _*)))
    if (mem.isEmpty) { swapMem(emptyMem(spark)); memEmpty = true }
  }

  /** Per-series (min, max) ts of a slice — bounded by series cardinality,
    * capped at maxTrackedSeries by [[applyBounds]]. Computed BEFORE the
    * disk commit so an all-empty slice commits nothing. */
  private def collectBounds(slice: DataFrame): Array[org.apache.spark.sql.Row] =
    slice.groupBy(SERIES).agg(min(TS_US).as("lo"), max(TS_US).as("hi")).collect()

  private def applyBounds(rows: Array[org.apache.spark.sql.Row]): Unit = {
    if (rows.nonEmpty) diskNonEmpty = true
    rows.foreach { r =>
      val (s, lo, hi) = (r.getString(0), r.getLong(1), r.getLong(2))
      if (diskBounds.contains(s) || diskBounds.size < maxTrackedSeries)
        diskBounds.updateWith(s) {
          case Some((l, h)) => Some((math.min(l, lo), math.max(h, hi)))
          case None         => Some((lo, hi))
        }
      else boundsOverflow = true // untracked: this series degrades to M2/M3
    }
  }

  private def diskHasData: Boolean = diskNonEmpty

  /** Pruned disk read: the prune runs on each RAW relation (partition
    * columns intact) so the series/bucket predicates land on PARTITION
    * columns and prune at listing time, before the canon projection
    * drops them. */
  private def prunedCanon(c: VersionedStore.Commit,
                          prune: DataFrame => DataFrame): DataFrame =
    if (c.dirs.isEmpty) emptyCanon(spark)
    else VersionedStore.rawGroups(spark, root, c)
      .map(r => canonSel(prune(r))).reduce(_ unionByName _)

  private def disk(ids: Seq[String]): DataFrame =
    (tip, diskHasData) match {
      case (Some(c), true) => prunedCanon(c, curLayout match {
        case Some(b) =>
          val bs = ids.map(ShardStore.bucketOf(_, b)).distinct
          raw => raw.filter(col(ShardStore.BUCKET).isin(bs: _*))
            .filter(col(SERIES).isin(ids: _*))
        case None => raw => raw.filter(col(SERIES).isin(ids: _*))
      })
      case _ => emptyCanon(spark)
    }

  private def memCanon(ids: Seq[String]): DataFrame =
    canonSel(TS.selectSeries(mem, ids))

  private case class MemStat(count: Long, minTs: Long, sorted: Boolean)

  /** One aggregate over the (bounded) buffer: per-series count, min ts and
    * arrival-order monotonicity — the distributed `is_ascending`
    * (`src/membufq.re:17-28`).
    */
  private def memStats(ids: Seq[String]): Map[String, MemStat] = {
    if (memEmpty) return Map.empty
    val w = Window.partitionBy(SERIES).orderBy(col(SEQ))
    TS.selectSeries(mem, ids)
      .withColumn("__prev_ts", lag(col(TS_US), 1).over(w))
      .groupBy(SERIES)
      .agg(count(lit(1)).as("cnt"), min(TS_US).as("min_ts"),
        sum(when(col("__prev_ts") > col(TS_US), 1L).otherwise(0L)).as("viol"))
      .collect() // bounded by the queried series count
      .map(r => r.getString(0) -> MemStat(r.getLong(1), r.getLong(2), r.getLong(3) == 0L))
      .toMap
  }

  /** Buffer lies STRICTLY beyond everything on disk for this series. A tie
    * (buffer min ts == disk max ts) must NOT qualify: under (ts desc,
    * rid desc) a disk row at the shared timestamp can outrank a buffered
    * one, so ties take the always-correct merge/flush paths. A series with
    * cap-evicted (unknown) bounds is conservatively not-beyond.
    */
  private def beyondDisk(s: String, st: MemStat): Boolean =
    diskBounds.get(s) match {
      case Some((_, hi)) => st.minTs > hi
      case None          => !boundsOverflow
    }

  /** Q1 `last n` through the tier decision (`timeseries.re:357-382`):
    * per queried series — M1 memory-only when the sorted-and-beyond buffer
    * holds ≥ n points, M2 memory∪disk top-n when it qualifies but is short,
    * M3 flush-then-disk when it overlaps the disk range. The three branches
    * union into one declarative plan; a query whose every series takes M1
    * plans NO disk scan at all (asserted by `TieredStoreSpec`).
    */
  def readLast(ids: Seq[String], n: Int): DataFrame = this.synchronized {
    require(ids.nonEmpty, "tiered readLast needs explicit series ids")
    val stats = memStats(ids)
    val qualified = ids.filter(s =>
      stats.get(s).forall(st => st.sorted && beyondDisk(s, st)))
    val fast = qualified.filter(s => stats.get(s).exists(_.count >= n))
    val merge = qualified.diff(fast)
    val toFlush = ids.diff(qualified)
    if (toFlush.nonEmpty) flushLocked(toFlush)
    val branches = Seq(
      if (fast.isEmpty) None else Some(TS.readLast(memCanon(fast), fast, n)),
      if (merge.isEmpty) None
      else {
        val memSide = if (memEmpty) emptyCanon(spark) else memCanon(merge)
        Some(TS.readLast(memSide.unionByName(disk(merge)), merge, n))
      },
      if (toFlush.isEmpty) None else Some(TS.readLast(disk(toFlush), toFlush, n))
    ).flatten
    branches.reduce(_ unionByName _).orderBy(col(TS_US).desc, col(RID).desc)
  }

  /** The session this store plans against (for router ack frames). */
  private[graft] def session: SparkSession = spark

  /** D1 against the LIVE store — the reference's DELETE verb composed
    * end-to-end (`/root/reference/src/main.re:97-118` →
    * `src/timeseries.re:295-303`): flush the touched series' buffers
    * first (the reference flushes membufs before touching shards), then
    * commit a manifest version without the matched rows, so every
    * subsequent read of this store sees fewer points. Returns the
    * deleted-point count — the observable effect behind the reference's
    * bare "ok" reply.
    *
    * Matched-row semantics, not the reference's delete-by-timestamp-
    * membership quirk (`timeseries.re:264-272` removes ANY point sharing
    * a timestamp with a matched one) — the documented divergence
    * SURVEY §7.5 #6, shared with [[graft.operators.TimeSeries.deleteRange]].
    *
    * Physical shape ([[VersionedStore.deletePartitions]]): the rewrite
    * unit is the PARTITION — the touched series' `series=` partitions in
    * the flat layout, the touched buckets' `bucket=` partitions in the
    * bucketed one (co-resident series in an affected bucket are carried
    * through the survivors dir unchanged). Survivors are fully
    * materialized in a fresh data dir BEFORE the manifest CAS publishes
    * the version — all-or-nothing, no crash window, no roll-forward.
    * Only affected partitions are ever read or rewritten; the rest of
    * the store is carried by manifest reference, so the cost scales with
    * the affected partitions' data, not store size. The deleted rows
    * stay readable at earlier versions until [[compactDisk]] expires
    * them. Per-series disk bounds are recomputed from the rewritten
    * partitions (a shrunken range can re-qualify future buffers for the
    * M1 fast path).
    */
  def delete(ids: Seq[String], fromUs: Long, toUs: Long,
             pipe: Seq[Tags.Group] = Nil): Long = this.synchronized {
    require(ids.nonEmpty, "tiered delete needs explicit series ids")
    flushLocked(ids)
    if (!diskHasData) return 0L
    val c = tip.getOrElse(return 0L)
    val matched = coalesce(
      col(SERIES).isin(ids: _*) && col(TS_US).between(fromUs, toUs) &&
        (if (pipe.isEmpty) lit(true) else Tags.predicate(col(TAG), pipe)),
      lit(false))
    // rows of every partition the delete touches (see scaladoc): flat —
    // exactly the ids' series partitions; bucketed — the ids' buckets
    // whole, so co-resident series ride into the survivors dir
    val affected = prunedCanon(c, curLayout match {
      case Some(b) =>
        val bs = ids.map(ShardStore.bucketOf(_, b)).distinct
        raw => raw.filter(col(ShardStore.BUCKET).isin(bs: _*))
      case None => raw => raw.filter(col(SERIES).isin(ids: _*))
    })
    val deleted = affected.filter(matched).count()
    if (deleted == 0L) return 0L
    VersionedStore.deletePartitions(affected.filter(!matched), root,
      affectedPartitionNames(ids), c.version, curLayout)
    refreshTip()
    diskNonEmpty = tip.exists(_.dirs.nonEmpty) // conservative: an
    // all-partitions-skipped tip still plans a (cheap, empty) scan
    ids.foreach(diskBounds.remove)
    if (diskHasData) applyBounds(collectBounds(disk(ids)))
    deleted
  }

  /** Which top-level partition names a delete of `ids` excludes from the
    * parent dirs. Flat layout: the ids' own `series=` partitions, ENCODED
    * the way Spark writes partition paths (escapePathName) so the
    * manifest skip lines match what [[VersionedStore.dirFrameRaw]]
    * decodes. Bucketed: the ids' bucket partitions (plain integers, no
    * escaping).
    */
  private def affectedPartitionNames(ids: Seq[String]): Seq[String] =
    curLayout match {
      case Some(b) =>
        ids.map(x => s"${ShardStore.BUCKET}=${ShardStore.bucketOf(x, b)}").distinct
      case None =>
        import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName
        ids.map(x => s"$SERIES=${escapePathName(x)}").distinct
    }

  /** The live disk tier's committed version chain — time travel + CDC,
    * free from the unified manifest protocol (VERDICT r11/r12 item 1).
    * History spans back to the last space-reclaiming [[compactDisk]]. */
  def diskVersions: Seq[VersionedStore.Commit] =
    VersionedStore.versions(spark, root)

  /** Time travel over the LIVE store's disk tier: its content exactly as
    * of version `v` (the buffer is not part of committed history). */
  def readDiskAt(v: Int): DataFrame = VersionedStore.readAt(spark, root, v)

  /** CDC over the LIVE store's disk tier ([[VersionedStore.readChanges]]). */
  def diskChanges(fromV: Int, toV: Int): DataFrame =
    VersionedStore.readChanges(spark, root, fromV, toV)

  /** LIVE file-hygiene compaction of the disk tier (the reference's S4
    * overlap-merge runs on every spill, `timeseries.re:119-156`; here
    * compaction is optional hygiene because overlapping files are
    * correct — see [[ShardStore]]): commit a version whose single data
    * dir holds the coalesced live content, then (by default) expire the
    * superseded history — the OPTIMIZE + VACUUM pairing, and the point
    * where deleted rows' space is actually reclaimed. With
    * `retainHistory = true` the old versions stay time-travel-readable
    * and no file is removed. The memory buffer is untouched. Cost is one
    * read+write of the disk tier; run it on the maintenance cadence, not
    * the ingest path.
    */
  def compactDisk(retainHistory: Boolean = false): Unit = this.synchronized {
    if (!diskHasData) return
    VersionedStore.compact(spark, root)
    if (!retainHistory) VersionedStore.expire(spark, root, keepLast = 1)
    refreshTip()
  }

  /** The whole store as one canonical frame (memory ∪ disk) — the input
    * for every route that has no tier-aware fast path (since/range/aggs:
    * they read both tiers anyway, and Catalyst prunes the disk side).
    * Built under the lock: the memory side is the current checkpoint, the
    * disk side the cached tip's relations — an immutable snapshot per the
    * class contract.
    */
  def snapshot: DataFrame = this.synchronized {
    val m = if (memEmpty) emptyCanon(spark) else canonSel(mem)
    if (!diskHasData) m
    else m.unionByName(readStore)
  }

  /** Number of buffered points (the membuf length, one job over the
    * bounded buffer). */
  def bufferedCount(): Long = if (memEmpty) 0L else mem.count()

  /** Whether any series' bounds were dropped on the cap (tests). */
  private[graft] def boundsOverflowed: Boolean = boundsOverflow

  /** Buffer plan depth + tracked-bounds size, for lifecycle tests. */
  private[graft] def lifecycleStats: (Int, Int) =
    (memPlanDepth(mem.queryExecution.analyzed), diskBounds.size)

  private def memPlanDepth(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
    1 + (if (p.children.isEmpty) 0 else p.children.map(memPlanDepth).max)

  /** S3 ingest-side spill policy (reference `--shard-size`,
    * `src/main.re:10`; spill at `timeseries.re:158-168`): buffer the
    * batch, then flush each series whose buffer has reached
    * `spillThreshold` points — the reference's PER-SERIES shard-size
    * check, batch-granular (a micro-batch is this design's arrival
    * unit), so a series' buffer holds < threshold + one batch.
    */
  def ingest(batch: DataFrame, seqCol: String, spillThreshold: Long): Unit =
    this.synchronized {
      appendMemory(batch, seqCol)
      val full = mem.groupBy(SERIES).agg(count(lit(1)).as("n"))
        .filter(col("n") >= spillThreshold)
        .collect().map(_.getString(0)) // bounded: buffer size / threshold
      if (full.nonEmpty) flushLocked(full.toSeq)
    }

  /** I2: per-series memory/disk length split
    * (`/root/reference/src/timeseries.re:187-213`, routes
    * `memory/length` + `disk/length`, `src/main.re:184-185`).
    * Snapshot semantics as [[snapshot]].
    */
  def lengthSplit(ids: Seq[String]): DataFrame = this.synchronized {
    val m = (if (memEmpty) emptyCanon(spark) else memCanon(ids))
      .groupBy(SERIES).agg(count(lit(1)).as("mem_len"))
    val d = disk(ids).groupBy(SERIES).agg(count(lit(1)).as("disk_len"))
    // full-outer of two series-cardinality aggregates — never a data join
    m.join(d, Seq(SERIES), "full_outer")
      .select(col(SERIES),
        coalesce(col("mem_len"), lit(0L)).as("mem_len"),
        coalesce(col("disk_len"), lit(0L)).as("disk_len"))
      .withColumn("len", col("mem_len") + col("disk_len"))
      .orderBy(SERIES)
  }
}

object TieredStore {
  /** Arrival-sequence column of the memory tier (membuf FIFO position). */
  val SEQ = "__seq"

  /** How many superseded buffer checkpoints stay alive after a mutation:
    * a returned frame remains a valid immutable snapshot for at least this
    * many subsequent mutations, then fails loudly if still unevaluated.
    */
  val RetireDepth = 8

  /** Rough series-cardinality point where the flat `series=/day=` layout's
    * per-series directory creation starts to dominate write cost
    * (ManySeriesProbe: ~36ms/series/sync on local disk); past it,
    * construct the store with `seriesBuckets = Some(n)` (64-1024 buckets
    * — enough write parallelism, bounded dir count).
    */
  val BucketLayoutThreshold = 512

  /** Cap on driver-tracked per-series disk bounds (the membuf metadata).
    * ~48 bytes/entry → a few tens of MB at the cap; beyond it new series
    * degrade to the merge/flush read paths instead of growing the map.
    */
  val DefaultMaxTrackedSeries: Int = 1 << 20

  /** Bucket count an automatic election migrates to: enough write
    * parallelism for the threshold cardinality, bounded dir count
    * (buckets×days per write, independent of series count); series
    * stays row-group-sorted inside each bucket, so growth far past the
    * threshold still prunes well. */
  val ElectedBuckets = 64

  private def emptyCanon(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Canon.schema)

  private def emptyMem(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Canon.schema.fields :+ StructField(SEQ, LongType)))
}
