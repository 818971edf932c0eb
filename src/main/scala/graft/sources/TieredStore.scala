package graft.sources

import graft.functions.Tags
import graft.model.Canon
import graft.model.Canon._
import graft.operators.{TimeSeries => TS}
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CheckpointBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** M1-M3 + I2: the dual-tier store — an in-memory arrival buffer layered
  * over the [[ShardStore]] disk tier, replicating the reference's
  * membuf-plus-shards read semantics
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
  * **Snapshot contract**: every frame this class returns (readLast,
  * snapshot, lengthSplit) is built under the store lock from the
  * checkpointed buffer plus a parquet relation whose file listing Spark
  * pins at construction — an immutable snapshot of the store at call time.
  * Superseded buffer checkpoints are kept alive for [[TieredStore.RetireDepth]]
  * further mutations so in-flight readers stay valid; past that horizon
  * their blocks are dropped and a stale reader fails LOUDLY
  * (checkpoint-block-not-found) — never a silently doubled or stale answer.
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
  * partitioned ShardStore, whose series/day pruning does the heavy lifting;
  * the M1 verdict's value at scale is skipping the disk scan ENTIRELY for
  * hot-tail reads (the common monitoring access pattern). Divergences from
  * the reference, documented: (1) membufq's `is_ascending` compares only
  * the NEWEST buffered point against the disk bound
  * (`src/membufq.re:23-27`), which admits a buffer whose tail dips below
  * it; we require the whole buffer beyond the bound. (2) The bound check is
  * STRICT (`min(buffer ts) > disk max ts`): at a shared timestamp the
  * (ts desc, rid desc) order can rank a disk row above a buffered one, so a
  * tie must not qualify for the memory-only path — it degrades to the
  * merge/flush paths, never to a wrong answer.
  *
  * Mutations are serialized on the store instance — the concurrency model
  * the reference enforces globally (`src/main.re:225-227`).
  *
  * @param seriesBuckets None = the reference-faithful `series=/day=`
  *   layout (one dir per series — perfect pruning, right for the
  *   reference's handful-of-series model). Some(b) = the bucketed
  *   high-cardinality layout (`bucket=/day=`, series as an ordinary
  *   column): choose it when the store will hold more than roughly
  *   [[TieredStore.BucketLayoutThreshold]] series — past that, the flat
  *   layout's per-series directory creation dominates sync cost
  *   (ManySeriesProbe: 36s/1k series flat vs seconds bucketed). Reads
  *   are layout-invisible (same rows, same order — property-tested);
  *   the layout is fixed at store creation.
  */
final class TieredStore(spark: SparkSession, val root: String,
                        val maxTrackedSeries: Int = TieredStore.DefaultMaxTrackedSeries,
                        val seriesBuckets: Option[Int] = None) {
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

  // ---- open/reopen: complete any interrupted delete swap (the intent
  // marker is the commit point — see swapPartitions), then rebuild the
  // reference's startup membuf metadata for a pre-existing root: disk
  // presence plus per-series bounds, via ONE column-pruned (series,
  // ts_us) aggregate whose output is series-cardinality-bounded (and
  // capped) — without it a reopened store would treat its disk tier as
  // empty and mis-qualify buffers for the M1 memory-only path. A fresh
  // scratch root (every streaming/test store) skips all of this on a
  // single existence check.
  locally {
    val fs = storeFs
    if (fs.exists(new Path(root))) {
      recoverSwap()
      sweepOrphanStaging()
      if (partDirs(fs, new Path(root)).nonEmpty) hydrateBounds()
    }
  }

  /** Cap-bounded reopen hydration: per-series bounds via one aggregate,
    * but the COLLECT is limited to maxTrackedSeries+1 rows — a store
    * holding millions of series must not pull one row per series to the
    * driver just to discard the overflow (every other updateBounds call
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

  /** Layout-dispatched disk append (see `seriesBuckets`). */
  private def appendStore(df: DataFrame): Unit = seriesBuckets match {
    case Some(b) => ShardStore.appendBucketed(df, root, b)
    case None    => ShardStore.append(df, root)
  }

  /** Layout-dispatched whole-store read. */
  private def readStore: DataFrame = seriesBuckets match {
    case Some(_) => ShardStore.readBucketedStore(spark, root)
    case None    => ShardStore.read(spark, root)
  }

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

  /** Direct-to-disk append (the batch ingest path). */
  def appendDisk(df: DataFrame): Unit = this.synchronized {
    val slice = canonSel(df)
    appendStore(slice)
    updateBounds(slice)
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
    * buffer moves as one unfiltered write; bounds update from the same
    * aggregate updateBounds always runs.
    */
  def sync(): Unit = this.synchronized {
    if (!memEmpty) {
      val moving = canonSel(mem)
      appendStore(moving)
      updateBounds(moving)
      swapMem(emptyMem(spark))
      memEmpty = true
    }
  }

  private def flushLocked(ids: Seq[String]): Unit = if (!memEmpty) {
    val moving = canonSel(mem.filter(col(SERIES).isin(ids: _*)))
    appendStore(moving)
    updateBounds(moving)
    swapMem(mem.filter(!col(SERIES).isin(ids: _*)))
    if (mem.isEmpty) { swapMem(emptyMem(spark)); memEmpty = true }
  }

  private def updateBounds(slice: DataFrame): Unit = {
    val rows = slice.groupBy(SERIES).agg(min(TS_US).as("lo"), max(TS_US).as("hi"))
      .collect() // bounded by series cardinality, capped at maxTrackedSeries
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

  private def disk(ids: Seq[String]): DataFrame =
    if (!diskHasData) emptyCanon(spark)
    else seriesBuckets match {
      case Some(b) => ShardStore.readBuckets(spark, root, ids, b)
      case None    => TS.selectSeries(ShardStore.read(spark, root), ids)
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
    * physically rewrite the affected series' disk partitions without the
    * matched rows, so every subsequent read of this store sees fewer
    * points. Returns the deleted-point count — the observable effect
    * behind the reference's bare "ok" reply.
    *
    * Matched-row semantics, not the reference's delete-by-timestamp-
    * membership quirk (`timeseries.re:264-272` removes ANY point sharing
    * a timestamp with a matched one) — the documented divergence
    * SURVEY §7.5 #6, shared with [[graft.operators.TimeSeries.deleteRange]].
    *
    * Physical shape: the rewrite unit is the PARTITION DIR — the touched
    * series' `series=<id>` dirs in the flat layout, the touched buckets'
    * `bucket=<b>` dirs in the bucketed one (co-resident series in an
    * affected bucket are carried through the staged rewrite unchanged).
    * Survivors are STAGED to a sibling directory — fully materialized
    * before any source file is touched — then the affected dirs are
    * swapped (delete old, rename staged in). Only affected partitions are
    * ever read or rewritten; the rest of the store is untouched, so the
    * cost scales with the affected partitions' data, not store size. A
    * previously returned snapshot that still references a removed file
    * fails LOUDLY on evaluation (the class snapshot contract) — never a
    * silently stale answer. Per-series disk bounds are recomputed from
    * the rewritten partitions (a shrunken range can re-qualify future
    * buffers for the M1 fast path).
    */
  def delete(ids: Seq[String], fromUs: Long, toUs: Long,
             pipe: Seq[Tags.Group] = Nil): Long = this.synchronized {
    require(ids.nonEmpty, "tiered delete needs explicit series ids")
    recoverSwap() // a failed prior swap on THIS instance must publish its
    // survivors before we count/rewrite, or the torn listing reads as
    // "nothing matched" and the delete returns 0 against missing rows
    flushLocked(ids)
    if (!diskHasData) return 0L
    val matched = coalesce(
      col(SERIES).isin(ids: _*) && col(TS_US).between(fromUs, toUs) &&
        (if (pipe.isEmpty) lit(true) else Tags.predicate(col(TAG), pipe)),
      lit(false))
    // rows of every partition dir the delete touches (see scaladoc)
    val affected = seriesBuckets match {
      case Some(b) =>
        val bs = ids.map(ShardStore.bucketOf(_, b)).distinct
        canonSel(spark.read.parquet(root)
          .filter(col(ShardStore.BUCKET).isin(bs: _*)))
      case None => TS.selectSeries(ShardStore.read(spark, root), ids)
    }
    val deleted = affected.filter(matched).count()
    if (deleted == 0L) return 0L
    val staging = s"$root.delete-${java.util.UUID.randomUUID().toString.take(8)}"
    seriesBuckets match {
      case Some(b) => ShardStore.appendBucketed(affected.filter(!matched), staging, b)
      case None    => ShardStore.rewrite(affected.filter(!matched), staging)
    }
    swapPartitions(staging, replacedDirPredicate(ids))
    ids.foreach(diskBounds.remove)
    if (diskHasData) updateBounds(disk(ids))
    deleted
  }

  /** Which top-level partition dirs a delete of `ids` replaces. Flat
    * layout: the ids' own `series=` dirs, matched by DECODING the listing
    * (Spark partition-path escaping) rather than re-encoding the id, so
    * escaped series names swap correctly. Bucketed: the ids' bucket dirs
    * (plain integers, no escaping).
    */
  private def replacedDirPredicate(ids: Seq[String]): String => Boolean =
    seriesBuckets match {
      case Some(b) =>
        val names = ids.map(x => s"${ShardStore.BUCKET}=${ShardStore.bucketOf(x, b)}").toSet
        names.contains _
      case None =>
        import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName
        val idSet = ids.toSet
        (n: String) => n.startsWith("series=") &&
          idSet(unescapePathName(n.stripPrefix("series=")))
    }

  private def storeFs = new Path(root).getFileSystem(spark.sessionState.newHadoopConf())

  private def partDirs(fs: org.apache.hadoop.fs.FileSystem, p: Path): Seq[FileStatus] =
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.filter(_.getPath.getName.contains("="))

  /** Fault injection for [[TieredStoreRecoverySpec]]: when set, the swap
    * throws inside its crash window (old dirs deleted, staged dirs not
    * yet published) — the state recovery must repair. Never set in
    * production paths. */
  private[graft] var crashAfterDeletes = false

  /** Swap the affected partition dirs for their staged rewrites. A
    * partition with zero survivors has no staged dir and ends fully
    * removed.
    *
    * Crash-atomicity contract (ADVICE r9/r10): the multi-dir swap cannot
    * be one atomic rename, so an INTENT MARKER (`_swap_inprogress`,
    * atomically renamed into the root — `_`-prefixed, invisible to
    * parquet listings) is committed BEFORE the first delete. It names the
    * staging dir and each touched partition's fate (`swap` = staged
    * replacement exists, `drop` = zero survivors), so a crash anywhere in
    * the delete→rename window rolls FORWARD deterministically on the next
    * open ([[recoverSwap]]): every fate is re-applied idempotently and
    * the marker is removed last. Before the marker lands, a crash leaves
    * the store untouched (the orphaned staging dir is inert — a new
    * delete stages under a fresh UUID). The marker IS the commit point.
    */
  private def swapPartitions(staging: String, replaced: String => Boolean): Unit = {
    val fs = storeFs
    val rootPath = new Path(root)
    val stagingPath = new Path(staging)
    // roll forward any interrupted predecessor FIRST: a live instance
    // that survived an applySwap failure (transient IO error, not a
    // crash) must neither plan from the torn listing nor overwrite the
    // committed marker — rename would replace it on a local FS and
    // orphan the old plan's staged survivors permanently
    recoverSwap()
    val replacedNames = partDirs(fs, rootPath).map(_.getPath.getName).filter(replaced)
    val stagedNames = partDirs(fs, stagingPath).map(_.getPath.getName)
    val dropNames = {
      val staged = stagedNames.toSet // Seq.contains is a linear scan: a
      // compactDisk over a high-cardinality flat store swaps thousands
      // of dirs, and O(staged x replaced) string scans sit inside the lock
      replacedNames.filterNot(staged)
    }
    // commit point: the marker (staging + per-dir fates), atomic rename in
    val marker = new Path(rootPath, SwapMarker)
    val tmp = new Path(rootPath, SwapMarker + ".tmp")
    val body = (s"staging $staging" +:
      (stagedNames.map("swap " + _) ++ dropNames.map("drop " + _)))
      .mkString("", "\n", "\n")
    // durable (forced, full-write-looped) marker bytes BEFORE the
    // rename — see DurableWrite for the journaling hazard and the
    // ChecksumFileSystem hsync caveat
    DurableWrite.write(fs, tmp, body.getBytes("UTF-8"))
    require(fs.rename(tmp, marker), s"failed to commit swap marker $marker")
    try applySwap(fs, staging, stagedNames, dropNames)
    catch {
      case scala.util.control.NonFatal(e) =>
        // best-effort immediate repair: the marker is committed, so the
        // plan can roll forward right now; if it does (marker gone), the
        // swap IS complete and the failure was transient — proceed. If
        // repair also fails, surface the original error (the next
        // mutation or open retries via the marker).
        try recoverSwap() catch { case scala.util.control.NonFatal(_) => () }
        if (fs.exists(marker)) throw e
    }
    diskNonEmpty = partDirs(fs, rootPath).nonEmpty
  }

  /** The marker-committed swap plan, idempotent: drop the zero-survivor
    * dirs, then for each staged dir still in staging remove any old root
    * sibling and rename the staged one in; staging dir and marker go
    * last. Re-runnable from any intermediate crash state. */
  private def applySwap(fs: org.apache.hadoop.fs.FileSystem, staging: String,
                        swapNames: Seq[String], dropNames: Seq[String]): Unit = {
    val rootPath = new Path(root)
    val stagingPath = new Path(staging)
    dropNames.foreach { n =>
      val p = new Path(rootPath, n); if (fs.exists(p)) fs.delete(p, true)
    }
    swapNames.foreach { n =>
      val staged = new Path(stagingPath, n)
      if (fs.exists(staged)) { // absent = already published by a prior pass
        val old = new Path(rootPath, n)
        if (fs.exists(old)) fs.delete(old, true)
        if (crashAfterDeletes) throw new IllegalStateException(
          s"injected crash: old dirs deleted, $staged unpublished")
        require(fs.rename(staged, old), s"failed to publish $staged into $root")
      }
    }
    if (fs.exists(stagingPath)) fs.delete(stagingPath, true)
    fs.delete(new Path(rootPath, SwapMarker), false)
  }

  /** Complete an interrupted partition swap (constructor-time): if the
    * intent marker exists, the previous process crashed inside
    * [[swapPartitions]]'s delete→rename window — re-apply the recorded
    * plan (roll forward; the marker is the commit point, so the delete
    * HAS logically happened) and clear the marker. No-op otherwise. */
  private def recoverSwap(): Unit = {
    val fs = storeFs
    val marker = new Path(root, SwapMarker)
    if (!fs.exists(marker)) return
    val in = fs.open(marker)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val lines = body.linesIterator.filter(_.nonEmpty).toSeq
    if (lines.isEmpty) {
      // a zero-length marker should be impossible now (the marker bytes
      // are FileChannel.force'd / hsync'd before the rename) — and it is
      // NOT safe to guess a direction: pre-commit means roll back, but
      // mid-applySwap with lost data blocks means the staged dirs hold
      // the only copy of the survivors. Fail LOUDLY and keep everything.
      throw new IllegalStateException(
        s"empty swap marker $marker: cannot distinguish a pre-commit " +
        "crash (delete the marker to roll back) from a torn committed " +
        "swap (publish the staging sibling's partition dirs first). " +
        "Inspect the store root and its .delete-*/.compact-* siblings.")
    }
    val staging = lines.collectFirst { case l if l.startsWith("staging ") =>
      l.stripPrefix("staging ") }.getOrElse(
      throw new IllegalStateException(
        s"corrupt swap marker $marker (no 'staging' line).\n" +
        "Manual remediation: inspect the staging sibling dirs of the " +
        "store root; if the listed partitions are intact in the root, " +
        "delete the marker (rollback); if staged copies are the " +
        "survivors, rename them in first. Marker body:\n" + body))
    applySwap(fs, staging,
      lines.collect { case l if l.startsWith("swap ") => l.stripPrefix("swap ") },
      lines.collect { case l if l.startsWith("drop ") => l.stripPrefix("drop ") })
  }

  /** Open-time garbage collection of orphaned staging dirs: a crash
    * BEFORE the marker commits leaves a fully-staged
    * `<root>.delete-<uuid>` / `<root>.compact-<uuid>` sibling that
    * nothing references — correct but unbounded (a compact staging dir
    * is a copy of the whole disk tier). Any marker was already rolled
    * forward by [[recoverSwap]], so a sibling OLDER than the grace
    * period is unreferenced; the grace window protects the in-flight
    * staging of a concurrent instance (a single-writer-contract
    * violation, but one the recovery spec itself constructs) from
    * being swept mid-swap. */
  private[graft] def sweepOrphanStaging(
      graceMs: Long = TieredStore.StagingGraceMs): Unit = {
    val fs = storeFs
    val rootPath = new Path(root)
    val parent = rootPath.getParent
    if (parent == null || !fs.exists(parent)) return
    val prefix = rootPath.getName
    val cutoff = System.currentTimeMillis() - graceMs
    fs.listStatus(parent).foreach { st =>
      val n = st.getPath.getName
      // two guards before deleting a sibling: (1) a `_temporary` child
      // means a Spark write job is (or was) mid-flight into it — an
      // ACTIVE writer's staging must never be swept (two instances on
      // one root violate the single-writer contract, but a scaladoc
      // contract must not be the only thing between a race and silent
      // survivor loss); (2) the grace window covers the gap between a
      // writer's job commit (which removes `_temporary` and refreshes
      // the mtime) and its swap. Accretion stays BOUNDED under
      // crash-restart loops: every open sweeps all orphans older than
      // the grace, so at any moment the survivors are at most the
      // orphans created in the last graceMs (plus died-mid-write
      // `_temporary` carcasses, which the next post-grace open without
      // a live writer collects via the mtime check once their job is
      // provably dead — conservatively never, if a writer could still
      // exist; disk cost is then bounded by contract violations, not
      // by crashes).
      if ((n.startsWith(prefix + ".delete-") || n.startsWith(prefix + ".compact-"))
          && st.getModificationTime < cutoff
          && !fs.exists(new Path(st.getPath, "_temporary")))
        fs.delete(st.getPath, true)
    }
  }

  /** LIVE file-hygiene compaction of the disk tier (the reference's S4
    * overlap-merge runs on every spill, `timeseries.re:119-156`; here
    * compaction is optional hygiene because overlapping files are
    * correct — see [[ShardStore]]): rewrite the whole disk tier
    * coalesced into a staging dir, then publish it through the SAME
    * marker-committed atomic swap the delete rewrite uses — a crash at
    * any point leaves a store the next open completes ([[recoverSwap]]),
    * and the content fingerprint is identical before/after (property
    * in `BucketedLayoutSpec`). The memory buffer is untouched. Cost is
    * one read+write of the disk tier; run it on the maintenance cadence,
    * not the ingest path.
    */
  def compactDisk(): Unit = this.synchronized {
    recoverSwap()
    if (!diskHasData) return
    val staging = s"$root.compact-${java.util.UUID.randomUUID().toString.take(8)}"
    seriesBuckets match {
      case Some(b) => ShardStore.compactBucketed(spark, root, staging, b)
      case None    => ShardStore.compact(spark, root, staging)
    }
    swapPartitions(staging, _ => true)
  }

  /** The whole store as one canonical frame (memory ∪ disk) — the input
    * for every route that has no tier-aware fast path (since/range/aggs:
    * they read both tiers anyway, and Catalyst prunes the disk side).
    * Built under the lock: the memory side is the current checkpoint, the
    * disk side a relation whose file listing is pinned at construction —
    * an immutable snapshot per the class contract.
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

  /** Delete-swap intent marker file name (`_`-prefixed: parquet listings
    * ignore it). Present only inside a swap's crash window; completed
    * forward by [[TieredStore.recoverSwap]] on the next open. */
  val SwapMarker = "_swap_inprogress"

  /** Grace period before an unreferenced `.delete-*`/`.compact-*`
    * staging sibling is garbage-collected at open: long enough that any
    * concurrent instance's in-flight swap (seconds) is never swept,
    * short enough that crash orphans go at the next open. */
  val StagingGraceMs: Long = 60L * 60 * 1000

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

  private def emptyCanon(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Canon.schema)

  private def emptyMem(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Canon.schema.fields :+ StructField(SEQ, LongType)))
}
