package graft

import graft.model.Canon.{Datapoint, TagEntry}
import graft.sources.TieredStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crash-atomicity of the delete rewrite (VERDICT r10 item 4): the
  * multi-dir partition swap commits an intent marker before its first
  * delete, and a process that dies anywhere in the delete→rename window
  * leaves a store the NEXT open rolls forward to exactly the post-delete
  * state — no lost survivors, no resurrected rows. Also covers plain
  * reopen: a fresh instance over an existing root must see the disk tier
  * (presence + per-series bounds) instead of treating it as empty.
  */
class TieredStoreRecoverySpec extends SparkSuite {
  import spark.implicits._

  private val T0 = 1704067200000000L
  private def dp(s: String, ts: Long, rid: Long) =
    Datapoint(s, ts, Some(Seq(TagEntry("k", "1"))), rid.toDouble, rid)

  /** 2 series × 100 points each, rid = series offset + i. */
  private def seedRows: Seq[Datapoint] =
    (0L until 100L).flatMap(i =>
      Seq(dp("a", T0 + i * 1000L, i), dp("b", T0 + i * 1000L, 1000 + i)))

  private def fp(df: DataFrame): (Long, Long) = StoreTestUtil.fp(df)

  private def crashScenario(buckets: Option[Int]): Unit = {
    val root = tmpDir("tier_crash")
    val st = new TieredStore(spark, root, seriesBuckets = buckets)
    st.appendDisk(seedRows.toDF())
    // delete the middle half of both series, crashing after the old
    // partition dirs are gone but before any staged rewrite is published
    st.crashAfterDeletes = true
    val e = intercept[IllegalStateException] {
      st.delete(Seq("a", "b"), T0 + 25000L, T0 + 74000L)
    }
    assert(e.getMessage.startsWith("injected crash"), e.getMessage)
    val marker = new java.io.File(root, TieredStore.SwapMarker)
    assert(marker.exists(), "crash window must leave the intent marker")
    // the crashed store IS torn (survivor dirs unpublished) — that is the
    // bug class; recovery is the contract
    val reopened = new TieredStore(spark, root, seriesBuckets = buckets)
    val expected = seedRows.toDF().filter(
      !col("ts_us").between(T0 + 25000L, T0 + 74000L))
    assert(fp(reopened.snapshot) == fp(expected),
      s"recovered store diverges from the post-delete state (buckets=$buckets)")
    assert(!marker.exists(), "recovery must clear the marker")
    assert(!new java.io.File(root).getParentFile.listFiles()
      .exists(_.getName.startsWith(new java.io.File(root).getName + ".delete-")),
      "recovery must drop the staging dir")
    // the recovered store stays fully operational: a second (clean)
    // delete over the repaired partitions
    assert(reopened.delete(Seq("a"), T0, T0 + 10000L) == 11L)
    assert(fp(reopened.snapshot) ==
      fp(expected.filter(!(col("series") === "a" && col("ts_us") <= T0 + 10000L))))
  }

  test("crash between delete and publish: reopen rolls the swap forward (flat layout)") {
    crashScenario(None)
  }

  test("crash between delete and publish: reopen rolls the swap forward (bucketed layout)") {
    crashScenario(Some(4))
  }

  test("in-process retry after a failed swap repairs via the marker (no reopen)") {
    val root = tmpDir("tier_retry")
    val st = new TieredStore(spark, root)
    st.appendDisk(seedRows.toDF())
    st.crashAfterDeletes = true
    intercept[IllegalStateException] {
      st.delete(Seq("a", "b"), T0 + 25000L, T0 + 74000L)
    }
    st.crashAfterDeletes = false
    // the SAME instance's next mutation must roll the committed plan
    // forward BEFORE counting — without that it reads the torn listing
    // ("nothing matched"), returns 0 against missing rows, and a fresh
    // swap would overwrite the marker and orphan the staged survivors
    assert(st.delete(Seq("a", "b"), T0 + 25000L, T0 + 74000L) == 0L)
    val expected = seedRows.toDF().filter(
      !col("ts_us").between(T0 + 25000L, T0 + 74000L))
    assert(fp(st.snapshot) == fp(expected))
    assert(!new java.io.File(root, TieredStore.SwapMarker).exists())
  }

  test("zero-survivor partitions (drop fate) recover too") {
    val root = tmpDir("tier_crash_drop")
    val st = new TieredStore(spark, root)
    // disjoint ts ranges so one range wipes a (drop fate, no staged dir)
    // while b — listed in ids, so its dir is replaced — survives intact
    // through an identity rewrite (swap fate, where the crash fires)
    val rows = (0L until 100L).flatMap(i =>
      Seq(dp("a", T0 + i * 1000L, i), dp("b", T0 + 500000L + i * 1000L, 1000 + i)))
    st.appendDisk(rows.toDF())
    st.crashAfterDeletes = true
    intercept[IllegalStateException] {
      st.delete(Seq("a", "b"), T0, T0 + 200000L)
    }
    val reopened = new TieredStore(spark, root)
    assert(fp(reopened.snapshot) == fp(rows.toDF().filter(col("series") === "b")))
  }

  test("zero-length marker fails LOUDLY (never guess a direction); orphan sweep honors grace") {
    val root = tmpDir("tier_empty_marker")
    val st = new TieredStore(spark, root)
    st.appendDisk(seedRows.toDF())
    // a fresh orphan (a pre-marker crash artifact, or a concurrent
    // instance's in-flight staging): inside the grace window, NOT swept
    val orphan = new java.io.File(root + ".delete-deadbeef")
    assert(orphan.mkdir())
    assert(new java.io.File(orphan, "series=a").mkdir())
    st.sweepOrphanStaging() // default grace
    assert(orphan.exists(), "in-grace staging must survive the sweep")
    st.sweepOrphanStaging(graceMs = 0L) // explicit GC past the grace
    assert(!orphan.exists(), "post-grace orphan must be collected")
    // a zero-length marker is ambiguous (pre-commit rollback vs torn
    // committed swap whose staged dirs hold the only survivors) — the
    // store must refuse to open rather than guess and destroy data
    assert(new java.io.File(root, TieredStore.SwapMarker).createNewFile())
    val e = intercept[IllegalStateException] { new TieredStore(spark, root) }
    assert(e.getMessage.contains("empty swap marker"), e.getMessage)
    assert(new java.io.File(root, TieredStore.SwapMarker).exists(),
      "the ambiguous marker must be left in place for manual remediation")
    // manual rollback (the pre-commit case): delete the marker, reopen
    assert(new java.io.File(root, TieredStore.SwapMarker).delete())
    assert(fp(new TieredStore(spark, root).snapshot) == fp(seedRows.toDF()))
  }

  test("reopen hydration respects the bounds cap: untracked series degrade, stay correct") {
    val root = tmpDir("tier_cap_reopen")
    new TieredStore(spark, root).appendDisk(seedRows.toDF()) // 2 series
    // cap 0 -> NO series tracked after hydration (deterministic: with a
    // nonzero cap, WHICH series lands in rows.take(cap) depends on
    // aggregate output order), overflow set -> every series must read
    // right via the conservative merge path even with an overlapping
    // buffer
    val reopened = new TieredStore(spark, root, maxTrackedSeries = 0)
    assert(reopened.lifecycleStats._2 == 0 && reopened.boundsOverflowed)
    reopened.appendMemory(
      Seq((dp("b", T0 + 50500L, 7777L), 0L)).toDF("d", TieredStore.SEQ)
        .select(col("d.*"), col(TieredStore.SEQ)),
      TieredStore.SEQ)
    val last = reopened.readLast(Seq("b"), 1).select("rid").as[Long].collect()
    assert(last.toSeq == Seq(1099L), s"capped reopen mis-read: ${last.toSeq}")
    // the MIXED state (0 < cap < series count): exactly one series
    // tracked (whichever the aggregate emitted first — unspecified),
    // overflow set, and BOTH series must read right with overlapping
    // buffers — covering the tracked and the conservative untracked
    // path regardless of which series drew which
    val mixed = new TieredStore(spark, root, maxTrackedSeries = 1)
    assert(mixed.lifecycleStats._2 == 1 && mixed.boundsOverflowed,
      s"mixed hydration state: ${mixed.lifecycleStats}")
    mixed.appendMemory(
      Seq((dp("a", T0 + 50500L, 8888L), 0L), (dp("b", T0 + 50500L, 9999L), 1L))
        .toDF("d", TieredStore.SEQ)
        .select(col("d.*"), col(TieredStore.SEQ)),
      TieredStore.SEQ)
    val lastA = mixed.readLast(Seq("a"), 1).select("rid").as[Long].collect()
    val lastB = mixed.readLast(Seq("b"), 1).select("rid").as[Long].collect()
    assert(lastA.toSeq == Seq(99L) && lastB.toSeq == Seq(1099L),
      s"mixed-cap reopen mis-read: a=${lastA.toSeq} b=${lastB.toSeq}")
  }

  test("plain reopen hydrates disk presence and per-series bounds") {
    val root = tmpDir("tier_reopen")
    val st = new TieredStore(spark, root)
    st.appendDisk(seedRows.toDF())
    val reopened = new TieredStore(spark, root)
    // presence: the disk tier is visible without any write
    assert(fp(reopened.snapshot) == fp(seedRows.toDF()))
    // bounds: a buffer that OVERLAPS the reopened disk range must not
    // qualify for the memory-only path — last-1 of series a is the disk
    // tail (rid 99), not the older buffered point
    reopened.appendMemory(
      Seq((dp("a", T0 + 50500L, 7777L), 0L)).toDF("d", TieredStore.SEQ)
        .select(col("d.*"), col(TieredStore.SEQ)),
      TieredStore.SEQ)
    val last = reopened.readLast(Seq("a"), 1).select("rid").as[Long].collect()
    assert(last.toSeq == Seq(99L),
      s"reopened store mis-qualified an overlapping buffer: got ${last.toSeq}")
  }
}
