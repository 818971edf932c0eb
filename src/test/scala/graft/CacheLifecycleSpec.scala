package graft

import graft.operators.{Dedup, Events, Ranking, Windowing}
import org.apache.spark.sql.functions._

/** Cache lifecycle: operator-internal persists (pair indexes, pid-pinned
  * range frames) must be RELEASED when the consuming query completes —
  * a long-lived session cycling distinct corpora must not accumulate
  * cache entries (disk blocks are not LRU-evicted). The ledger contract:
  * operators register via trackedCache, drivers wrap consumption in
  * `CacheLedger.scoped`, storage returns to baseline at scope exit.
  */
class CacheLifecycleSpec extends SparkSuite {
  import spark.implicits._

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keys.toSet

  private def corpus(seed: Int) = {
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    (0 until 60).map { i =>
      val toks = (0 until 12).map(j => words((i * (seed + 2) + j * j) % words.size))
      (i.toLong + seed * 1000L, toks.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("pair operators release internal caches at scope exit, across corpora cycles") {
    val baseline = persistedIds
    var sawCached = false
    (1 to 3).foreach { seed =>
      CacheLedger.scoped {
        assert(Dedup.ngramJaccardPairs(corpus(seed), 3, 0.3).count() >= 0)
        // the internal indexes (shingle sets, prefix index, pair list)
        // really were persisted — the release below is not vacuous
        sawCached |= (persistedIds -- baseline).nonEmpty
      }
      assert((persistedIds -- baseline).isEmpty,
        s"cycle $seed leaked persistent RDDs: ${persistedIds -- baseline}")
    }
    assert(sawCached, "expected the operator to persist internal indexes mid-scope")
  }

  test("two-pass pid frames (Windowing/Ranking/Events) release at scope exit") {
    val baseline = persistedIds
    val events = (0 until 200).map(i =>
      (i.toLong, (i % 7).toLong, i.toLong * 1000000L, (i % 3).toLong))
      .toDF("event_id", "user_id", "ts_us", "v")
    CacheLedger.scoped {
      val ma = Windowing.movingSumCount(events, Seq("user_id"),
        Seq(col("ts_us").asc, col("event_id").asc), col("v"), 3, "ms", "mc")
      assert(ma.count() == 200)
      val nt = Ranking.withNtile(events, 4, Seq(col("v").asc, col("event_id").asc), "bucket")
      assert(nt.count() == 200)
      val se = Events.sessionizeScalable(events, gapUs = 5000000L)
      assert(se.count() == 200)
      assert((persistedIds -- baseline).nonEmpty,
        "expected pid-pinned frames to be persisted mid-scope")
    }
    assert((persistedIds -- baseline).isEmpty,
      s"two-pass operators leaked persistent RDDs: ${persistedIds -- baseline}")
  }

  test("unscoped registrations land in the session ledger and releaseAll reclaims them") {
    val baseline = persistedIds
    assert(Dedup.ngramJaccardPairs(corpus(9), 3, 0.3).count() >= 0)
    CacheLedger.releaseAll()
    assert((persistedIds -- baseline).isEmpty,
      s"releaseAll left persistent RDDs: ${persistedIds -- baseline}")
  }
}
