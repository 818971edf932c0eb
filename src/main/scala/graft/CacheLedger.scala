package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel
import scala.collection.mutable

/** Lifecycle registry for the operators' INTERNAL caches.
  *
  * Several operators persist internal indexes (shingle sets, prefix
  * indexes, pair lists, the pid-pinned range frames of the two-pass
  * window machinery) that feed multiple sibling branches of one query.
  * Spark's SQL `CacheManager` holds strong references to those entries
  * until an explicit `unpersist` — the operator itself cannot release
  * them because its result is consumed lazily, AFTER it returns. A
  * long-lived session cycling many corpora through the operators would
  * otherwise accumulate cache entries (disk blocks are not LRU-evicted)
  * until executor disks fill.
  *
  * The contract:
  *  - operators register every internal persist via [[Tracked.trackedCache]];
  *  - a DRIVER OF QUERIES (Verify, Bench, a user session) wraps each
  *    query's build-and-consume in [[scoped]]`{ ... }` — at scope exit all
  *    caches registered on that thread during the block are unpersisted
  *    (blocking = false);
  *  - registrations outside any scope land in a session-level ledger,
  *    releasable wholesale with [[releaseAll]] (or
  *    `spark.catalog.clearCache()`).
  *
  * Consume results INSIDE the scope: after release, re-collecting a
  * returned frame recomputes without the cache — correct for plain
  * indexes, but the pid-stability frames (Windowing/Ranking/Events) rely
  * on the materialized blocks for cross-branch partition-id consistency,
  * so a post-release re-execution re-enters the AQE hazard they exist to
  * pin. Scopes nest per thread; each releases only its own frames.
  */
object CacheLedger {

  final class Scope private[CacheLedger] () {
    private val actions = mutable.ListBuffer.empty[() => Unit]
    private[CacheLedger] def add(a: () => Unit): Unit =
      actions.synchronized { actions += a }
    def release(): Unit = {
      val as = actions.synchronized { val v = actions.toList; actions.clear(); v }
      // unpersist of an already-released/cleared frame is a no-op, so the
      // manual mid-operator unpersists (Dedup.clustersFromPairs) and a
      // concurrent clearCache() stay safe; fatal VM errors propagate and
      // a thread interrupt mid-release keeps its flag
      as.foreach { a =>
        try a()
        catch {
          case _: InterruptedException => Thread.currentThread().interrupt()
          case scala.util.control.NonFatal(_) => ()
        }
      }
    }
  }

  private val stack = new ThreadLocal[List[Scope]] {
    override def initialValue: List[Scope] = Nil
  }
  private val session = new Scope

  /** Register a persisted frame for release at the innermost active scope
    * on this thread (or the session ledger when none is open).
    */
  def register(df: DataFrame): DataFrame = {
    current.add(() => df.unpersist(blocking = false))
    df
  }

  /** Register an eager `localCheckpoint` frame: its blocks belong to the
    * underlying RDD, not the SQL CacheManager, so scope exit must release
    * through [[org.apache.spark.sql.graft.CheckpointBridge]] — same
    * consume-inside-the-scope contract as [[register]], with the same
    * loud post-release failure mode (checkpoint block not found).
    */
  def registerCheckpoint(df: DataFrame): DataFrame = {
    current.add(() =>
      org.apache.spark.sql.graft.CheckpointBridge.releaseCheckpoint(df))
    df
  }

  private def current: Scope =
    stack.get() match { case s :: _ => s; case Nil => session }

  /** Run `f` with a fresh scope; unpersist everything registered on this
    * thread inside it when the block exits (normally or not).
    */
  def scoped[T](f: => T): T = {
    val s = new Scope
    stack.set(s :: stack.get())
    try f
    finally { stack.set(stack.get().tail); s.release() }
  }

  /** Release the session-level ledger (caches registered outside scopes). */
  def releaseAll(): Unit = session.release()

  implicit final class Tracked(private val df: DataFrame) extends AnyVal {
    /** `persist(MEMORY_AND_DISK)` (the `Dataset.cache()` level) + ledger
      * registration — the required form for operator-internal caches.
      */
    def trackedCache: DataFrame = register(df.persist(StorageLevel.MEMORY_AND_DISK))
  }
}
