package graft.spark

import org.apache.spark.sql.{Dataset, SparkSession}

/** Session-scoped registry of the frames the library persists
  * internally — the cache-lifecycle CONTRACT the ops could not express
  * alone: an op that persists an intermediate (band tables, shingle
  * sets, ranked kNN frames, BM25 hits) cannot unpersist it before
  * returning, because the caller's FIRST action is what fills and
  * reads the cache. Ops therefore `.registered` every internal persist
  * here, and the caller releases them all with ONE [[drain]] call once
  * it has materialized (collected / written) what it needs:
  *
  * {{{
  *   val pairs = TrainingOps.minhashPairs(docs).collect()
  *   graft.spark.Caches.drain()   // nothing left pinned in executor storage
  * }}}
  *
  * `drain()` is what the harness (`graft.Verify`) runs between queries;
  * a user composing ops in one session calls it at their own batch
  * boundaries. The registry is keyed by the frame's OWNING
  * `SparkSession`, so two sessions in one JVM (or a test harness
  * driving several) never see each other's frames — session A's drain
  * cannot unpersist a frame session B is still filling. Within one
  * session, concurrent queries share the registry by design (persist /
  * unpersist are storage-level hints, and the drain is the caller's
  * own batch boundary). Unpersisting is idempotent, so ops that
  * already release their caches eagerly (the graph family) may
  * register them too — the drain is then a no-op for those frames.
  * Thread-safe; registration order is preserved but irrelevant
  * (unpersist is independent per frame and non-blocking).
  */
object Caches {

  private val bySession = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]]()

  /** Track a persisted frame for the next [[drain]] of its session.
    * Returns the SAME dataset reference (attribute resolution via
    * `df("col")` keeps working on the registered frame).
    */
  def register[T](ds: Dataset[T]): Dataset[T] = {
    bySession
      .computeIfAbsent(ds.sparkSession,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]())
      .add(ds)
    ds
  }

  /** Unpersist every frame registered under `session` (non-blocking)
    * and forget them.
    */
  def drain(session: SparkSession): Unit = {
    val q = bySession.remove(session)
    if (q != null) {
      var d = q.poll()
      while (d != null) { d.unpersist(blocking = false); d = q.poll() }
    }
  }

  /** Drop registry entries whose session's context has stopped — their
    * frames are gone with the executors, and a long-lived JVM cycling
    * sessions (a test harness, a notebook kernel) must not accumulate
    * dead queues.
    */
  private def purgeStopped(): Unit =
    bySession.keySet().forEach { s =>
      if (s.sparkContext.isStopped) bySession.remove(s)
    }

  /** Drain the calling thread's live session (active, else default);
    * with neither (teardown paths), drain every session's — the
    * conservative closing sweep.
    *
    * Constraint for the `newSession()` pattern (many sessions sharing
    * one SparkContext, never individually stopped): no-arg `drain()`
    * only sees the caller's session, so a sibling session abandoned
    * WITHOUT a `drain(session)` keeps its frames pinned until the
    * context stops. Call `drain(session)` at each job's end, or
    * [[drainAll]] at a global maintenance point.
    */
  def drain(): Unit = {
    purgeStopped()
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession) match {
      case Some(s) => drain(s)
      case None => bySession.keySet().forEach(s => drain(s))
    }
  }

  /** Unpersist EVERY tracked frame across all sessions — the harness /
    * global-maintenance sweep (and the escape hatch for shared-context
    * sibling sessions abandoned without their own drain).
    */
  def drainAll(): Unit = bySession.keySet().forEach(s => drain(s))

  /** Number of currently tracked frames for the calling thread's live
    * session — all live sessions when none is current
    * (test/diagnostic surface; stopped sessions never count).
    */
  def tracked: Int = {
    purgeStopped()
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession) match {
      case Some(s) =>
        val q = bySession.get(s)
        if (q == null) 0 else q.size()
      case None =>
        var n = 0
        bySession.values().forEach(q => n += q.size())
        n
    }
  }

  /** Postfix registration for persist chains:
    * `df.persist(...).registered`.
    */
  implicit final class RegisteredFrame[T](private val ds: Dataset[T])
      extends AnyVal {
    def registered: Dataset[T] = register(ds)
  }
}
