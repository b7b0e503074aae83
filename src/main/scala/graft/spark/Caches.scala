package graft.spark

import org.apache.spark.sql.Dataset

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
  * boundaries. Unpersisting is idempotent, so ops that already release
  * their caches eagerly (the graph family) may register them too — the
  * drain is then a no-op for those frames. Thread-safe; registration
  * order is preserved but irrelevant (unpersist is independent per
  * frame and non-blocking).
  */
object Caches {

  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Track a persisted frame for the next [[drain]]. Returns the SAME
    * dataset reference (attribute resolution via `df("col")` keeps
    * working on the registered frame).
    */
  def register[T](ds: Dataset[T]): Dataset[T] = { frames.add(ds); ds }

  /** Unpersist every registered frame (non-blocking) and forget them. */
  def drain(): Unit = {
    var d = frames.poll()
    while (d != null) { d.unpersist(blocking = false); d = frames.poll() }
  }

  /** Number of currently tracked frames (test/diagnostic surface). */
  def tracked: Int = frames.size()

  /** Postfix registration for persist chains:
    * `df.persist(...).registered`.
    */
  implicit final class RegisteredFrame[T](private val ds: Dataset[T])
      extends AnyVal {
    def registered: Dataset[T] = register(ds)
  }
}
