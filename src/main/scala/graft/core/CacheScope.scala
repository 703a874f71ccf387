package graft.core

import org.apache.spark.sql.Dataset

/** Deterministic release bracket for operator-managed caches.
  *
  * Several operators persist an intermediate that the CALLER's
  * consumption still reads after the operator returns — the dedup
  * survivor maps ([[graft.dedup.Dedup.resolveChains]]), component
  * labelings ([[graft.dedup.Dedup.connectedComponents]]), the curation
  * survivor corpus ([[graft.curation.Curation.curateCorpus]]), the
  * bigram-LM model tables, and the IVF probe assignment. Those persists
  * cannot be released inside the operator (the result would recompute
  * its whole upstream on first use), so historically they leaked until
  * someone called `spark.catalog.clearCache()` — which is what inflated
  * the round-6 benchmark 7× (~50 queries of accumulated survivor-map
  * storage sitting in front of each measurement) and is exactly what a
  * long-running curation service cannot afford.
  *
  * [[withReleased]] makes the lifecycle explicit: every operator-managed
  * persist registered while the bracket is open is unpersisted when it
  * closes, without touching caches the application created outside it
  * (unlike `clearCache`, which nukes everything).
  *
  * {{{
  * val report = CacheScope.withReleased {
  *   val labels = Dedup.connectedComponents(pairs)
  *   labels.groupBy("component_id").count().collect()   // consume INSIDE
  * }
  * // storage empty again: spark.sparkContext.getPersistentRDDs is empty
  * }}}
  *
  * Consume (write/collect/count) the operator results inside the body —
  * a Dataset escaping the bracket unmaterialized recomputes from scratch
  * on first use (correct, just slow). Scopes nest: an inner bracket
  * releases only its own registrations. Registration is per-thread
  * (operators build plans on the calling thread), matching how Spark
  * driver code composes.
  *
  * Caveat: Spark's CacheManager dedups caches by PLAN, so two brackets
  * caching plan-identical intermediates share one storage entry, and
  * the first bracket to close releases it for both (the survivor is
  * still correct — it just recomputes). Brackets over disjoint inputs
  * (the normal shape) are unaffected.
  */
object CacheScope {
  private val scopes =
    new ThreadLocal[java.util.ArrayDeque[java.util.ArrayList[() => Unit]]] {
      override def initialValue() = new java.util.ArrayDeque()
    }

  /** Register an operator-managed persisted Dataset with the innermost
    * open bracket; a no-op when none is open (the pre-bracket
    * behavior: caller releases via unpersist/clearCache). Returns the
    * Dataset unchanged.
    */
  private[graft] def track[T](ds: Dataset[T]): Dataset[T] = {
    trackRelease(() => ds.unpersist(blocking = false))
    ds
  }

  /** Register an arbitrary release action (e.g. an RDD-level persist
    * from a lineage short-circuit, which Dataset.unpersist cannot
    * reach) with the innermost open bracket; a no-op when none is
    * open.
    */
  private[graft] def trackRelease(release: () => Unit): Unit = {
    val st = scopes.get()
    if (!st.isEmpty) st.peek().add(release)
  }

  /** Run `body`; on exit (normal or exceptional) unpersist every
    * operator-managed cache registered inside it. Double-unpersist is
    * safe (a no-op on already-released data), so operators that release
    * eagerly on their fast paths need no special casing.
    */
  def withReleased[A](body: => A): A = {
    val st = scopes.get()
    val mine = new java.util.ArrayList[() => Unit]()
    st.push(mine)
    try body
    finally {
      st.pop()
      mine.forEach(release => release())
      if (st.isEmpty) scopes.remove()
    }
  }
}
