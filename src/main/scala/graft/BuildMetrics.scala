package graft

/** Wall-clock seconds spent in session-scoped build-once work — the
  * train-once memos (IVF index, k-means model, PQ codebooks, IVF-PQ code
  * layout, BPE merge table) and the shared near-dup pair table.
  *
  * Why a separate ledger: the memo pattern moves one-time training /
  * indexing cost out of every query that reads the model, which is the
  * intended 100 TB posture (build once, amortize over all searches) —
  * but it also means a per-query benchmark only ever times the SEARCH
  * side after the first touch. Without this ledger a regression in
  * training cost is invisible (it hides inside whichever warm-up query
  * touches the memo first), and a round-over-round reader can mistake
  * amortization for speedup. Bench emits the snapshot as a top-level
  * `"build"` map next to the per-query rows.
  *
  * Cumulative per name on purpose: a second session (or sf dir) in the
  * same JVM re-pays the build, and that spend should be visible too.
  */
object BuildMetrics {
  private val secs = scala.collection.concurrent.TrieMap.empty[String, Double]
  private val memoHits =
    scala.collection.concurrent.TrieMap.empty[String, Long]
  private val memoMisses =
    scala.collection.concurrent.TrieMap.empty[String, Long]

  /** Run `body`, billing its wall-clock to `name`. */
  def timed[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally {
      val dt = (System.nanoTime() - t0) / 1e9
      secs.updateWith(name)(prev => Some(prev.getOrElse(0.0) + dt))
    }
  }

  /** `getOrElseUpdate` with hit/miss ACCOUNTING under `name` — a miss
    * also bills its build wall-clock to `name` via [[timed]]. The
    * counters feed Bench's per-query `"memo"` ledger (r10 VERDICT #5:
    * with 150+ queries sharing session memos, run-to-run scatter needs
    * to be attributable — a memo MISS inside the timed pass means a
    * rebuild was billed to that query's wall-clock, which is a finding,
    * not noise). */
  def memo[K, V](map: scala.collection.concurrent.TrieMap[K, V], key: K,
      name: String)(build: => V): V =
    map.get(key) match {
      case Some(v) =>
        memoHits.updateWith(name)(p => Some(p.getOrElse(0L) + 1)); v
      case None =>
        // getOrElseUpdate for atomicity; the thunk may lose a race and
        // not run, so accounting keys off whether OUR thunk executed
        var built = false
        val v = map.getOrElseUpdate(key, { built = true; timed(name)(build) })
        val ctr = if (built) memoMisses else memoHits
        ctr.updateWith(name)(p => Some(p.getOrElse(0L) + 1))
        v
    }

  def snapshot: Map[String, Double] = secs.toMap

  /** (hits, misses) per memo name, cumulative across the JVM. */
  def memoSnapshot: Map[String, (Long, Long)] = {
    val names = memoHits.keySet ++ memoMisses.keySet
    names.map(n => n ->
      ((memoHits.getOrElse(n, 0L), memoMisses.getOrElse(n, 0L)))).toMap
  }
}
