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

  /** Run `body`, billing its wall-clock to `name`. */
  def timed[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally {
      val dt = (System.nanoTime() - t0) / 1e9
      secs.updateWith(name)(prev => Some(prev.getOrElse(0.0) + dt))
    }
  }

  def snapshot: Map[String, Double] = secs.toMap
}
