package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession

/** Keys and on-disk housekeeping for the session-scoped build memos
  * (shared pair/cluster/LM/classifier/gram tables, trained models,
  * bucketed copies).
  *
  * Two hazards of the original `System.identityHashCode(session)` keying
  * (r7 ADVICE): identity hashes can collide after a session is GC'd —
  * a later session could silently read a stale memo built over a
  * different session's state — and the parquet temp dirs were never
  * deleted, so a long-lived multi-session JVM accumulates unbounded
  * disk. Here the key is the session's own UUID (stable for the
  * session's lifetime, never reused), and every memo dir is registered
  * for recursive removal at JVM exit. A real cluster deployment would
  * point these at job-scoped paths under the warehouse and let the
  * pipeline's retention policy own them; the shutdown hook is the
  * single-JVM equivalent. */
object SessionMemo {

  /** Stable, never-reused identity for a session. Spark's classic
    * SparkSession carries a public `sessionUUID`; the weak-map fallback
    * covers any other implementation without pinning the session in
    * memory. */
  def key(s: SparkSession): String =
    org.apache.spark.sql.graft.bridge.sessionUUID(s).getOrElse(
      fallbackIds.synchronized {
        val got = fallbackIds.get(s)
        if (got != null) got
        else {
          val u = java.util.UUID.randomUUID().toString
          fallbackIds.put(s, u)
          u
        }
      })

  private val fallbackIds =
    new java.util.WeakHashMap[SparkSession, String]

  private val tracked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      tracked.forEach(deleteRecursively(_))
    }, "graft-session-memo-cleanup"))
  }

  /** A temp directory registered for recursive deletion at JVM exit —
    * the home of one memoized parquet artifact. */
  def tempDir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    tracked.add(p)
    p.toString
  }

  private def deleteRecursively(p: Path): Unit =
    try {
      if (Files.isDirectory(p)) {
        val children = Files.list(p)
        try children.forEach(deleteRecursively(_))
        finally children.close()
      }
      Files.deleteIfExists(p)
    } catch { case _: java.io.IOException => () } // best-effort at exit
}
