package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (hash-clustered, sorted) copies of the test tables — the
  * storage layout that makes repeated large joins CO-LOCATED at 100 TB.
  *
  * A fact-to-fact join (orders ⋈ lineitem on orderkey) normally shuffles
  * BOTH sides on every query. Writing each table once with
  * `bucketBy(n, key).sortBy(key)` persists the hash partitioning in the
  * table metadata, so every later join/aggregation clustered on that key
  * reads the buckets aligned and plans with ZERO Exchange — the one-time
  * layout cost is amortized over every query that follows (this is the
  * "pre-partition the fact tables" posture the reference gets implicitly
  * from Kafka's keyed topic partitioning; here it is the at-rest analog).
  *
  * Materialization is memoized per (session, sf-dir, table): the first
  * call writes, later calls just read the catalog table — so a bench or
  * verify pass pays the write once, and the measured queries exercise the
  * co-located read path, exactly like a production corpus bucketed at
  * ingest. Tables are EXTERNAL (explicit temp-dir path) so nothing lands
  * in the session warehouse dir.
  */
object Bucketed {
  private val done =
    scala.collection.concurrent.TrieMap.empty[(String, String, String, String, Int), String]

  /** The bucketed form of `dir/name`, clustered+sorted on `key` into
    * `numBuckets` buckets (bucket count must match on both sides of a
    * co-located join — keep the default unless all callers change). */
  def table(s: SparkSession, dir: String, name: String, key: String,
      numBuckets: Int = 16): DataFrame = {
    val sessionKey = (graft.SessionMemo.key(s), dir, name, key, numBuckets)
    val tbl = graft.BuildMetrics.memo(done, sessionKey,
      s"bucketed_$name")(synchronized {
      val safe = s"${key}_$numBuckets${dir}".replaceAll("[^A-Za-z0-9]", "_")
      val t = s"${name}_bucketed_$safe"
      if (!s.catalog.tableExists(t)) {
        val loc = graft.SessionMemo.tempDir(s"graft-bucketed-$name")
        Tables.load(s, dir, name).write.mode("overwrite")
          .bucketBy(numBuckets, key).sortBy(key)
          .option("path", s"$loc/$t")
          .format("parquet").saveAsTable(t)
      }
      t
    })
    s.table(tbl)
  }
}
