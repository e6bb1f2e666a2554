package graft.streaming

import scala.collection.concurrent.TrieMap
import scala.collection.immutable.ListMap

import org.apache.spark.sql.DataFrame

/** Keyed upsert sink — the engine-side contract of the reference's
  * Elasticsearch-7 sinks (SURVEY §2.1 S6; flink-ddl.sql:96-109): documents
  * keyed by primary key, continuously upserted, and *partially merged*
  * when several views share one index (reference: user_view index written
  * by both flink-ddl.sql:143 and :165 to merge fields into one document).
  *
  * `upserts` must carry a string `id` column (the doc id); remaining
  * columns become document fields. `deletes` is a single-column `id`
  * frame.
  */
trait UpsertSink {
  def upsert(index: String, upserts: DataFrame): Unit
  def delete(index: String, deletes: DataFrame): Unit
}

/** Test-harness sink: materializes documents into driver memory so
  * assertions can read them. The `.collect()` here is the sink boundary of
  * the HARNESS, not engine code — a production sink implements the same
  * trait with `df.foreachPartition` bulk writes (ES/JDBC), keeping the
  * data plane distributed. Field merge is partial-document, matching ES
  * upsert semantics. */
final class InMemoryUpsertSink extends UpsertSink {
  /** index -> doc id -> field -> value */
  val state: TrieMap[String, TrieMap[String, Map[String, Any]]] = TrieMap.empty

  private def index(name: String) =
    state.getOrElseUpdate(name, TrieMap.empty)

  override def upsert(name: String, upserts: DataFrame): Unit = {
    val cols = upserts.columns
    val idx = index(name)
    upserts.collect().foreach { row =>
      val id = row.getAs[Any]("id").toString
      val fields = ListMap(cols.filter(_ != "id").map(c => c -> row.getAs[Any](c)): _*)
      idx.put(id, idx.getOrElse(id, Map.empty) ++ fields)
    }
  }

  override def delete(name: String, deletes: DataFrame): Unit = {
    val idx = index(name)
    deletes.collect().foreach(row => idx.remove(row.getAs[Any]("id").toString))
  }

  def docs(name: String): Map[String, Map[String, Any]] =
    index(name).toMap
}

/** Scale-path sink: documents land in a [[ParquetKeyedTable]] — fully
  * distributed MERGE, no driver materialization. Stands in for a real
  * external-store sink at 100 TB.
  *
  * Upserts are PARTIAL-DOCUMENT merges, matching ES upsert semantics and
  * [[InMemoryUpsertSink]]: incoming fields overwrite, fields the incoming
  * frame doesn't carry persist from the stored document — so several
  * views can share one index with different column sets (the reference's
  * shared `user_view` index, flink-ddl.sql:143,165). The field merge is a
  * bucket-pruned lookup of exactly the incoming ids, outer-joined and
  * coalesced — per-batch cost tracks the batch. One divergence from the
  * in-memory sink: an explicit NULL in an incoming field keeps the stored
  * value (coalesce) rather than clearing it — same as an ES partial
  * update without a script. */
final class ParquetUpsertSink(
    spark: org.apache.spark.sql.SparkSession, root: String, numBuckets: Int = 32)
    extends UpsertSink {
  import org.apache.spark.sql.functions.{coalesce, col}

  private val tables = TrieMap.empty[String, ParquetKeyedTable]
  private def table(name: String) =
    tables.getOrElseUpdate(name,
      new ParquetKeyedTable(spark, s"$root/$name", "id", numBuckets))

  override def upsert(name: String, upserts: DataFrame): Unit = {
    // doc field names contain dots (ES-style `order.amount`) — quote
    // every reference so they resolve as top-level columns
    def c(n: String) = col(s"`$n`")
    val t = table(name)
    val stored = t.rowsForKeys(upserts.schema, upserts.select("id"))
    val newCols = upserts.columns.toSet
    val oldOnly = stored.columns.filterNot(n => newCols(n) || n == "id")
    val old = stored.select(c("id") +:
      stored.columns.filter(_ != "id")
        .map(n => c(n).as(s"__stored_$n")).toSeq: _*)
    val merged = upserts.join(old, Seq("id"), "left_outer")
      .select(c("id") +:
        (upserts.columns.filter(_ != "id").map { n =>
          if (old.columns.contains(s"__stored_$n"))
            coalesce(c(n), c(s"__stored_$n")).as(n)
          else c(n)
        } ++ oldOnly.map(n => c(s"__stored_$n").as(n))).toSeq: _*)
    t.merge(merged, merged.select("id").limit(0))
  }

  override def delete(name: String, deletes: DataFrame): Unit =
    table(name).delete(deletes) // no-op until an upsert created the table

  def docs(name: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    table(name).snapshot(schema)
}
