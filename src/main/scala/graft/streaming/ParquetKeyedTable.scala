package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** A keyed, versioned, parquet-backed upsert table — the engine's
  * materialized-state store and the scale path for the reference's
  * primary-keyed sinks (flink-ddl.sql:96-109: ES doc-id = PRIMARY KEY).
  *
  * MERGE semantics via plain distributed relational ops (no driver-side
  * row loops): next = (current ANTI-JOIN touched-keys) UNION upserts,
  * written as a NEW immutable version directory, then the `_CURRENT`
  * pointer flips. Readers of an old snapshot keep a consistent view while
  * a merge commits — which the CDC pipeline relies on (it reads the
  * pre-merge snapshot for old-group retraction while writing the next
  * version).
  *
  * 100 TB posture: this is the log-structured pattern of a table format
  * (Delta/Iceberg) minus file-level pruning — every op is a shuffle
  * join/union over executors, nothing collects to the driver. With
  * `numBuckets > 0`, versions are written hash-distributed on a stable
  * bucket of `key` (`pmod(hash(key), n)` directory partitions): the merge
  * anti-join then lines up bucket-to-bucket, and a point lookup prunes to
  * one bucket directory instead of scanning the full state.
  */
final class ParquetKeyedTable(
    spark: SparkSession,
    path: String,
    keyCol: String = "key",
    numBuckets: Int = 0) {

  private val dir = Paths.get(path)
  private val pointer = dir.resolve("_CURRENT")

  private def currentVersion: Option[Int] =
    if (Files.exists(pointer))
      Some(new String(Files.readAllBytes(pointer)).trim.toInt)
    else None

  def exists: Boolean = currentVersion.isDefined

  /** Current table contents; `schema` shapes the empty table before the
    * first commit. */
  def snapshot(schema: StructType): DataFrame =
    currentVersion match {
      case Some(v) =>
        spark.read.parquet(dir.resolve(s"v$v").toString)
          .drop("bucket") // partition column of bucketed layouts
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    }

  /** Rows for one key, pruned to its bucket directory when bucketed —
    * the point-lookup path (doc-by-id reads of an upsert sink). */
  def lookup(schema: StructType, key: String): DataFrame = {
    val snap = currentVersion match {
      case Some(v) if numBuckets > 0 =>
        // partition pruning: only the key's bucket directory is scanned
        spark.read.parquet(dir.resolve(s"v$v").toString)
          .filter(col("bucket") ===
            pmod(hash(lit(key)), lit(numBuckets)).cast("int"))
          .drop("bucket")
      case _ => snapshot(schema)
    }
    snap.filter(col(keyCol) === key)
  }

  /** Apply one batch of changes: rows in `upserts` replace rows with equal
    * `keyCol`; keys in `deletes` (single-column frame of `keyCol`) are
    * removed. Commits a new immutable version. */
  def merge(upserts: DataFrame, deletes: DataFrame): Unit = {
    val touched = upserts.select(keyCol).union(deletes.select(keyCol)).distinct()
    val next = snapshot(upserts.schema)
      .join(touched, Seq(keyCol), "left_anti")
      .unionByName(upserts)
    commit(next)
  }

  /** Remove keys only — usable when the caller has no row schema at hand
    * (e.g. a sink delete before/without upserts in the batch). */
  def delete(keys: DataFrame): Unit =
    currentVersion.foreach { _ =>
      val cur = snapshot(keys.schema /* ignored: version exists */)
      commit(cur.join(keys.select(keyCol).distinct(), Seq(keyCol), "left_anti"))
    }

  private def commit(next: DataFrame): Unit = {
    val v = currentVersion.getOrElse(-1) + 1
    val writer =
      if (numBuckets > 0)
        next.withColumn("bucket",
          pmod(hash(col(keyCol)), lit(numBuckets)).cast("int"))
          .repartition(numBuckets, col("bucket"))
          .write.partitionBy("bucket")
      else next.write
    writer.mode("overwrite").parquet(dir.resolve(s"v$v").toString)
    Files.createDirectories(dir)
    Files.write(pointer, v.toString.getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING,
      StandardOpenOption.WRITE)
    // retain only the two most recent versions (old snapshot stays readable
    // for in-flight readers of the previous version)
    (0 to v - 2).foreach { old =>
      val d = dir.resolve(s"v$old")
      if (Files.exists(d)) {
        Files.walk(d).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => Files.deleteIfExists(p))
      }
    }
  }
}
