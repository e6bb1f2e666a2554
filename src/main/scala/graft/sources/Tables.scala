package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the deterministic test tables (see /root/repo/TESTDATA.md).
  *
  * Mirrors the role of the reference's session catalog of declared source
  * tables (reference: flink-ddl.sql:1-94 declares every source via
  * `CREATE TABLE ... WITH (...)`); here the catalog is a parquet directory
  * and schemas come from parquet footers (self-describing), so nothing to
  * re-declare.
  *
  * Scale posture: parquet scans are split by `spark.sql.files.maxPartitionBytes`
  * across executors; filters/projections on these frames reach the scan via
  * Catalyst pushdown, so callers should NOT pre-materialize or cache these.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` works verbatim. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
