package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark 4
    * refuses to read natively (PARQUET_TYPE_ILLEGAL). We read it as a raw
    * nanos long (`spark.sql.legacy.parquet.nanosAsLong`, set ONCE at
    * session construction — mutating shared session conf per-read was a
    * hidden ordering dependency and a race for concurrent readers) and
    * convert with integer division — `ts DIV 1000` keeps full long
    * precision (a double division would lose it: epoch-nanos ≈ 1.7e18 >
    * 2^53). The original nanos long is kept as `ts_ns` so ordering
    * comparisons (e.g. latest-row-per-key) match engines that order on
    * full nano precision.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    name match {
      case "events" =>
        require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
          "events requires spark.sql.legacy.parquet.nanosAsLong=true at session build " +
            "(Engine.session sets it)")
        spark.read.parquet(path)
          .withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _ =>
        spark.read.parquet(path)
    }
  }

  /** Register every table as a temp view so `spark.sql` works verbatim. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
