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

  /** `events.parquet` has shipped with two `ts` encodings across driver
    * testdata generations, and the loader normalizes BOTH to the same
    * (ts TIMESTAMP, ts_ns BIGINT) contract, branching on the read schema:
    *
    *  - TIMESTAMP(NANOS): Spark 4 refuses it natively
    *    (PARQUET_TYPE_ILLEGAL), so it arrives as a raw nanos long via
    *    `spark.sql.legacy.parquet.nanosAsLong` (set ONCE at session
    *    construction — mutating shared session conf per-read was a hidden
    *    ordering dependency and a race for concurrent readers); converted
    *    with integer division — `ts DIV 1000` keeps full long precision
    *    (a double division would lose it: epoch-nanos ≈ 1.7e18 > 2^53).
    *  - TIMESTAMP(MICROS/MILLIS): reads natively (possibly as NTZ, cast
    *    to the instant type — session TZ is pinned UTC so wall-clock
    *    values are identical); `ts_ns` is derived as micros×1000.
    *
    * `ts_ns` exists so ordering comparisons (e.g. latest-row-per-key)
    * match engines that order on the file's full precision.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    name match {
      case "events" =>
        val raw = spark.read.parquet(path)
        raw.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            // TIMESTAMP(NANOS) file read as a raw nanos long (see above)
            require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
              "events requires spark.sql.legacy.parquet.nanosAsLong=true at session build " +
                "(Engine.session sets it)")
            raw.withColumn("ts_ns", col("ts"))
              .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
          case _ =>
            // TIMESTAMP(MICROS/MILLIS) reads natively; normalize NTZ to the
            // instant type (session TZ is pinned UTC, so the wall-clock
            // values are identical) and derive ts_ns for full-precision
            // ordering — same two-column contract as the nanos path
            raw.withColumn("ts",
                col("ts").cast(org.apache.spark.sql.types.TimestampType))
              .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
        }
      case _ =>
        spark.read.parquet(path)
    }
  }

  /** Adaptive compute-spread for a frame about to pay heavy PER-ROW work
    * (per-character hashing, window explodes, model scoring): when the
    * plan's current parallelism is below the session default — the
    * single-row-group/single-file small-corpus case; the bench corpus
    * ships ONE row group per table, so every scan stage is one task no
    * matter the config (guide §2.5: "one huge unsplittable file …
    * repartition immediately after the read") — round-robin repartition
    * to the default. When the scan already has at least that many splits
    * (any real-scale corpus), this is the identity and NO shuffle is
    * added: the decision derives from the data's own layout, not from a
    * local[n] constant. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Register every table as a temp view so `spark.sql` works verbatim. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
