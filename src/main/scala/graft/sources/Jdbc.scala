package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, concat, lit, struct, to_json}

/** JDBC connector surface (reference S3/S4):
  *
  *  - S3 dimension/lookup table (flink-ddl.sql:79-94: `dim_users` with
  *    lookup.cache rows/TTL): a JDBC-read dimension broadcast against the
  *    fact side — the fact stream never shuffles; re-reading the dim per
  *    micro-batch plays the cache-TTL role (SURVEY §2.1 S3).
  *  - S4 JDBC catalog (README.md:106-126 `CREATE CATALOG ... 'jdbc'`):
  *    Spark's built-in JDBCTableCatalog — external metadata resolved at
  *    analysis time, no re-declared schemas.
  *
  * Tested against in-process Apache Derby (the environment ships no MySQL;
  * the code path is identical modulo the JDBC URL).
  */
object Jdbc {

  /** Read one table over JDBC. */
  def table(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .load()

  /** Lookup (dimension) join: dim is JDBC-read and broadcast — the plan
    * the reference's cached JDBC lookup join targets. */
  def lookupJoin(fact: DataFrame, spark: SparkSession, url: String,
      dimTable: String, cond: Column,
      options: Map[String, String] = Map.empty): DataFrame =
    fact.join(broadcast(table(spark, url, dimTable, options)), cond)

  /** S2 snapshot bootstrap — the first half of mysql-cdc's
    * snapshot-then-binlog contract (reference: README.md:347 "full
    * snapshot then switch seamlessly to binlog"): read the table's current
    * rows over JDBC and emit them as Debezium `op:"r"` (snapshot-read)
    * records in the CDC input contract, so a [[graft.streaming.CdcPipeline]]
    * bootstraps its materialized state before tailing the change topic.
    * ts_ms=0/seq=0 orders every snapshot row before any live change. */
  def snapshotCdcInput(spark: SparkSession, url: String, dbTable: String,
      cdcTable: String, options: Map[String, String] = Map.empty): DataFrame = {
    val rows = table(spark, url, dbTable, options)
    rows.select(
      lit(cdcTable).as("table"),
      concat(lit("""{"before":null,"after":"""),
        to_json(struct(rows.columns.map(col): _*)),
        lit(""","op":"r","ts_ms":0}""")).as("value"),
      lit(0L).as("seq"))
  }

  /** Register a JDBC catalog: `USE CATALOG`-style external metadata
    * (reference: README.md:257-261). Identifiers resolve as
    * `<name>.<schema>.<table>`. */
  def registerCatalog(spark: SparkSession, name: String, url: String,
      options: Map[String, String] = Map.empty): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.url", url)
    spark.conf.set(s"spark.sql.catalog.$name.driver",
      options.getOrElse("driver", "org.apache.derby.jdbc.EmbeddedDriver"))
    options.foreach { case (k, v) =>
      spark.conf.set(s"spark.sql.catalog.$name.$k", v)
    }
  }
}
