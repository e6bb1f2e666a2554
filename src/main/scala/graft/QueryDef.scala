package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark builder plus (when SQL-expressible) an
  * ANSI-SQL oracle the driver runs in DuckDB over the same parquet tables.
  * Column names of the Spark result and the oracle MUST match — the
  * compare sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(oracle))

  def noOracle(name: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}
