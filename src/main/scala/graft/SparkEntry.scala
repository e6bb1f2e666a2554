package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AsOf, Bpe, Curation, Dedup, Governance, KMeans, Multimodal, Pq, Provenance, Relational, Retrieval, Similarity, Temporal, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Every implemented operator, aggregated from the operator modules. */
  def all: Seq[QueryDef] =
    Relational.queries ++ AsOf.queries ++ Dedup.queries ++
      TextAnalysis.queries ++ Curation.queries ++ Similarity.queries ++
      KMeans.queries ++ Multimodal.queries ++ Bpe.queries ++ Pq.queries ++
      Provenance.queries ++ Temporal.queries ++ Governance.queries ++
      Retrieval.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship is `order_view` (orders ⋈ users → upsert),
    * flink-ddl.sql:179-190. */
  def entry(spark: SparkSession): DataFrame =
    queries("q04_order_view")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
