package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Flink's `FOR SYSTEM_TIME AS OF` surface syntax through `Engine.sql`
  * (r12 VERDICT #6): the verbatim temporal-join statement compiles onto
  * AsOf.asofBackward and reproduces q160's oracle-pinned result; the
  * versioned table's own time attribute comes from its DDL WATERMARK
  * declaration; INNER/LEFT semantics and the ON-shape guardrails hold. */
class TemporalSqlSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("verbatim Flink temporal join reproduces q160's result via Engine.sql") {
    val eng = Engine(spark)
    Tables.load(spark, dir, "events").createOrReplaceTempView("events")
    // the versioned dimension: each user's non-purchase history with its
    // q158-numbered version — registered as a view, exactly how Flink
    // derives a versioned table from a changelog
    spark.sql(
      """SELECT user_id, event_id, event_type, ts_ns,
        |  CAST(row_number() OVER
        |    (PARTITION BY user_id ORDER BY ts_ns, event_id) AS BIGINT)
        |    AS version
        |FROM events WHERE event_type <> 'purchase'""".stripMargin)
      .createOrReplaceTempView("profiles")
    spark.sql(
      """SELECT event_id, user_id, ts, ts_ns FROM events
        |WHERE event_type = 'purchase'""".stripMargin)
      .createOrReplaceTempView("purchases")

    val got = eng.sql(
      "SELECT p.event_id, p.user_id, p.ts, " +
        "d.event_id AS state_event_id, d.event_type AS state_type, " +
        "d.version AS state_version " +
        "FROM purchases AS p " +
        "LEFT JOIN profiles FOR SYSTEM_TIME AS OF p.ts_ns AS d " +
        "ON p.user_id = d.user_id")

    val expected = SparkEntry.queries("q160_temporal_join")(spark, dir)
    assert(got.schema.fieldNames.toSeq == expected.schema.fieldNames.toSeq)
    val sortCols = Seq("event_id")
    assert(got.orderBy(sortCols.map(org.apache.spark.sql.functions.col): _*)
      .collect().toSeq ==
      expected.orderBy(sortCols.map(org.apache.spark.sql.functions.col): _*)
        .collect().toSeq,
      "Flink-syntax temporal join must equal the oracle-pinned q160")
    assert(got.count() > 0)
  }

  test("dimension time attribute comes from its DDL WATERMARK column") {
    val eng = Engine(spark)
    // a versioned rates table whose time column ('vt') differs from the
    // probe's ('pt') — only the WATERMARK declaration can say which dim
    // column is the version time
    val ratesDir = tmpDir("temporal-rates")
    val rates = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("eur", 10, java.sql.Timestamp.valueOf("2021-01-01 00:00:00")),
        Row("eur", 12, java.sql.Timestamp.valueOf("2021-01-03 00:00:00")),
        Row("jpy", 7, java.sql.Timestamp.valueOf("2021-01-02 00:00:00"))),
      StructType(Seq(StructField("ccy", StringType),
        StructField("rate", IntegerType), StructField("vt", TimestampType))))
    rates.write.mode("overwrite").parquet(ratesDir)
    eng.sql(
      s"""CREATE TABLE rates (
         |  ccy STRING,
         |  rate INT,
         |  vt TIMESTAMP(3),
         |  WATERMARK FOR vt AS vt - INTERVAL '5' SECOND,
         |  PRIMARY KEY (ccy) NOT ENFORCED
         |) WITH ('connector' = 'parquet', 'path' = '$ratesDir')""".stripMargin)

    val txns = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("t1", "eur", java.sql.Timestamp.valueOf("2021-01-02 12:00:00")),
        Row("t2", "eur", java.sql.Timestamp.valueOf("2021-01-04 00:00:00")),
        Row("t3", "jpy", java.sql.Timestamp.valueOf("2021-01-01 00:00:00")),
        Row("t4", "gbp", java.sql.Timestamp.valueOf("2021-01-05 00:00:00"))),
      StructType(Seq(StructField("txn", StringType),
        StructField("ccy", StringType), StructField("pt", TimestampType))))
    txns.createOrReplaceTempView("txns")

    // INNER: t3 (before jpy's first version) and t4 (no gbp) drop
    val inner = eng.sql(
      "SELECT t.txn, d.rate AS rate FROM txns AS t " +
        "JOIN rates FOR SYSTEM_TIME AS OF t.pt AS d ON t.ccy = d.ccy")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(inner == Set(("t1", 10), ("t2", 12)),
      s"each txn must join the rate version valid AT its time, got $inner")

    // LEFT: unmatched probes survive with null payloads
    val left = eng.sql(
      "SELECT t.txn, d.rate AS rate FROM txns AS t " +
        "LEFT JOIN rates FOR SYSTEM_TIME AS OF t.pt AS d ON t.ccy = d.ccy")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) -1 else r.getInt(1))).toSet
    assert(left == Set(("t1", 10), ("t2", 12), ("t3", -1), ("t4", -1)))
  }

  test("non-equality ON conditions are rejected, not silently mis-planned") {
    val eng = Engine(spark)
    spark.range(1).selectExpr("'a' AS k", "CAST(0 AS LONG) AS ts")
      .createOrReplaceTempView("tp")
    spark.range(1).selectExpr("'a' AS k", "CAST(0 AS LONG) AS ts",
      "1 AS v").createOrReplaceTempView("td")
    val e = intercept[IllegalArgumentException] {
      eng.sql("SELECT p.k FROM tp AS p JOIN td FOR SYSTEM_TIME AS OF p.ts " +
        "AS d ON p.k <> d.k")
    }
    assert(e.getMessage.contains("key-equality"))
  }

  test("statements without FOR SYSTEM_TIME pass through untouched") {
    val eng = Engine(spark)
    assert(!TemporalSql.matches("SELECT 1"))
    assert(eng.sql("SELECT 1 AS one").collect().head.getInt(0) == 1)
  }
}
