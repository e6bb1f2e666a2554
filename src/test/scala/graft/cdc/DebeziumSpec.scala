package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSuite

/** Envelope decode against the reference's captured golden payloads
  * (SURVEY §5 strategy 1): exact field values from
  * sample/cdc.orders.change-log-mysql.json:115-150 (op "u", amount 100.0,
  * status closed→payed) and the Mongo JSON-string variant
  * (sample/cdc.crawler.change-log-mongodb.json:46). */
class DebeziumSpec extends SparkSuite {
  import spark.implicits._

  /** reference: README.md:34-42 (ec.orders DDL); DECIMAL arrives as double
    * on the wire (register-ec.json:6 decimal.handling.mode) and TIMESTAMP
    * as ISO-8601 string (README.md:149) — SURVEY §1.2. */
  val ordersSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("user_id", StringType),
    StructField("amount", DoubleType),
    StructField("ctime", TimestampType),
    StructField("utime", TimestampType),
    StructField("status", StringType),
    StructField("channel", StringType)))

  test("golden MySQL update envelope decodes with exact field values") {
    val df = Seq(Fixtures.mysqlOrdersEnvelope).toDF("value")
      .select(Debezium.decode(col("value"),
        Debezium.mysqlEnvelope(ordersSchema)).as("env"))
    val env = df.select("env.*").collect().head

    assert(env.getAs[String]("op") == "u")
    assert(env.getAs[Long]("ts_ms") == 1612153903719L)

    val before = env.getAs[Row]("before")
    val after = env.getAs[Row]("after")
    assert(before.getAs[String]("status") == "closed")
    assert(after.getAs[String]("status") == "payed")
    assert(after.getAs[Double]("amount") == 100.0)
    assert(after.getAs[String]("id") == "2")
    assert(after.getAs[String]("user_id") == "1")
    // ZonedTimestamp "2021-01-30T13:04:44Z" → UTC instant
    assert(after.getAs[Timestamp]("ctime") ==
      Timestamp.valueOf("2021-01-30 13:04:44"))
    val src = env.getAs[Row]("source")
    assert(src.getAs[String]("table") == "orders")
    assert(src.getAs[String]("db") == "ec")
  }

  test("golden Mongo envelope: document arrives as a JSON string") {
    val df = Seq(Fixtures.mongoCommentsEnvelope).toDF("value")
      .select(Debezium.decode(col("value"), Debezium.mongoEnvelope).as("env"))
    val env = df.select("env.*").collect().head

    assert(env.getAs[String]("op") == "c")
    // after is io.debezium.data.Json — a STRING holding the document
    // (reference: flink-mongodb.sql:1-5 declares content STRING)
    val after = env.getAs[String]("after")
    assert(after.contains("\"content\""))

    // extracted with JSON functions, not native nesting (SURVEY §1.2)
    val doc = Seq(after).toDF("after").select(
      get_json_object(col("after"), "$.content").as("content"),
      get_json_object(col("after"), "$._id.$oid").as("oid"))
      .collect().head
    assert(doc.getAs[String]("content") == "c6")
    assert(doc.getAs[String]("oid") == "6017849910fc61562a2f7854")
  }

  test("bare payloads (no Connect schema wrapper) decode identically") {
    val wrapped = Fixtures.mysqlOrdersEnvelope
    val bare = spark.read.json(Seq(wrapped).toDS())
      .select(to_json(col("payload"))).as[String].collect().head
    val ops = Seq(wrapped, bare).toDF("value")
      .select(Debezium.decode(col("value"),
        Debezium.mysqlEnvelope(ordersSchema)).as("env"))
      .select("env.op").as[String].collect()
    assert(ops.toSeq == Seq("u", "u"))
  }

  test("tolerant decode nulls out garbage (ignore-parse-errors), strict throws") {
    val values = Seq("not json at all", Fixtures.mysqlOrdersEnvelope).toDF("value")
    val tolerant = values
      .select(Debezium.decode(col("value"),
        Debezium.mysqlEnvelope(ordersSchema)).as("env"))
      .filter(col("env").isNotNull && col("env.op").isNotNull)
    assert(tolerant.count() == 1)

    val strict = values.select(Debezium.decode(col("value"),
      Debezium.mysqlEnvelope(ordersSchema), tolerant = false))
    assertThrows[Exception](strict.collect())
  }

  test("normalize: key from pk, before/after images, delete falls back to before") {
    val del =
      """{"before":{"id":"9","user_id":"1","amount":5.0,"status":"created"},
        |"after":null,"op":"d","ts_ms":1000}""".stripMargin.replace("\n", "")
    val rows = Seq((Fixtures.mysqlOrdersEnvelope, 0L), (del, 1L))
      .toDF("value", "seq")
      .withColumn("env", Debezium.decode(col("value"),
        Debezium.mysqlEnvelope(ordersSchema)))
    val out = Debezium.normalize(rows, Seq("id")).collect()
      .map(r => r.getAs[String]("key") -> r.getAs[String]("op")).toMap
    assert(out == Map("2" -> "u", "9" -> "d"))

    val d = Debezium.normalize(rows, Seq("id"))
      .filter(col("op") === "d").select("before.amount").collect().head
    assert(d.getDouble(0) == 5.0)
  }
}
