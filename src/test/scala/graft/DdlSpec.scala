package graft

import org.apache.spark.sql.types._

import graft.streaming.{CdcSqlSession, InMemoryUpsertSink}

/** The reference's primary surface — verbatim `CREATE TABLE ... WITH
  * ('connector'=...)` DDL (flink-ddl.sql:1-19) — parses into catalog
  * specs and, with a [[CdcSqlSession]] attached, the whole
  * DDL + INSERT INTO pipeline runs end-to-end through `Engine.sql`. */
class DdlSpec extends SparkSuite {

  // reference flink-ddl.sql:1-19, verbatim
  private val ordersDdl =
    """CREATE TABLE orders (
      |  id STRING,
      |  user_id STRING,
      |  amount DECIMAL,
      |  status STRING,
      |  channel STRING,
      |  ctime TIMESTAMP,
      |  utime TIMESTAMP,
      |  PRIMARY KEY (id) NOT ENFORCED,
      |  proc_time AS PROCTIME()
      |) WITH (
      |  'connector' = 'mysql-cdc',
      |  'hostname' ='mysql',
      |  'port' = '3306',
      |  'username' ='root',
      |  'password' ='debezium',
      |  'database-name' ='ec',
      |  'table-name' ='orders'
      |);""".stripMargin

  // reference flink-ddl.sql:59-73, verbatim (note: no PRIMARY KEY — the
  // reference's Flink setup keys users by the Debezium message key)
  private val usersDdl =
    """CREATE TABLE users (
      |  id STRING,
      |  name STRING,
      |  age INT,
      |  ctime TIMESTAMP,
      |  utime TIMESTAMP,
      |  proc_time AS PROCTIME()
      |) WITH (
      |  'connector' = 'mysql-cdc',
      |  'hostname' ='mysql',
      |  'port' = '3306',
      |  'username' ='root',
      |  'password' ='debezium',
      |  'database-name' ='crm',
      |  'table-name' ='users'
      |)""".stripMargin

  // reference flink-ddl.sql:96-109, verbatim (inline PRIMARY KEY form,
  // backticked dotted columns, ES-7 sink)
  private val orderViewDdl =
    """CREATE TABLE order_view (
      |  id STRING PRIMARY KEY NOT ENFORCED,
      |  `order.amount` DECIMAL,
      |  `order.status` STRING,
      |  `order.channel` STRING,
      |  `user.name` STRING,
      |  `user.age` INT,
      |  ctime TIMESTAMP,
      |  utime TIMESTAMP
      |) WITH (
      |  'connector' = 'elasticsearch-7',
      |  'hosts' = 'http://elasticsearch:9200',
      |  'index' = 'order_view'
      |);""".stripMargin

  test("verbatim orders DDL parses: schema, PK, computed column, options") {
    val ct = Ddl.parseCreateTable(ordersDdl).get
    assert(ct.name == "orders")
    assert(ct.schema.fieldNames.toSeq == Seq(
      "id", "user_id", "amount", "status", "channel", "ctime", "utime"))
    assert(ct.schema("amount").dataType == DecimalType(10, 0))
    assert(ct.schema("ctime").dataType == TimestampType)
    assert(ct.primaryKey == Seq("id"))
    assert(ct.computed == Seq("proc_time" -> "PROCTIME()"))
    assert(ct.options("connector") == "mysql-cdc")
    assert(ct.options("table-name") == "orders")
  }

  test("inline PRIMARY KEY and backtick-dotted columns parse (order_view)") {
    val ct = Ddl.parseCreateTable(orderViewDdl).get
    assert(ct.primaryKey == Seq("id"))
    assert(ct.schema.fieldNames.contains("order.amount"))
    assert(ct.schema("user.age").dataType == IntegerType)
    assert(ct.options("connector") == "elasticsearch-7")
  }

  test("nested ARRAY<ROW<...>> types parse (order_view_items)") {
    // reference flink-ddl.sql:111-123, verbatim
    val ct = Ddl.parseCreateTable(
      """CREATE TABLE order_view_items (
        |  id STRING PRIMARY KEY NOT ENFORCED,
        |  `order.items` ARRAY<ROW<
        |    `product.id` STRING,
        |    price DECIMAL,
        |    quantity BIGINT
        |  >>
        |) WITH (
        |  'connector' = 'elasticsearch-7',
        |  'hosts' = 'http://elasticsearch:9200',
        |  'index' = 'order_view'
        |);""".stripMargin).get
    val items = ct.schema("order.items").dataType.asInstanceOf[ArrayType]
    val row = items.elementType.asInstanceOf[StructType]
    assert(row.fieldNames.toSeq == Seq("product.id", "price", "quantity"))
    assert(row("quantity").dataType == LongType)
  }

  test("WATERMARK FOR ... AS declaration parses as metadata, not a column") {
    val ct = Ddl.parseCreateTable(
      """CREATE TABLE user_log (
        |  user_id STRING,
        |  ts TIMESTAMP(3),
        |  WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        |) WITH ('connector' = 'kafka')""".stripMargin).get
    assert(ct.schema.fieldNames.toSeq == Seq("user_id", "ts"))
    assert(ct.watermark == Some("ts" -> "ts - INTERVAL '5' SECOND"))
    // and through the engine: registered + queryable, watermark kept
    val engine = Engine(spark)
    val spec = engine.createTable(ct)
    assert(spec.options("watermark.ts") == "ts - INTERVAL '5' SECOND")
    assert(spark.sql("SELECT * FROM user_log").count() == 0)
  }

  test("catalog-qualified names normalize to their last segment; " +
      "colliding local names fail fast") {
    val engine = Engine(spark)
    engine.sql(
      "CREATE TABLE mydb.qualified_t (id STRING, v INT) WITH " +
        "('connector' = 'mysql-cdc')")
    assert(spark.sql("SELECT * FROM qualified_t").columns.toSeq ==
      Seq("id", "v"))
    // spec registered under the LOCAL name (the form every later lookup
    // uses), original name kept as metadata
    val spec = engine.catalog.get("qualified_t").get
    assert(spec.options("qualified-name") == "mydb.qualified_t")
    // a second qualified name sharing the segment would silently rebind
    // the first table's view — rejected instead
    val e = intercept[IllegalArgumentException] {
      engine.sql("CREATE TABLE otherdb.qualified_t (x STRING) WITH " +
        "('connector' = 'mysql-cdc')")
    }
    assert(e.getMessage.contains("collision"))
  }

  test("WATERMARK on a computed column is valid (Flink's TO_TIMESTAMP " +
      "pattern)") {
    val ct = Ddl.parseCreateTable(
      """CREATE TABLE t2 (raw BIGINT, ts AS TO_TIMESTAMP(raw),
        |  WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
        |) WITH ('connector' = 'kafka')""".stripMargin).get
    assert(ct.watermark == Some("ts" -> "ts - INTERVAL '5' SECOND"))
    assert(ct.computed == Seq("ts" -> "TO_TIMESTAMP(raw)"))
  }

  test("CDC envelopes labeled with the qualified name route to the " +
      "local-named spec") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val engine = Engine(spark)
    engine.sql(
      "CREATE TABLE qdb.qdocs (doc_id STRING, text STRING, " +
        "PRIMARY KEY (doc_id) NOT ENFORCED) WITH ('connector' = 'mysql-cdc')")
    val spec = engine.catalog.get("qdocs").get
    val sink = new InMemoryUpsertSink
    val passthrough = graft.streaming.ViewDef("qview", (pre, post, batch, ctx) => {
      val ups = post("qdocs").select(col("key").as("id"), col("text"))
      val dels = ups.select("id").limit(0)
      (ups, dels)
    })
    val pipeline = new graft.streaming.CdcPipeline(
      spark, Seq(spec), tmpDir("qcdc"), sink, Seq(passthrough))
    // envelope labeled with the DECLARED (qualified) name, the typical
    // Debezium topic form
    val env = """{"before":null,"after":{"doc_id":"d1","text":"hello"},"op":"c","ts_ms":1}"""
    pipeline.processBatch(
      Seq(("qdb.qdocs", env, 1L)).toDF("table", "value", "seq"), Some(0L))
    assert(sink.docs("qview").get("d1").map(_("text").toString) ==
      Some("hello"))
  }

  test("WATERMARK on a nonexistent column is a DDL-time error") {
    val e = intercept[IllegalArgumentException] {
      Ddl.parseCreateTable(
        """CREATE TABLE t (ts TIMESTAMP(3),
          |  WATERMARK FOR tss AS tss - INTERVAL '5' SECOND
          |) WITH ('connector' = 'kafka')""".stripMargin)
    }
    assert(e.getMessage.contains("no such column"))
  }

  test("non-connector statements fall through: plain SQL still runs") {
    val engine = Engine(spark)
    engine.registerParquet("region", "/root/testdata/sf0.001")
    assert(engine.sql("SELECT count(*) AS n FROM region").head().getLong(0) == 5)
    // CREATE TABLE ... LIKE is NOT claimed by the connector-DDL rule
    engine.sql("CREATE TABLE region2 WITH ('a'='b') LIKE region (EXCLUDING OPTIONS)")
    assert(engine.catalog.get("region2").get.options == Map("a" -> "b"))
  }

  test("reference DDL + order_view INSERT runs end-to-end through Engine.sql") {
    val engine = Engine(spark)
    engine.sql(ordersDdl)
    engine.sql(usersDdl)
    engine.sql(orderViewDdl)
    assert(engine.cdcSources.map(_.name).sorted == Seq("orders", "users"))
    // the users DDL declares no PK; key it by the id the Debezium message
    // key carries (what the reference's Flink runtime does implicitly)
    engine.catalog.register(
      engine.catalog.get("users").get.copy(primaryKey = Seq("id")))

    // dynamic tables are queryable before any stream: empty, typed
    assert(engine.sql("SELECT id, amount FROM orders").count() == 0)

    val session = new CdcSqlSession(spark, engine.cdcSources).attachTo(engine)
    // reference flink-ddl.sql:179-190, verbatim
    engine.sql(
      """INSERT INTO order_view
        |SELECT orders.id id,
        |       orders.amount `order.amount`,
        |       orders.status `order.status`,
        |       orders.channel `order.channel`,
        |       users.name `user.name`,
        |       users.age `user.age`,
        |       orders.ctime ctime,
        |       orders.utime utime
        |FROM orders
        |JOIN users
        |ON orders.user_id = users.id;""".stripMargin)
    assert(session.views.map(_.name) == Seq("order_view"))

    val sink = new InMemoryUpsertSink
    val pipeline = session.pipeline(tmpDir("ddl-e2e"), sink)
    var seq = 0L
    def rec(table: String, env: String): (String, String, Long) = {
      seq += 1; (table, env, seq)
    }
    def orderEnv(op: String, id: String, user: String, amount: Long,
        status: String): String = {
      val img =
        s"""{"id":"$id","user_id":"$user","amount":$amount,"status":"$status",
           |"channel":"wechat","ctime":"2021-01-30T00:00:00Z",
           |"utime":"2021-01-30T00:00:00Z"}""".stripMargin.replace("\n", "")
      val b = if (op == "c") "null" else img
      val a = if (op == "d") "null" else img
      s"""{"before":$b,"after":$a,"op":"$op","ts_ms":$seq}"""
    }
    def userEnv(op: String, id: String, name: String, age: Int): String = {
      val img = s"""{"id":"$id","name":"$name","age":$age,
                   |"ctime":"2021-01-01T00:00:00Z",
                   |"utime":"2021-01-01T00:00:00Z"}""".stripMargin.replace("\n", "")
      s"""{"before":${if (op == "c") "null" else img},
         |"after":${if (op == "d") "null" else img},
         |"op":"$op","ts_ms":$seq}""".stripMargin.replace("\n", "")
    }

    import spark.implicits._
    pipeline.processBatch(Seq(
      rec("users", userEnv("c", "u1", "Alice", 30)),
      rec("orders", orderEnv("c", "o1", "u1", 100L, "created")),
      rec("orders", orderEnv("c", "o2", "u1", 50L, "created")))
      .toDF("table", "value", "seq"))

    val docs = sink.docs("order_view")
    assert(docs.keySet == Set("o1", "o2"))
    // amount is DECIMAL(10,0) per the DDL — exact integral values
    assert(docs("o1")("order.amount").toString.toDouble == 100.0)
    assert(docs("o1")("user.name") == "Alice")
    assert(docs("o1")("user.age") == 30)

    // a delete retracts through the continuous join
    pipeline.processBatch(Seq(
      rec("orders", orderEnv("d", "o2", "u1", 50L, "created")))
      .toDF("table", "value", "seq"))
    assert(sink.docs("order_view").keySet == Set("o1"))
  }

  test("sqlScript executes a multi-statement script with comments") {
    val engine = Engine(spark)
    engine.sqlScript(
      s"""--- source + sink declarations, then the continuous statement
         |$ordersDdl
         |
         |$orderViewDdl
         |""".stripMargin)
    assert(engine.catalog.get("orders").isDefined)
    assert(engine.catalog.get("order_view").get.options("connector") ==
      "elasticsearch-7")
  }
}
