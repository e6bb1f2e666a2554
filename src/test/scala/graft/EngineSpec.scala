package graft

import org.apache.spark.sql.functions._

/** SQL front door + catalog: registered specs back `engine.sql`, and
  * `CREATE TABLE ... LIKE` clones definitions with swapped options
  * (reference: README.md:215-225, 342). */
class EngineSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("sql() over registered tables plans the same result as DataFrames") {
    val engine = Engine(spark)
    engine.registerParquet("nation", dir)
    engine.registerParquet("region", dir)
    val viaSql = engine.sql(
      "SELECT n_name, r_name FROM nation JOIN region ON n_regionkey = r_regionkey")
      .as[(String, String)].collect().toSet
    val viaDf = graft.sources.Tables.load(spark, dir, "nation")
      .join(graft.sources.Tables.load(spark, dir, "region"), expr("n_regionkey = r_regionkey"))
      .select("n_name", "r_name").as[(String, String)].collect().toSet
    assert(viaSql == viaDf && viaSql.size == 25)
  }

  test("catalog records pk and connector options; LIKE clones with new options") {
    val engine = Engine(spark)
    engine.registerParquet("orders", dir, primaryKey = Seq("o_orderkey"))
    val spec = engine.catalog.get("orders").get
    assert(spec.primaryKey == Seq("o_orderkey"))
    assert(spec.options("connector") == "parquet")

    // EXCLUDING OPTIONS clone: same schema, different (empty) options
    val clone = engine.registerLike("orders_like", "orders")
    assert(clone.schema == spec.schema)
    assert(clone.options.isEmpty)

    // INCLUDING-OPTIONS-style clone pointing at another location reads it
    val other = engine.registerLike("orders_sf001", "orders",
      Map("path" -> s"/root/testdata/sf0.001/orders.parquet"))
    assert(engine.sql("SELECT count(*) FROM orders_sf001").as[Long].head() ==
      engine.sql("SELECT count(*) FROM orders").as[Long].head())
  }

  test("CREATE TABLE ... LIKE as a statement (reference README.md:215-225)") {
    val engine = Engine(spark)
    engine.registerParquet("orders", dir, primaryKey = Seq("o_orderkey"))

    // the reference's EXCLUDING form, near-verbatim (new options only)
    engine.sql("CREATE TABLE order_cdc2 WITH ('topic' = 'shard1.ec.orders', " +
      "'scan.startup.mode' = 'earliest-offset') LIKE orders (EXCLUDING OPTIONS)")
    val c2 = engine.catalog.get("order_cdc2").get
    assert(c2.schema == engine.catalog.get("orders").get.schema)
    assert(c2.options == Map("topic" -> "shard1.ec.orders",
      "scan.startup.mode" -> "earliest-offset"))

    // INCLUDING keeps base options, overrides merge on top; a path
    // override re-points the readable view
    engine.sql("CREATE TABLE orders_inc WITH " +
      s"('path' = '/root/testdata/sf0.001/orders.parquet') " +
      "LIKE orders (INCLUDING OPTIONS)")
    val inc = engine.catalog.get("orders_inc").get
    assert(inc.options("connector") == "parquet")
    assert(engine.sql("SELECT count(*) FROM orders_inc").as[Long].head() ==
      engine.sql("SELECT count(*) FROM orders").as[Long].head())
  }
}
